"""Metrics logging, stage timers, and training resume."""

import json

from silent_speech_tpu.core.config import TrainConfig
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.train import train
from silent_speech_tpu.train.metrics import MetricsLogger, StageTimer


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p)
    log.log(step=1, loss=0.5, acc=0.9)
    log.log(step=2, loss=0.4, note="hello")
    log.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["note"] == "hello"
    assert all("t" in l for l in lines)


def test_stage_timer():
    t = StageTimer()
    for _ in range(3):
        with t.stage("a"):
            pass
    s = t.summary()
    assert s["a"]["n"] == 3 and s["a"]["p50_ms"] >= 0


def test_train_resume_continues(tmp_path):
    corpus = tmp_path / "c"
    generate_corpus(str(corpus), clips_per_word=4, words=["yes", "no"], seed=3)
    base = dict(clip_dir=str(corpus), out_path=str(tmp_path / "m.ckpt"),
                batch_size=4, max_t=40, lr=1e-3, patience=20)

    r1 = train(TrainConfig(epochs=2, **base), verbose=False,
               metrics_path=str(tmp_path / "metrics.jsonl"))
    assert len(r1["history"]) == 2

    # resume from the saved checkpoint: epochs continue past the saved epoch
    r2 = train(TrainConfig(epochs=4, **base), verbose=False,
               resume_from=str(tmp_path / "m.ckpt"))
    eps = [h["epoch"] for h in r2["history"]]
    assert eps[0] > 1 and eps[-1] == 4

    # metrics file captured both epochs of run 1
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 2 and {l["step"] for l in lines} == {1, 2}
