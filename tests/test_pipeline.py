"""Live pipeline: producer/ring/consumer integration with a synthetic source
feeding a real streaming engine end to end."""

import numpy as np

import jax

from silent_speech_tpu.core.config import StreamConfig
from silent_speech_tpu.infer import SlidingWindowEngine
from silent_speech_tpu.models.variants import (
    gru_word_classifier_forward,
    init_gru_word_classifier,
)
from silent_speech_tpu.runtime.pipeline import FramePacker, LivePipeline


def test_packer_roundtrip(rng):
    p = FramePacker(feat_dim=180, roi_hw=(48, 96))
    feat = rng.standard_normal(180).astype(np.float32)
    roi = rng.integers(0, 256, (48, 96), dtype=np.uint8)
    payload = p.pack(feat, roi)
    assert payload.nbytes == p.slot_bytes
    f2, r2 = p.unpack(payload)
    np.testing.assert_array_equal(f2, feat)
    np.testing.assert_array_equal(r2, roi)

    p2 = FramePacker(feat_dim=83)
    f3, r3 = p2.unpack(p2.pack(feat[:83], None))
    np.testing.assert_array_equal(f3, feat[:83])
    assert r3 is None


def test_pipeline_streams_through_engine(rng):
    """Synthetic 200-frame stream through the ring into a jitted
    sliding-window predictor — every frame consumed, predictions fire."""
    params = init_gru_word_classifier(jax.random.PRNGKey(0), 83, 5, hidden=16,
                                      num_layers=1)

    @jax.jit
    def fwd(X):
        return gru_word_classifier_forward(params, X)

    engine = SlidingWindowEngine(
        fwd, 83, StreamConfig(max_t=20, pred_every=2, warmup_min=10))
    preds = []

    def sink(feat, roi, ts):
        out = engine.push(feat)
        if out is not None:
            preds.append((ts, out[0], out[1]))

    N = 200
    def source():
        for i in range(N):
            yield rng.standard_normal(83).astype(np.float32), None, i * 33

    pipe = LivePipeline(source(), sink, FramePacker(feat_dim=83), capacity=64)
    stats = pipe.run(timeout=60)

    assert stats["produced"] == N
    # unpaced producer: the ring may drop under backpressure (by design),
    # but every frame is either consumed or counted as dropped
    assert stats["consumed"] + stats["dropped"] == N
    assert stats["consumed"] >= 30
    assert len(preds) > 5
    # timestamps preserved through the ring
    assert all(ts % 33 == 0 for ts, _, _ in preds)
    assert "sink" in stats["stages"] and stats["stages"]["sink"]["n"] > 0
