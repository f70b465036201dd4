"""Command-line entry points mirroring the reference scripts 1:1.

    python -m silent_speech_tpu <command> [key=value ...]

Commands:
    record          webcam clip recorder (record_landmarks_official.py)
    record-timed    countdown batch recorder (inactive/record_training_data.py)
    train           official classifier training (train_model_official.py)
    train-ctc       CTC character-model training (inactive/train_model.py)
    train-reduced   5-word BiGRU w/ rich augmentation (inactive/train_reduced.py)
    train-unigru    trim/delta/z-score uni-GRU (inactive/train_model_1130pm.py)
    train-mlp       mean+std summary MLP with TEST split (inactive/train_5_quick.py)
    infer-live      manual-toggle live inference (live_infer_official.py)
    infer-gated     openness-gated auto-clip inference (inactive/live_lower_half.py)
    infer-stream    sliding-window streaming (inactive/live_feed.py)
    eval-dataset    offline corpus sweep (inactive/dataset_eval.py)
    eval-ctc        dictionary-scored CTC corpus sweep
    landmarks-view  landmark index explorer (all_landmarks.py)
    important-landmarks  lower-face selection demo (important_landmarks.py)
    infer-ctc       CTC dictionary live inference (inactive/facial_landmark_detection.py)
    debug-npz       corpus keys/shapes debugger (inactive/debug.py)
    export-torch    convert our checkpoint to a reference-consumable .pt
    status          collection-progress dashboard (record_training_data --status)
    doctor          environment diagnosis (backend, native libs, capture deps)
    bench           single-chip throughput benchmark

Overrides use the config dataclass field names, e.g.
``train clip_dir=clips_npz epochs=40 lr=1e-3``.

Camera commands (record, record-timed, infer-live, infer-gated, infer-stream,
infer-ctc, landmarks-view, important-landmarks) accept ``sim=N``: run N frames
against the headless simulation harness (synthetic face track + scripted
record-toggle keystrokes) instead of a real camera — works on hosts with no
cv2/mediapipe/camera.
"""

from __future__ import annotations

import contextlib
import sys

from ..core.config import (
    CTCTrainConfig,
    EvalConfig,
    InferConfig,
    RecorderConfig,
    StreamConfig,
    TrainConfig,
    apply_overrides,
)


def _split_kv(args):
    return [a for a in args if "=" in a], [a for a in args if "=" not in a]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    try:
        return _dispatch(argv)
    except (AttributeError, ValueError, RuntimeError, FileNotFoundError, IOError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


def _sim_context(sim_n: int, cmd: str = ""):
    """Default simulation scenario: face in range, openness bursts, 'r'
    toggled around the middle of the run (space + scaled wall-clock state
    machine for record-timed, which is countdown-driven)."""
    import contextlib as _ctx

    from ..runtime.fakes import NO_KEY, face_track, sim_session

    keys = [NO_KEY] * sim_n
    if cmd == "record-timed":
        # record-timed starts on SPACE and runs a wall-clock
        # countdown/record state machine — scale its constants and pace the
        # fake camera so sim_n frames can actually traverse it
        if sim_n >= 16:
            keys[2] = ord(" ")

        @_ctx.contextmanager
        def _timed_session():
            from . import record_timed as rt

            saved = (rt.COUNTDOWN_S, rt.RECORD_S)
            rt.COUNTDOWN_S, rt.RECORD_S = 0.05, 0.25
            try:
                with sim_session(keys=keys, n_frames=sim_n,
                                 faces=face_track(sim_n)) as (cv2f, cam, lmk):
                    cam.frame_delay = 0.004
                    yield cv2f, cam, lmk
            finally:
                rt.COUNTDOWN_S, rt.RECORD_S = saved

        return _timed_session()
    if sim_n >= 16:
        keys[3] = ord("r")
        keys[sim_n - 8] = ord("r")
    # openness square wave: speaking bursts for the gated/stream modes
    open_seq = [20.0 if (i // 12) % 2 == 1 else 6.0 for i in range(sim_n)]
    return sim_session(keys=keys, n_frames=sim_n,
                       faces=face_track(sim_n, open_seq=open_seq))


def _dispatch(argv) -> int:
    cmd, args = argv[0], argv[1:]
    kv, flags = _split_kv(args)

    sim_n = 0
    for a in list(kv):
        if a.startswith("sim="):
            sim_n = int(a.split("=", 1)[1])
            kv.remove(a)
    with _sim_context(sim_n, cmd) if sim_n else contextlib.nullcontext():
        return _dispatch_cmd(cmd, kv, flags)


def _dispatch_cmd(cmd, kv, flags) -> int:
    if cmd == "record":
        from .record import main as run
        run(apply_overrides(RecorderConfig(), kv))
    elif cmd == "record-timed":
        from .record_timed import main as run
        run(apply_overrides(RecorderConfig(), kv),
            status_only="--status" in flags)
    elif cmd == "status":
        from .record_timed import print_progress_summary
        cfg = apply_overrides(RecorderConfig(), kv)
        print_progress_summary(cfg.out_dir)
    elif cmd == "train":
        from ..train import train
        train(apply_overrides(TrainConfig(), kv))
    elif cmd == "train-ctc":
        from ..train import train_ctc
        train_ctc(apply_overrides(CTCTrainConfig(), kv))
    elif cmd == "train-reduced":
        from ..train.legacy_loops import ReducedConfig, train_reduced
        train_reduced(apply_overrides(ReducedConfig(), kv))
    elif cmd == "train-unigru":
        from ..train.legacy_loops import UniGRUConfig, train_unigru
        train_unigru(apply_overrides(UniGRUConfig(), kv))
    elif cmd == "train-mlp":
        from ..train.legacy_loops import MLPQuickConfig, train_mlp_quick
        train_mlp_quick(apply_overrides(MLPQuickConfig(), kv))
    elif cmd == "infer-live":
        from .live import infer_live
        infer_live(apply_overrides(InferConfig(), kv))
    elif cmd == "infer-gated":
        from .live import infer_gated
        infer_gated(apply_overrides(InferConfig(), kv))
    elif cmd == "infer-stream":
        from .live import infer_stream
        ckpt = kv and dict(x.split("=", 1) for x in kv).get("ckpt_path")
        if not ckpt:
            print("usage: infer-stream ckpt_path=<path> [cam_index=N]")
            return 2
        extras = dict(x.split("=", 1) for x in kv)
        infer_stream(ckpt, StreamConfig(),
                     cam_index=int(extras.get("cam_index", 0)))
    elif cmd == "eval-dataset":
        from ..infer import VariantPredictor, evaluate_dataset, load_predictor
        from ..infer.evaluator import evaluate_variant_dataset
        cfg = apply_overrides(EvalConfig(), kv)
        pred = load_predictor(cfg.ckpt_path, compute_dtype=cfg.compute_dtype,
                              roi_impl=cfg.roi_impl, gru_impl=cfg.gru_impl,
                              matmul_precision=cfg.matmul_precision or None)
        if isinstance(pred, VariantPredictor):
            # batch_size does not apply: variant families predict per clip
            evaluate_variant_dataset(pred, cfg.clip_dir,
                                     top_confusions=cfg.top_confusions)
        else:
            evaluate_dataset(pred, cfg.clip_dir, batch_size=cfg.batch_size,
                             top_confusions=cfg.top_confusions)
    elif cmd == "eval-ctc":
        from ..infer.evaluator import evaluate_ctc_dataset
        extras = dict(x.split("=", 1) for x in kv)
        if "ckpt_path" not in extras:
            print("usage: eval-ctc ckpt_path=<path> [clip_dir=clips_npz]")
            return 2
        evaluate_ctc_dataset(extras["ckpt_path"],
                             extras.get("clip_dir", "clips_npz"))
    elif cmd == "landmarks-view":
        from .landmarks_view import main as run
        run()
    elif cmd == "important-landmarks":
        from .important_landmarks import main as run
        run()
    elif cmd == "infer-ctc":
        from .live import infer_ctc
        extras = dict(x.split("=", 1) for x in kv)
        if "ckpt_path" not in extras:
            print("usage: infer-ctc ckpt_path=<path> [cam_index=N]")
            return 2
        infer_ctc(extras["ckpt_path"], cam_index=int(extras.get("cam_index", 0)))
    elif cmd == "export-torch":
        extras = dict(x.split("=", 1) for x in kv)
        if "ckpt_path" not in extras or "out_path" not in extras:
            print("usage: export-torch ckpt_path=<ours.ckpt> out_path=<ref.pt>")
            return 2
        from ..core.torch_export import export_reference_checkpoint
        from ..train.checkpoint import load_checkpoint
        params, meta, _ = load_checkpoint(extras["ckpt_path"])
        export_reference_checkpoint(params, meta, extras["out_path"])
        print("wrote", extras["out_path"])
    elif cmd == "debug-npz":
        from .debug_npz import main as run
        extras = dict(x.split("=", 1) for x in kv)
        return run(extras.get("clip_dir", "clips_npz"))
    elif cmd == "doctor":
        from .doctor import run_doctor
        return run_doctor()
    elif cmd == "bench":
        import runpy
        import os
        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"),
            run_name="__main__")
    else:
        print(f"unknown command: {cmd}\n{__doc__}")
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
