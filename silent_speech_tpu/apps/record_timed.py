"""Timed batch recorder (mirrors inactive/record_training_data.py).

Countdown -> fixed-duration recording state machine; saves both the `.npz`
clip and a labeled `.mp4`; per-word collection-progress dashboard and a
``--status`` mode that prints progress without opening the camera.
"""

from __future__ import annotations

import glob
import os
import time
from collections import Counter

import numpy as np

from ..core import RecorderConfig, WORDS
from ..core.landmarks import FIXED_IDXS
from ..core.schema import Clip, clip_filename, parse_filename_label, save_clip
from ..ops.features import extract_features_frame
from ..runtime.capture import CameraSource, FaceLandmarkerSession

COUNTDOWN_S = 3.0
RECORD_S = 2.0
TARGET_PER_WORD = 20


def get_all_counts(out_dir: str) -> Counter:
    counts: Counter = Counter()
    for p in glob.glob(os.path.join(out_dir, "*.npz")):
        try:
            counts[parse_filename_label(p)] += 1
        except ValueError:
            continue
    return counts


def print_progress_summary(out_dir: str, words=WORDS, target=TARGET_PER_WORD):
    counts = get_all_counts(out_dir)
    total = sum(counts[w] for w in words)
    print(f"=== collection progress ({total}/{len(words) * target}) ===")
    for w in words:
        n = counts[w]
        bar = "#" * min(n, target) + "-" * max(0, target - n)
        print(f"  {w:>8}: [{bar}] {n}/{target}")


def main(cfg: RecorderConfig = RecorderConfig(),
         model_path: str = "models/face_landmarker.task",
         status_only: bool = False):
    if status_only:
        print_progress_summary(cfg.out_dir)
        return
    import cv2

    os.makedirs(cfg.out_dir, exist_ok=True)
    key_to_word = dict(zip(list("1234567890"), WORDS))
    # landmarker first: its asset-missing failure is the likely first-run
    # path and must not strand an opened camera handle
    lm = FaceLandmarkerSession(model_path, video_mode=True)
    try:
        cam = CameraSource(cfg.cam_index)
    except Exception:
        lm.close()
        raise

    state = "idle"  # idle -> countdown -> recording -> idle
    label = WORDS[0]
    state_t0 = 0.0
    bufX, bufT, frames_mp4 = [], [], []
    clip_id = 0
    prev_xy = None

    try:
        for frame, ts in cam.frames():
            now = time.monotonic()
            face = lm.detect(frame, ts)
            out = frame.copy()

            if state == "countdown":
                remain = COUNTDOWN_S - (now - state_t0)
                if remain <= 0:
                    state, state_t0 = "recording", now
                    bufX, bufT, frames_mp4 = [], [], []
                    prev_xy = None
                else:
                    cv2.putText(out, f"{remain:.1f}", (280, 240),
                                cv2.FONT_HERSHEY_SIMPLEX, 3, (0, 255, 255), 4)
            elif state == "recording":
                if face is not None:
                    h, w = frame.shape[:2]
                    feat, prev_xy, _, _ = extract_features_frame(face, w, h, prev_xy)
                    bufX.append(feat)
                    bufT.append(ts)
                frames_mp4.append(frame.copy())
                if now - state_t0 >= RECORD_S:
                    state = "idle"
                    if len(bufX) > cfg.min_frames:
                        stamp = int(time.time())
                        fname = clip_filename(cfg.speaker, label, stamp, clip_id)
                        save_clip(
                            Clip(X=np.stack(bufX).astype(np.float32),
                                 ts=np.asarray(bufT), label=label,
                                 speaker=cfg.speaker,
                                 idxs=np.asarray(FIXED_IDXS, np.int32)),
                            os.path.join(cfg.out_dir, fname),
                            min_frames=cfg.min_frames,
                        )
                        h, w = frames_mp4[0].shape[:2]
                        vw = cv2.VideoWriter(
                            os.path.join(cfg.out_dir, fname.replace(".npz", ".mp4")),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
                        for f in frames_mp4:
                            vw.write(f)
                        vw.release()
                        print("saved", fname)
                        clip_id += 1
                        print_progress_summary(cfg.out_dir)
                cv2.putText(out, "REC", (20, 40), cv2.FONT_HERSHEY_SIMPLEX,
                            0.9, (0, 0, 255), 2)

            cv2.putText(out, f"word: {label} | space=start 1-0=word q=quit",
                        (20, 470), cv2.FONT_HERSHEY_SIMPLEX, 0.6,
                        (255, 255, 255), 2)
            cv2.imshow("Timed Recorder", out)
            key = cv2.waitKey(1) & 0xFF
            if key in (27, ord("q")):
                break
            ch = chr(key) if 32 <= key < 127 else ""
            if ch in key_to_word and state == "idle":
                # word selection is idle-only (record_training_data.py
                # gates it the same way): a digit pressed mid-recording
                # must not relabel the clip being captured
                label = key_to_word[ch]
            if ch == " " and state == "idle":
                state, state_t0 = "countdown", now
    finally:
        cam.release()
        lm.close()
        cv2.destroyAllWindows()
