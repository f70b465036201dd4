"""Timed batch recorder (mirrors inactive/record_training_data.py).

Fixed-duration recording state machine (idle -> countdown -> recording);
saves the landmark `.npz` into ``out_dir`` AND a labeled `.mp4` into a
separate ``videos_dir`` (record_training_data.py:13-19); per-word
collection-progress dashboard with the reference's exact console format
(:59-78) and on-frame progress overlays (:220-263); ``--status`` mode prints
progress without opening the camera (:362-366).

Conscious upgrades over the reference (cited, not copied):
- clips store the OFFICIAL 180-D features and full npz schema
  (X/ts/label/speaker/idxs) under the official filename convention — the
  reference writes 83-D mouth features with only X+label (:312-318), which
  its own filename-label evaluators cannot parse and its official trainer
  dim-filters away. Progress is still counted by VIDEOS in ``videos_dir``
  (``{word}_{id:03d}.mp4``, the reference's counting rule, :39-42).
- the word list is the official 10-word vocabulary (configurable), not the
  5-word era list; number keys 1-0 select, 'n' cycles (:333-343).
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..core import RecorderConfig, WORDS
from ..core.landmarks import FIXED_IDXS, MOUTH_LOWER, MOUTH_UPPER
from ..core.schema import Clip, clip_filename, sanitize_field, save_clip
from ..ops.features import extract_features_frame
from ..runtime.capture import CameraSource, FaceLandmarkerSession

COUNTDOWN_S = 0.0  # reference COUNTDOWN_SECONDS = 0: starts immediately
RECORD_S = 2.0  # reference RECORD_SECONDS (:17)
TARGET_PER_WORD = 100  # reference TARGET_VIDEOS (:19)

_MOUTH_SET = sorted(set(MOUTH_UPPER + MOUTH_LOWER))


def get_clip_count(videos_dir: str, word: str) -> int:
    """Count existing VIDEOS for a word (record_training_data.py:39-42)."""
    if not os.path.isdir(videos_dir):
        return 0
    pre = sanitize_field(word) + "_"
    return len([f for f in os.listdir(videos_dir)
                if f.startswith(pre) and f.endswith(".mp4")])


def get_all_counts(videos_dir: str, words=WORDS,
                   target: int = TARGET_PER_WORD) -> dict:
    counts = {}
    for word in words:
        count = get_clip_count(videos_dir, word)
        counts[word] = {
            "count": count,
            "remaining": max(0, target - count),
            "progress": min(100, int(count / target * 100)),
            "complete": count >= target,
        }
    return counts


def print_progress_summary(videos_dir: str, words=WORDS,
                           target: int = TARGET_PER_WORD,
                           npz_fallback_dir: str | None = None) -> None:
    """The reference's console dashboard, format-exact
    (record_training_data.py:59-78). Counts VIDEOS (the reference's rule);
    when ``videos_dir`` holds none and ``npz_fallback_dir`` holds clips, the
    npz labels are counted instead so `status` stays useful on corpora
    recorded by the non-timed recorder (which writes no videos)."""
    counts = get_all_counts(videos_dir, words, target)
    if npz_fallback_dir and not any(v["count"] for v in counts.values()):
        npz_counts = _npz_label_counts(npz_fallback_dir)
        if npz_counts:
            counts = {
                w: {
                    "count": npz_counts.get(w, 0),
                    "remaining": max(0, target - npz_counts.get(w, 0)),
                    "progress": min(100, int(npz_counts.get(w, 0)
                                             / target * 100)),
                    "complete": npz_counts.get(w, 0) >= target,
                }
                for w in words
            }
    print("\n" + "=" * 50)
    print("  VIDEO COLLECTION PROGRESS")
    print("=" * 50)
    total = 0
    total_target = len(words) * target
    for word in words:
        info = counts[word]
        bar_len = 20
        filled = int(bar_len * info["progress"] / 100)
        bar = "█" * filled + "░" * (bar_len - filled)
        status = "✓ DONE" if info["complete"] else f"{info['remaining']} more"
        print(f"  {word:8} [{bar}] {info['count']:3}/{target} ({status})")
        total += info["count"]
    print("-" * 50)
    overall = int(total / total_target * 100) if total_target else 0
    print(f"  TOTAL: {total}/{total_target} ({overall}%)")
    print("=" * 50 + "\n")


def _npz_label_counts(clip_dir: str) -> dict:
    import glob
    from collections import Counter

    from ..core.schema import parse_filename_label

    counts: Counter = Counter()
    for p in glob.glob(os.path.join(clip_dir, "*.npz")):
        try:
            counts[parse_filename_label(p)] += 1
        except ValueError:
            continue
    return dict(counts)


def _next_video_id(videos_dir: str, word: str) -> int:
    """Next free ``{word}_{id:03d}.mp4`` id (record_training_data.py:81-87)."""
    existing = set(os.listdir(videos_dir)) if os.path.isdir(videos_dir) else ()
    word = sanitize_field(word)
    count = 1
    while f"{word}_{count:03d}.mp4" in existing:
        count += 1
    return count


def _draw_mouth_outline(cv2, display, face, w, h):
    """Mouth dots + margin-20 bounding box (record_training_data.py:131-145)."""
    for i in _MOUTH_SET:
        cv2.circle(display, (int(face[i, 0] * w), int(face[i, 1] * h)),
                   2, (0, 255, 0), -1)
    xs = face[_MOUTH_SET, 0] * w
    ys = face[_MOUTH_SET, 1] * h
    cv2.rectangle(display, (int(xs.min() - 20), int(ys.min() - 20)),
                  (int(xs.max() + 20), int(ys.max() + 20)), (0, 255, 0), 2)


def main(cfg: RecorderConfig = RecorderConfig(),
         model_path: str = "models/face_landmarker.task",
         status_only: bool = False):
    words = list(WORDS)
    target = TARGET_PER_WORD
    if status_only:
        print_progress_summary(cfg.videos_dir, words, target)
        return
    import cv2

    print("\n" + "=" * 50)
    print("  LIP READING TRAINING DATA RECORDER")
    print("=" * 50)
    print(f"\nWords to record: {', '.join(words)}")
    print(f"Record duration: {RECORD_S}s per clip")
    print(f"Target: {target} videos per word\n")
    print_progress_summary(cfg.videos_dir, words, target)

    os.makedirs(cfg.out_dir, exist_ok=True)
    os.makedirs(cfg.videos_dir, exist_ok=True)
    # landmarker first: its asset-missing failure is the likely first-run
    # path and must not strand an opened camera handle
    lm = FaceLandmarkerSession(model_path, video_mode=True)
    try:
        cam = CameraSource(cfg.cam_index)
    except Exception:
        lm.close()
        raise

    word_idx = 0
    state = "idle"  # idle -> countdown -> recording -> idle
    state_t0 = 0.0
    bufX, bufT, frames_mp4 = [], [], []
    clip_id = 0
    prev_xy = None

    print("Controls:")
    print("  SPACE  = Start recording")
    print("  1-0    = Select word")
    print("  N      = Next word")
    print("  Q      = Quit")
    print("-" * 50)

    try:
        for frame, ts in cam.frames():
            now = time.monotonic()
            face = lm.detect(frame, ts)
            display = frame.copy()
            h, w = frame.shape[:2]
            word = words[word_idx]
            if face is not None:
                _draw_mouth_outline(cv2, display, face, w, h)

            if state == "idle":
                counts = get_all_counts(cfg.videos_dir, words, target)
                info = counts[word]
                header_color = (0, 255, 0) if info["complete"] else (0, 255, 255)
                cv2.putText(display, f"Current: {word.upper()}", (20, 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.2, header_color, 2)
                remaining_text = ("COMPLETE!" if info["complete"]
                                  else f"{info['remaining']} more needed")
                cv2.putText(display,
                            f"{info['count']}/{target} - {remaining_text}",
                            (20, 70), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                            header_color, 2)
                bar_x, bar_y, bar_w, bar_h = 20, 85, 300, 20
                cv2.rectangle(display, (bar_x, bar_y),
                              (bar_x + bar_w, bar_y + bar_h),
                              (100, 100, 100), -1)
                filled_w = int(bar_w * info["progress"] / 100)
                bar_color = (0, 255, 0) if info["complete"] else (0, 200, 255)
                cv2.rectangle(display, (bar_x, bar_y),
                              (bar_x + filled_w, bar_y + bar_h), bar_color, -1)
                cv2.rectangle(display, (bar_x, bar_y),
                              (bar_x + bar_w, bar_y + bar_h),
                              (255, 255, 255), 1)
                y = 130
                for i, wd in enumerate(words):
                    winfo = counts[wd]
                    if wd == word:
                        color, indicator = (0, 255, 255), ">"
                    elif winfo["complete"]:
                        color, indicator = (0, 255, 0), "*"
                    else:
                        color, indicator = (200, 200, 200), " "
                    status = ("DONE" if winfo["complete"]
                              else f"+{winfo['remaining']}")
                    cv2.putText(
                        display,
                        f"{indicator} {i + 1}. {wd}: "
                        f"{winfo['count']}/{target} ({status})",
                        (20, y), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
                    y += 22
                cv2.putText(display, "Press SPACE to record", (20, h - 60),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
                cv2.putText(display, "Press 1-0 to select word, Q to quit",
                            (20, h - 30), cv2.FONT_HERSHEY_SIMPLEX, 0.6,
                            (200, 200, 200), 1)
                if face is None:
                    cv2.putText(display, "NO FACE DETECTED",
                                (w // 2 - 100, h // 2),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 255), 2)

            elif state == "countdown":
                remain = COUNTDOWN_S - (now - state_t0)
                if remain <= 0:
                    state, state_t0 = "recording", now
                    bufX, bufT, frames_mp4 = [], [], []
                    prev_xy = None
                    print(f"Recording: {word}...")
                else:
                    cv2.putText(display, f"Say: {word.upper()}",
                                (w // 2 - 100, h // 2 - 50),
                                cv2.FONT_HERSHEY_SIMPLEX, 1.2,
                                (0, 255, 255), 3)
                    cv2.putText(display, str(int(remain) + 1),
                                (w // 2 - 30, h // 2 + 50),
                                cv2.FONT_HERSHEY_SIMPLEX, 3, (0, 255, 0), 5)

            elif state == "recording":
                remain = RECORD_S - (now - state_t0)
                cv2.circle(display, (w - 40, 40), 15, (0, 0, 255), -1)
                cv2.putText(display, f"REC {remain:.1f}s", (w - 120, 45),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 255), 2)
                cv2.putText(display, f"Say: {word.upper()}", (20, 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.2, (0, 0, 255), 2)
                frames_mp4.append(frame.copy())
                if face is not None:
                    feat, prev_xy, _, _ = extract_features_frame(
                        face, w, h, prev_xy)
                    bufX.append(feat)
                    bufT.append(ts)
                if remain <= 0:
                    state = "idle"
                    if len(bufX) > cfg.min_frames:
                        stamp = int(time.time())
                        fname = clip_filename(cfg.speaker, word, stamp,
                                              clip_id)
                        save_clip(
                            Clip(X=np.stack(bufX).astype(np.float32),
                                 ts=np.asarray(bufT), label=word,
                                 speaker=cfg.speaker,
                                 idxs=np.asarray(FIXED_IDXS, np.int32)),
                            os.path.join(cfg.out_dir, fname),
                            min_frames=cfg.min_frames,
                        )
                        vid = _next_video_id(cfg.videos_dir, word)
                        vname = f"{sanitize_field(word)}_{vid:03d}.mp4"
                        fh, fw = frames_mp4[0].shape[:2]
                        vw_ = cv2.VideoWriter(
                            os.path.join(cfg.videos_dir, vname),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (fw, fh))
                        for f in frames_mp4:
                            vw_.write(f)
                        vw_.release()
                        print(f"  Saved: {vname[:-4]} ({len(bufX)} frames)")
                        clip_id += 1
                    else:
                        print("  Too few frames, clip discarded")

            cv2.imshow("Lip Reading Recorder", display)
            key = cv2.waitKey(1) & 0xFF
            if key in (27, ord("q")):
                break
            ch = chr(key) if 32 <= key < 127 else ""
            if state == "idle":
                if ch == " " and face is not None:
                    state, state_t0 = "countdown", now
                elif ch == "n":
                    word_idx = (word_idx + 1) % len(words)
                elif ch.isdigit():
                    idx = (int(ch) - 1) % 10
                    if idx < len(words):
                        word_idx = idx
    finally:
        cam.release()
        lm.close()
        cv2.destroyAllWindows()
        print_progress_summary(cfg.videos_dir, words, target)
