"""Lower-face selection demo viewer (mirrors important_landmarks.py):
draws the dynamic 'below-the-nose plus cheeks minus nose' selection with
EMA-smoothed openness, a hysteresis open/close indicator, and the staged
prediction overlay driven by the number keys (demo fallback with
random.uniform confidence, important_landmarks.py:188-242).

Reference parity notes:
- openness = |y13 - y14| / inter-eye distance (indices 33/263), EMA
  alpha 0.25, threshold 0.02 both ways (important_landmarks.py:52-61,
  131-146) — eye-span normalization, NOT the mouth-width normalization the
  recording/inference feature paths use.
- the reference's ``key in (27, "N")`` branches make ESC trigger whatever
  staged word was checked first AND quit (latent bug,
  SURVEY.md section 2.5 item 10) — consciously not copied: here ESC/q only
  quit.
"""

from __future__ import annotations

import random
import time

import numpy as np

from ..core.landmark_select import EMA, Hysteresis, compute_selected_indices
from ..runtime.capture import CameraSource, FaceLandmarkerSession

# staged demo words in number-key order 1..9,0 (important_landmarks.py:188-242)
STAGED_WORDS = ["HELLO", "YES", "NO", "THANKS", "PLEASE",
                "SIX", "SEVEN", "FAHHH", "LEBRON", "AURA"]
_KEY_TO_WORD = {ord(str((i + 1) % 10)): w for i, w in enumerate(STAGED_WORDS)}

# inner-lip gap normalized by the inter-eye span
# (important_landmarks.py:47-54)
MOUTH_TOP, MOUTH_BOTTOM = 13, 14
LEFT_EYE_CORNER, RIGHT_EYE_CORNER = 33, 263


def main(cam_index: int = 0, model_path: str = "models/face_landmarker.task",
         open_low: float = 0.02, open_high: float = 0.02,
         ema_alpha: float = 0.25):
    import cv2

    # landmarker FIRST: its asset-missing failure must not strand an opened
    # camera handle (same ordering as record_timed.py / the live apps)
    lm = FaceLandmarkerSession(model_path, video_mode=True)
    try:
        cam = CameraSource(cam_index)
    except Exception:
        lm.close()
        raise
    ema = EMA(ema_alpha)
    gate = Hysteresis(open_low, open_high)
    sel = ()
    pred, conf, show_pred, show_expires = None, 0.0, False, 0.0
    try:
        for frame, ts in cam.frames():
            face = lm.detect(frame, ts)
            if face is not None:
                h, w = frame.shape[:2]
                # the reference VIEWER recomputes the selection every frame
                # (the dots track head pose); only the RECORDER locks it per
                # clip (lower_face_record.py:197,227-228)
                sel = compute_selected_indices(face[:, :2])
                for i in sel:
                    x, y = int(face[i, 0] * w), int(face[i, 1] * h)
                    cv2.circle(frame, (x, y), 1, (0, 255, 0), -1)
                lip_gap = abs(face[MOUTH_BOTTOM, 1] - face[MOUTH_TOP, 1])
                eye_span = np.linalg.norm(
                    face[LEFT_EYE_CORNER, :2] - face[RIGHT_EYE_CORNER, :2]
                ) + 1e-6
                mouth_ema = float(ema.update(lip_gap / eye_span))
                speaking = gate.update(mouth_ema)
                status = "OPEN" if speaking else "CLOSED"
                cv2.putText(frame, f"MOUTH: {status}  ({mouth_ema:.3f})",
                            (20, 130), cv2.FONT_HERSHEY_SIMPLEX, 1.0,
                            (0, 255, 0) if speaking else (0, 0, 255), 2)
                cv2.putText(frame, f"PREDICTION: {pred}", (1400, 90),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.5,
                            (0, 255, 0) if show_pred else (0, 0, 255), 3)
                cv2.putText(frame, f"CONF: {conf:.3f}", (1400, 140),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.5,
                            (0, 255, 0) if show_pred else (0, 0, 255), 3)
                cv2.putText(frame, "LOWER FACE + CHEEK PREDICTION", (20, 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
                cv2.putText(frame, f"selected={len(sel)} pts", (20, 75),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.6,
                            (255, 255, 255), 2)
            else:
                cv2.putText(frame, "NO FACE", (20, 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 255), 2)
            cv2.putText(frame, "q to quit", (20, 80),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
            cv2.imshow("Live Demonstration", frame)
            key = cv2.waitKey(1) & 0xFF
            if key in (27, ord("q")):
                break
            if key in _KEY_TO_WORD:
                pred = _KEY_TO_WORD[key]
                conf = random.uniform(0.6, 0.9)
                show_pred = True
                show_expires = time.monotonic() + 2.0
            if show_pred and time.monotonic() >= show_expires:
                show_pred, conf, pred = False, 0.0, None
    finally:
        cam.release()
        lm.close()
        cv2.destroyAllWindows()
