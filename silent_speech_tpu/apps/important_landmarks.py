"""Lower-face selection demo viewer (mirrors important_landmarks.py):
draws the dynamic 'below-the-nose plus cheeks minus nose' selection with
EMA-smoothed openness and a hysteresis open/close indicator."""

from __future__ import annotations

import numpy as np

from ..core.landmark_select import EMA, Hysteresis, compute_selected_indices
from ..runtime.capture import CameraSource, FaceLandmarkerSession


def main(cam_index: int = 0, model_path: str = "models/face_landmarker.task",
         open_low: float = 0.035, open_high: float = 0.055, ema_alpha: float = 0.3):
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
                mouth_w = np.linalg.norm(face[291, :2] - face[61, :2]) + 1e-6
                openness = float(
                    ema.update(np.linalg.norm(face[13, :2] - face[14, :2]) / mouth_w)
                )
                speaking = gate.update(openness)
                cv2.putText(frame, f"open={openness:.3f} "
                            f"[{'OPEN' if speaking else 'closed'}]",
                            (20, 40), cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                            (0, 255, 255) if speaking else (200, 200, 200), 2)
                cv2.putText(frame, f"selected={len(sel)} pts", (20, 75),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 2)
            cv2.imshow("Important landmarks", frame)
            if cv2.waitKey(1) & 0xFF in (27, ord("q")):
                break
    finally:
        cam.release()
        lm.close()
        cv2.destroyAllWindows()
