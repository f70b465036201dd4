"""Landmark index explorer (mirrors all_landmarks.py): draws all 468 mesh
points with their integer indices — the tool used to pick index sets.
Overlay strings/window name match the reference (all_landmarks.py:12,70-77);
``label_every`` is an extra knob (label every Nth index) for dense frames."""

from __future__ import annotations

from ..runtime.capture import CameraSource, FaceLandmarkerSession


def main(cam_index: int = 0, model_path: str = "models/face_landmarker.task",
         label_every: int = 1):
    import cv2

    # landmarker FIRST: its asset-missing failure must not strand an opened
    # camera handle (same ordering as record_timed.py / the live apps)
    lm = FaceLandmarkerSession(model_path, video_mode=True)
    try:
        cam = CameraSource(cam_index)
    except Exception:
        lm.close()
        raise
    try:
        for frame, ts in cam.frames():
            face = lm.detect(frame, ts)
            if face is not None:
                h, w = frame.shape[:2]
                for i in range(len(face)):
                    x, y = int(face[i, 0] * w), int(face[i, 1] * h)
                    cv2.circle(frame, (x, y), 1, (0, 255, 0), -1)
                    if i % label_every == 0:
                        cv2.putText(frame, str(i), (x + 2, y - 2),
                                    cv2.FONT_HERSHEY_SIMPLEX, 0.3,
                                    (255, 255, 255), 1)
                cv2.putText(frame, "FACE DETECTED", (20, 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 255, 0), 2)
            else:
                cv2.putText(frame, "NO FACE", (20, 40),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 255), 2)
            cv2.putText(frame, "q to quit", (20, 80),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
            cv2.imshow("Face Dots Only", frame)
            if cv2.waitKey(1) & 0xFF in (27, ord("q")):
                break
    finally:
        cam.release()
        lm.close()
        cv2.destroyAllWindows()
