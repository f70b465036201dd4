"""Landmark index explorer (mirrors all_landmarks.py): draws all 468 mesh
points with their integer indices — the tool used to pick index sets."""

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
                for i in range(0, len(face), 1):
                    x, y = int(face[i, 0] * w), int(face[i, 1] * h)
                    cv2.circle(frame, (x, y), 1, (0, 255, 0), -1)
                    if i % label_every == 0:
                        cv2.putText(frame, str(i), (x + 1, y - 1),
                                    cv2.FONT_HERSHEY_PLAIN, 0.6, (255, 0, 0), 1)
            cv2.imshow("All landmarks", frame)
            if cv2.waitKey(1) & 0xFF in (27, ord("q")):
                break
    finally:
        cam.release()
        lm.close()
        cv2.destroyAllWindows()
