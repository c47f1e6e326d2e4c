"""Video-file sink via OpenCV VideoWriter (headless recording)."""

from __future__ import annotations

import numpy as np


class VideoSink:
    def __init__(self, path: str, fps: float = 30.0, codec: str = "mp4v") -> None:
        self.path = path
        self.fps = fps
        self.codec = codec
        self._writer = None

    def push(self, sbs_u8: np.ndarray, depth, stats) -> None:
        import cv2

        if self._writer is None:
            h, w = sbs_u8.shape[:2]
            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*self.codec), self.fps, (w, h)
            )
        self._writer.write(sbs_u8[..., ::-1])  # RGB→BGR

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None
