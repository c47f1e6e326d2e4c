"""RTMP/SRT publishing sink via an ffmpeg subprocess.

The reference builds elaborate per-OS ffmpeg capture pipelines of its viewer
window (reference main.py:499-988).  On a TPU host the composed frames are
already in memory, so the pipeline writes raw RGB into ffmpeg's stdin — no
window, no screen grab — and ffmpeg encodes/publishes to the given URL.
"""

from __future__ import annotations

import shutil
import subprocess
from typing import Optional

import numpy as np


class RtmpSink:
    def __init__(
        self,
        url: str,
        fps: float = 30.0,
        crf: int = 20,
        preset: str = "veryfast",
        ffmpeg: Optional[str] = None,
        serve: bool = False,
        mediamtx: Optional[str] = None,
    ) -> None:
        """`serve=True` also spawns a local mediamtx media server (if the
        binary is on PATH) so players/headsets can PULL the stream from
        this host over RTMP/RTSP/SRT/HLS — the reference runs the same
        sidecar (reference main.py:993-1017).  Publishing still works
        against any external server when mediamtx is absent."""
        self.url = url
        self.fps = fps
        self.crf = crf
        self.preset = preset
        self._ffmpeg = ffmpeg or shutil.which("ffmpeg")
        if self._ffmpeg is None:
            raise RuntimeError("ffmpeg binary not found; RTMP sink unavailable")
        self._proc: Optional[subprocess.Popen] = None
        self._shape = None
        self._server: Optional[subprocess.Popen] = None
        if serve:
            path = mediamtx or shutil.which("mediamtx")
            if path is not None:
                self._server = subprocess.Popen(
                    [path], stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
                )

    def _start(self, h: int, w: int) -> None:
        fmt = "flv" if self.url.startswith("rtmp") else "mpegts"
        cmd = [
            self._ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{w}x{h}", "-r", str(self.fps), "-i", "-",
            "-c:v", "libx264", "-preset", self.preset, "-tune", "zerolatency",
            "-crf", str(self.crf), "-pix_fmt", "yuv420p", "-f", fmt, self.url,
        ]
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
        )
        self._shape = (h, w)

    def push(self, sbs_u8: np.ndarray, depth, stats) -> None:
        h, w = sbs_u8.shape[:2]
        if self._proc is None or self._shape != (h, w):
            # restart on resolution change (reference main.py:1018-1061)
            self.close()
            self._start(h, w)
        try:
            self._proc.stdin.write(np.ascontiguousarray(sbs_u8).tobytes())
        except (BrokenPipeError, ValueError):
            self.close()

    def close(self) -> None:
        if self._proc is not None:
            try:
                self._proc.stdin.close()
            except Exception:
                pass
            self._proc.terminate()
            try:
                self._proc.wait(timeout=2)
            except subprocess.TimeoutExpired:
                self._proc.kill()
            self._proc = None

    def shutdown(self) -> None:
        """Full teardown incl. the mediamtx sidecar (close() only recycles
        the encoder so push() can restart it on resolution change)."""
        self.close()
        if self._server is not None:
            self._server.terminate()
            try:
                self._server.wait(timeout=2)
            except subprocess.TimeoutExpired:
                self._server.kill()
            self._server = None
