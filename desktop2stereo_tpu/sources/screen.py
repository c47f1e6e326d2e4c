"""Real screen capture behind the reference's `grab()` interface.

The reference dedicates ~1.5k LoC to per-OS capture backends (reference
capture.py: DXGI/WGC/ScreenCaptureKit/Quartz/mss).  On a Linux/TPU host the
meaningful paths, tried in order:

1. native X11 grab (C++ shim, desktop2stereo_tpu.native.X11Capture — the
   DXGI-duplication counterpart);
2. mss, if installed;
3. error with guidance (headless hosts should use --source shm with a
   remote capture agent, or synthetic/video).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ScreenSource:
    def __init__(self, monitor_index: int = 0, max_frames: Optional[int] = None,
                 display: str = "") -> None:
        self.max_frames = max_frames
        self._i = 0
        self._native = None
        self._sct = None
        self._mon = None
        self._last: Optional[np.ndarray] = None
        self._failures = 0
        try:
            from desktop2stereo_tpu.native import X11Capture

            self._native = X11Capture(display)
            return
        except Exception:
            pass
        try:
            import mss

            self._sct = mss.mss()
            mons = self._sct.monitors
            self._mon = mons[min(monitor_index + 1, len(mons) - 1)]
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "no screen capture backend: no X11 display for the native "
                "shim and no 'mss' package; on a headless TPU host use "
                "--source shm (remote capture agent) or synthetic/video"
            ) from e

    # transient-failure budget: reuse the last good frame for this many
    # consecutive misses before declaring the source dead (the reference
    # reuses its previous frame on grab failure, reference capture.py:228-236)
    MAX_CONSECUTIVE_FAILURES = 120

    def grab(self) -> Optional[np.ndarray]:
        if self.max_frames is not None and self._i >= self.max_frames:
            return None
        self._i += 1
        if self._native is not None:
            frame = self._native.grab()
            if frame is None:
                self._failures += 1
                if self._last is not None and \
                        self._failures <= self.MAX_CONSECUTIVE_FAILURES:
                    return self._last
                return None
            self._failures = 0
            self._last = frame.copy()
            return self._last
        try:
            shot = self._sct.grab(self._mon)
        except Exception:
            self._failures += 1
            if self._last is not None and \
                    self._failures <= self.MAX_CONSECUTIVE_FAILURES:
                return self._last
            return None
        self._failures = 0
        self._last = np.asarray(shot)  # BGRA uint8
        return self._last

    def close(self) -> None:
        if self._native is not None:
            self._native.close()
        if self._sct is not None:
            self._sct.close()
