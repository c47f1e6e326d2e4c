"""Real screen capture (optional; Linux/X11 via mss).

The reference dedicates ~1.5k LoC to per-OS capture backends (reference
capture.py: DXGI/WGC/SCK/Quartz/mss).  On a headless TPU host only the mss
path is meaningful; it hides behind the same `grab()` interface so a
workstation deployment can swap richer backends in.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ScreenSource:
    def __init__(self, monitor_index: int = 0, max_frames: Optional[int] = None) -> None:
        try:
            import mss
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "screen capture needs the 'mss' package (not bundled on TPU hosts); "
                "use --source synthetic/image/video instead"
            ) from e
        self._sct = mss.mss()
        mons = self._sct.monitors
        self._mon = mons[min(monitor_index + 1, len(mons) - 1)]
        self.max_frames = max_frames
        self._i = 0

    def grab(self) -> Optional[np.ndarray]:
        if self.max_frames is not None and self._i >= self.max_frames:
            return None
        self._i += 1
        shot = self._sct.grab(self._mon)
        return np.asarray(shot)  # BGRA uint8

    def close(self) -> None:
        self._sct.close()
