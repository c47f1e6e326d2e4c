"""ctypes bindings for the native host runtime (native/d2s_native.cpp).

Compiles the shared library on first use (g++, cached next to the source and
keyed by source mtime) and exposes:

- ShmFrameRing: seqlock'd latest-frame-wins ring in POSIX shared memory —
  the host-IPC analog of the reference's PBO/pinned DMA rings
  (reference xr_viewer/frame.py:62-161); lets external producers feed the
  pipeline with one memcpy.
- X11Capture: Linux screen grab via dlopen'd libX11 (the reference's
  DXGI-duplication counterpart, reference capture.py:249-491).
- FramePacer: absolute-deadline pacing via clock_nanosleep, drift-free
  (replaces the sleep-based pacing of reference main.py:211-230).

Everything degrades gracefully: `load()` returns None if no compiler/lib.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "d2s_native.cpp")
_LIB_DIR = os.path.expanduser("~/.cache/desktop2stereo_tpu/native")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _lib_path() -> str:
    src = os.path.abspath(_SRC)
    stamp = int(os.path.getmtime(src))
    return os.path.join(_LIB_DIR, f"libd2s_native_{stamp}.so")


def load() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        src = os.path.abspath(_SRC)
        if not os.path.exists(src):
            _load_failed = True
            return None
        path = _lib_path()
        if not os.path.exists(path):
            os.makedirs(_LIB_DIR, exist_ok=True)
            # per-process temp name: capture_agent and the pipeline often
            # start together on a fresh cache, and two g++ runs writing the
            # SAME .tmp would publish a corrupt .so via os.replace (then
            # latch _load_failed for the process lifetime)
            tmp = f"{path}.{os.getpid()}.tmp"
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   "-o", tmp, src, "-ldl"]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(tmp, path)  # atomic: last writer wins, both valid
            except Exception:
                _load_failed = True
                return None
            finally:
                if os.path.exists(tmp):
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _load_failed = True
            return None

        lib.d2s_ring_create.restype = ctypes.c_void_p
        lib.d2s_ring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32]
        lib.d2s_ring_open.restype = ctypes.c_void_p
        lib.d2s_ring_open.argtypes = [ctypes.c_char_p]
        lib.d2s_ring_write.restype = ctypes.c_uint64
        lib.d2s_ring_write.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint64,
        ]
        lib.d2s_ring_read_latest.restype = ctypes.c_uint64
        lib.d2s_ring_read_latest.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
        ]
        lib.d2s_ring_latest_seq.restype = ctypes.c_uint64
        lib.d2s_ring_latest_seq.argtypes = [ctypes.c_void_p]
        lib.d2s_ring_max_bytes.restype = ctypes.c_uint32
        lib.d2s_ring_max_bytes.argtypes = [ctypes.c_void_p]
        lib.d2s_ring_close.argtypes = [ctypes.c_void_p]

        lib.d2s_x11_open.restype = ctypes.c_void_p
        lib.d2s_x11_open.argtypes = [ctypes.c_char_p]
        lib.d2s_x11_size.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.d2s_x11_grab.restype = ctypes.c_int
        lib.d2s_x11_grab.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int]
        lib.d2s_x11_grab_rect.restype = ctypes.c_int
        lib.d2s_x11_grab_rect.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.d2s_x11_find_window.restype = ctypes.c_uint64
        lib.d2s_x11_find_window.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.d2s_x11_window_rect.restype = ctypes.c_int
        lib.d2s_x11_window_rect.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.d2s_x11_list_windows.restype = ctypes.c_uint32
        lib.d2s_x11_list_windows.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32]
        lib.d2s_x11_cursor.restype = ctypes.c_int
        lib.d2s_x11_cursor.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.d2s_x11_close.argtypes = [ctypes.c_void_p]

        lib.d2s_now_ns.restype = ctypes.c_uint64
        lib.d2s_pace.restype = ctypes.c_uint32
        lib.d2s_pace.argtypes = [ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64]

        lib.d2s_input_open.restype = ctypes.c_void_p
        lib.d2s_input_open.argtypes = [ctypes.c_char_p]
        lib.d2s_input_screen_size.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.d2s_input_move.restype = ctypes.c_int
        lib.d2s_input_move.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_int]
        lib.d2s_input_button.restype = ctypes.c_int
        lib.d2s_input_button.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_int]
        lib.d2s_input_key.restype = ctypes.c_int
        lib.d2s_input_key.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                      ctypes.c_int]
        lib.d2s_input_close.argtypes = [ctypes.c_void_p]

        lib.d2s_touch_open.restype = ctypes.c_void_p
        lib.d2s_touch_open.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.d2s_touch_point.restype = ctypes.c_int
        lib.d2s_touch_point.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int]
        lib.d2s_touch_frame.restype = ctypes.c_int
        lib.d2s_touch_frame.argtypes = [ctypes.c_void_p]
        lib.d2s_touch_close.argtypes = [ctypes.c_void_p]

        _lib = lib
        return _lib


class ShmFrameRing:
    """Latest-frame-wins shared-memory ring."""

    def __init__(self, name: str, max_bytes: int = 0, slots: int = 3,
                 create: bool = True):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable (g++ missing?)")
        self._lib = lib
        self.name = name
        if create:
            self._h = lib.d2s_ring_create(name.encode(), max_bytes, slots)
        else:
            self._h = lib.d2s_ring_open(name.encode())
        if not self._h:
            raise RuntimeError(f"could not {'create' if create else 'open'} ring {name}")
        self._buf = np.empty(lib.d2s_ring_max_bytes(self._h), np.uint8)
        self.last_seq = 0

    def write(self, frame: np.ndarray, timestamp_ns: int = 0) -> int:
        f = np.ascontiguousarray(frame, np.uint8)
        h, w = f.shape[0], f.shape[1]
        c = 1 if f.ndim == 2 else f.shape[2]
        seq = self._lib.d2s_ring_write(
            self._h, f.ctypes.data_as(ctypes.c_void_p), w, h, c,
            timestamp_ns or self._lib.d2s_now_ns())
        if seq == 0:
            raise ValueError("frame larger than ring slot capacity")
        return seq

    def read_latest(self) -> Optional[Tuple[np.ndarray, int]]:
        """Newest frame newer than the last read, or None."""
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        c = ctypes.c_uint32()
        ts = ctypes.c_uint64()
        seq = self._lib.d2s_ring_read_latest(
            self._h, self._buf.ctypes.data_as(ctypes.c_void_p), self._buf.size,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(c), ctypes.byref(ts),
            self.last_seq)
        if seq in (0, 2**64 - 1):
            return None
        self.last_seq = seq
        n = w.value * h.value * c.value
        frame = self._buf[:n].reshape(h.value, w.value, c.value).copy()
        return frame, ts.value

    def close(self) -> None:
        if self._h:
            self._lib.d2s_ring_close(self._h)
            self._h = None


class X11Capture:
    """Root-window screen grab (BGRA)."""

    def __init__(self, display: str = ""):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.d2s_x11_open(display.encode())
        if not self._h:
            raise RuntimeError("no X11 display available")
        w = ctypes.c_int()
        h = ctypes.c_int()
        lib.d2s_x11_size(self._h, ctypes.byref(w), ctypes.byref(h))
        self.size = (h.value, w.value)
        self._buf = np.empty((h.value, w.value, 4), np.uint8)

    def grab(self) -> Optional[np.ndarray]:
        h, w = self.size
        rc = self._lib.d2s_x11_grab(
            self._h, self._buf.ctypes.data_as(ctypes.c_void_p), w, h)
        if rc != 0:
            return None
        return self._buf  # BGRA; callers copy if they keep it

    def grab_rect(self, x: int, y: int, w: int, h: int) -> Optional[np.ndarray]:
        """Region-of-desktop grab (window mode), BGRA [h,w,4]."""
        sh, sw = self.size
        x = max(0, min(x, max(sw - w, 0)))
        y = max(0, min(y, max(sh - h, 0)))
        w = min(w, sw)
        h = min(h, sh)
        buf = np.empty((h, w, 4), np.uint8)
        rc = self._lib.d2s_x11_grab_rect(
            self._h, buf.ctypes.data_as(ctypes.c_void_p), x, y, w, h)
        if rc != 0:
            return None
        return buf

    def find_window(self, title_substr: str) -> int:
        """Case-insensitive title-substring window search; 0 = not found
        (the reference's window-title mode, reference capture.py:39-247)."""
        return int(self._lib.d2s_x11_find_window(
            self._h, title_substr.encode()))

    def list_windows(self) -> "list[str]":
        """Titles of viewable top-level windows (_NET_CLIENT_LIST, tree-walk
        fallback) — the capture dropdown's source, like the reference GUI's
        window list (reference gui.py:376-470)."""
        buf = ctypes.create_string_buffer(64 * 1024)
        n = self._lib.d2s_x11_list_windows(self._h, buf, len(buf))
        if not n:
            return []
        titles = buf.value.decode("utf-8", "replace").split("\n")
        # de-dup, preserve order (apps keep same-titled auxiliaries)
        seen, out = set(), []
        for t in titles:
            if t and t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def window_rect(self, window: int) -> Optional[Tuple[int, int, int, int]]:
        """(x, y, w, h) of a window in root coordinates, or None."""
        x = ctypes.c_int(); y = ctypes.c_int()
        w = ctypes.c_int(); h = ctypes.c_int()
        rc = self._lib.d2s_x11_window_rect(
            self._h, window, ctypes.byref(x), ctypes.byref(y),
            ctypes.byref(w), ctypes.byref(h))
        if rc != 0 or w.value <= 0 or h.value <= 0:
            return None
        return x.value, y.value, w.value, h.value

    _CURSOR_CAP = 256 * 256

    def cursor(self) -> Optional[Tuple[np.ndarray, int, int]]:
        """XFixes cursor snapshot: (argb [h,w] u32, root_x, root_y) with the
        hotspot already subtracted, or None if XFixes is unavailable
        (the reference composites the cursor the same way on macOS/mss,
        reference capture.py:864-1340, 1385-1501)."""
        buf = np.empty(self._CURSOR_CAP, np.uint32)
        x = ctypes.c_int(); y = ctypes.c_int()
        xh = ctypes.c_int(); yh = ctypes.c_int()
        w = ctypes.c_int(); h = ctypes.c_int()
        rc = self._lib.d2s_x11_cursor(
            self._h, buf.ctypes.data_as(ctypes.c_void_p), self._CURSOR_CAP,
            ctypes.byref(x), ctypes.byref(y), ctypes.byref(xh),
            ctypes.byref(yh), ctypes.byref(w), ctypes.byref(h))
        if rc != 0 or w.value <= 0 or h.value <= 0:
            return None
        img = buf[: w.value * h.value].reshape(h.value, w.value)
        return img, x.value - xh.value, y.value - yh.value

    def close(self) -> None:
        if self._h:
            self._lib.d2s_x11_close(self._h)
            self._h = None


class FramePacer:
    """Absolute-deadline frame pacing; returns skipped-interval count."""

    def __init__(self, fps: float):
        lib = load()
        self._lib = lib
        self.interval_ns = int(1e9 / fps) if fps > 0 else 0
        self._deadline = ctypes.c_uint64(0)

    def wait(self) -> int:
        if self.interval_ns == 0:
            return 0
        if self._lib is None:  # pure-python fallback
            import time

            now = time.monotonic_ns()
            if self._deadline.value == 0:
                self._deadline.value = now + self.interval_ns
            sleep = (self._deadline.value - now) / 1e9
            if sleep > 0:
                time.sleep(sleep)
            self._deadline.value += self.interval_ns
            return 0
        return self._lib.d2s_pace(ctypes.byref(self._deadline),
                                  self.interval_ns)
