"""Window-mode tracking + cursor compositing logic (sources/screen.py).

No X server exists in CI, so the native X11Capture is stood in by a fake
with the same surface; the hysteresis/re-find/compositing behavior under
test is pure Python/numpy (the reference's counterparts:
capture.py:159-217 re-targeting, capture.py:864-1340 cursor overlay)."""

from __future__ import annotations

import numpy as np
import pytest

import desktop2stereo_tpu.sources.screen as screen_mod
from desktop2stereo_tpu.sources.screen import (
    MOVE_HYSTERESIS_PX,
    ScreenSource,
    composite_cursor_bgra,
)


# ---------------------------------------------------------------------------
# cursor compositing
# ---------------------------------------------------------------------------

def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_cursor_composite_opaque_and_alpha():
    frame = np.zeros((8, 8, 4), np.uint8)
    frame[..., :3] = 100
    cur = np.zeros((2, 2), np.uint32)
    cur[0, 0] = _argb(255, 255, 0, 0)   # opaque red
    cur[0, 1] = _argb(128, 0, 255, 0)   # half green
    cur[1, 0] = _argb(0, 0, 0, 255)     # transparent

    composite_cursor_bgra(frame, cur, 3, 4)
    # BGRA layout: opaque red pixel → B=0 G=0 R=255
    assert tuple(frame[4, 3, :3]) == (0, 0, 255)
    # half green over gray 100: g ≈ 100*(1-0.502) + 255*0.502 ≈ 177
    b, g, r = frame[4, 4, :3]
    assert abs(int(g) - 177) <= 2 and b < 60 and r < 60
    # transparent leaves the frame untouched
    assert tuple(frame[5, 3, :3]) == (100, 100, 100)


def test_cursor_composite_clips_at_edges():
    frame = np.zeros((6, 6, 4), np.uint8)
    cur = np.full((4, 4), _argb(255, 255, 255, 255), np.uint32)
    composite_cursor_bgra(frame, cur, -2, -2)   # top-left overhang
    assert frame[0, 0, 2] == 255 and frame[2, 2, 2] == 0
    composite_cursor_bgra(frame, cur, 5, 5)     # bottom-right overhang
    assert frame[5, 5, 2] == 255
    composite_cursor_bgra(frame, cur, 10, 10)   # fully outside: no-op


# ---------------------------------------------------------------------------
# window tracking with a fake native backend
# ---------------------------------------------------------------------------

class FakeX11:
    def __init__(self):
        self.size = (100, 200)          # (h, w)
        self.windows = {7: (10, 20, 64, 32)}
        self.titles = {7: "My Editor"}
        self.grab_calls = []
        self.cursor_img = None

    def find_window(self, needle):
        for wid, t in self.titles.items():
            if needle.lower() in t.lower():
                return wid
        return 0

    def window_rect(self, wid):
        return self.windows.get(wid)

    def grab_rect(self, x, y, w, h):
        self.grab_calls.append((x, y, w, h))
        f = np.zeros((h, w, 4), np.uint8)
        f[..., 0] = 7
        return f

    def grab(self):
        return np.zeros((*self.size, 4), np.uint8)

    def cursor(self):
        return self.cursor_img

    def close(self):
        pass


def make_source(fake, title="editor", cursor=True):
    src = ScreenSource.__new__(ScreenSource)
    src.max_frames = None
    src.window_title = title
    src.with_cursor = cursor
    src._i = 0
    src._native = fake
    src._sct = None
    src._mon = None
    src._last = None
    src._failures = 0
    src._window = fake.find_window(title) if title else 0
    src._window_lost = False
    src._rect = fake.window_rect(src._window) if src._window else None
    src._mon_rect = None
    return src


def test_window_mode_grabs_tracked_rect():
    fake = FakeX11()
    src = make_source(fake)
    f = src.grab()
    assert f.shape == (32, 64, 4)
    assert fake.grab_calls[-1] == (10, 20, 64, 32)


def test_window_move_hysteresis():
    fake = FakeX11()
    src = make_source(fake)
    src.grab()
    # sub-hysteresis jitter: keep the old rect
    fake.windows[7] = (10 + MOVE_HYSTERESIS_PX, 20, 64, 32)
    src.grab()
    assert fake.grab_calls[-1] == (10, 20, 64, 32)
    # a real move re-targets
    fake.windows[7] = (40, 25, 64, 32)
    src.grab()
    assert fake.grab_calls[-1] == (40, 25, 64, 32)
    # any resize re-targets immediately
    fake.windows[7] = (40, 25, 80, 40)
    src.grab()
    assert fake.grab_calls[-1] == (40, 25, 80, 40)


def test_window_refind_after_recreate():
    """Window destroyed and re-created (app restart): re-find by title."""
    fake = FakeX11()
    src = make_source(fake)
    src.grab()
    del fake.windows[7]
    del fake.titles[7]
    fake.windows[9] = (5, 6, 30, 20)
    fake.titles[9] = "my editor v2"
    src.grab()
    assert src._window == 9
    assert fake.grab_calls[-1] == (5, 6, 30, 20)


def test_window_gone_reuses_last_frame():
    fake = FakeX11()
    src = make_source(fake)
    first = src.grab()
    calls_before = len(fake.grab_calls)
    del fake.windows[7]
    del fake.titles[7]
    # rect lookup fails, re-find fails → the stream FREEZES on the last
    # captured frame; no live grab of the stale desktop region happens
    again = src.grab()
    assert again is not None and again.shape == first.shape
    assert len(fake.grab_calls) == calls_before


def test_cursor_composited_into_window_frame():
    fake = FakeX11()
    cur = np.full((4, 4), 0xFF00FF00, np.uint32)  # opaque green
    fake.cursor_img = (cur, 12, 22)               # root coords
    src = make_source(fake)
    f = src.grab()
    # window origin (10, 20) → cursor at frame (2, 2); BGRA green
    assert tuple(f[2, 2, :3]) == (0, 255, 0)
    assert tuple(f[10, 10, :3]) == (7, 0, 0)      # untouched elsewhere


def test_list_monitors_parses_xrandr(monkeypatch):
    import desktop2stereo_tpu.core.display as display

    sample = (
        "Monitors: 2\n"
        " 0: +*eDP-1 1920/309x1080/173+0+0  eDP-1\n"
        " 1: +HDMI-1 2560/597x1440/336+1920+0  HDMI-1\n"
    )

    class R:
        stdout = sample

    monkeypatch.setattr(display.subprocess, "run", lambda *a, **k: R())
    mons = display.list_monitors()
    assert mons == [("eDP-1", 0, 0, 1920, 1080),
                    ("HDMI-1", 1920, 0, 2560, 1440)]
    assert display.monitor_rect(1) == (1920, 0, 2560, 1440)
    assert display.monitor_rect(5) is None


def test_monitor_rect_grab_path():
    fake = FakeX11()
    src = make_source(fake, title=None)
    src._window = 0
    src._mon_rect = (30, 10, 80, 50)
    f = src.grab()
    assert f.shape == (50, 80, 4)
    assert fake.grab_calls[-1] == (30, 10, 80, 50)


def test_fullscreen_cursor_via_cli_no_cursor_flag():
    fake = FakeX11()
    src = make_source(fake, title=None, cursor=False)
    src._window = 0
    f = src.grab()
    assert f.shape == (100, 200, 4)


def test_window_lost_never_degrades_to_desktop_grab():
    """Privacy regression: once the tracked window is gone (handle lost, no
    re-find), window mode FREEZES on the last captured frame — no live
    grabs of the stale region (its new occupant would leak), and NEVER a
    whole-desktop grab."""
    fake = FakeX11()
    src = make_source(fake)
    src.grab()
    calls_before = len(fake.grab_calls)
    del fake.windows[7]
    del fake.titles[7]
    full_root_grabs = 0
    orig_grab = fake.grab

    def counting_grab():
        nonlocal full_root_grabs
        full_root_grabs += 1
        return orig_grab()

    fake.grab = counting_grab
    # many frames with the window unfindable — MORE than the transient
    # failure budget: a lost window is an awaiting-restart state, it must
    # freeze indefinitely rather than kill the stream after ~2 s
    for _ in range(src.MAX_CONSECUTIVE_FAILURES + 10):
        f = src.grab()
        assert f is not None  # frozen on the last good frame
    assert full_root_grabs == 0
    assert len(fake.grab_calls) == calls_before  # zero live grabs while lost

    # window comes back under a matching title → tracking resumes
    fake.windows[11] = (2, 3, 50, 24)
    fake.titles[11] = "Editor (restored)"
    src.grab()
    assert src._window == 11
    assert fake.grab_calls[-1] == (2, 3, 50, 24)
