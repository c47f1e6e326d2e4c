"""WindowSink logic with a fake cv2 (CI has no display)."""

from __future__ import annotations

import types

import numpy as np
import pytest

from desktop2stereo_tpu.sinks.window import WindowCloseRequested, WindowSink


class FakeCv:
    WINDOW_NORMAL = 0
    WINDOW_FULLSCREEN = 1
    WND_PROP_FULLSCREEN = 2
    WINDOW_KEEPRATIO = 4

    def __init__(self):
        self.shown = []
        self.titles = []
        self.props = []
        self.key_queue = []
        self.saved = []
        self.window_flags = None

    def namedWindow(self, _t, flags=0):
        self.window_flags = flags

    def imshow(self, title, img):
        self.shown.append(img.copy())

    def setWindowTitle(self, _t, new):
        self.titles.append(new)

    def setWindowProperty(self, _t, prop, val):
        self.props.append((prop, val))

    def waitKey(self, _ms):
        return self.key_queue.pop(0) if self.key_queue else 255

    def imwrite(self, path, img):
        self.saved.append(path)
        return True

    def destroyWindow(self, _t):
        pass


def make_sink(monkeypatch):
    fake = FakeCv()
    sink = WindowSink.__new__(WindowSink)
    sink._cv = fake
    sink.title = "t"
    sink.screenshot_dir = "."
    sink._fullscreen = False
    sink._created = False
    sink._last_title = 0.0
    sink.frames = 0
    sink.mode_switcher = None
    sink.keep_aspect = False
    sink.fill_16_9 = False
    sink._show_rgb_in_depth = False
    return sink, fake


def test_keep_aspect_flag(monkeypatch):
    # the settings 'Fix Viewer Aspect' knob (reference utils.py:902)
    sink, fake = make_sink(monkeypatch)
    sink.keep_aspect = True
    sink.push(np.zeros((4, 6, 3), np.uint8), None, {})
    assert fake.window_flags & FakeCv.WINDOW_KEEPRATIO
    sink2, fake2 = make_sink(monkeypatch)
    sink2.push(np.zeros((4, 6, 3), np.uint8), None, {})
    assert not (fake2.window_flags & FakeCv.WINDOW_KEEPRATIO)


def test_push_blits_bgr_and_updates_title(monkeypatch):
    sink, fake = make_sink(monkeypatch)
    rgb = np.zeros((4, 6, 3), np.uint8)
    rgb[..., 0] = 200  # red channel
    sink.push(rgb, None, {"fps": 59.9, "fps_1pct_low": 48.2, "dropped": 3})
    assert fake.shown[0][..., 2].max() == 200  # BGR flip happened
    assert "59.9 FPS" in fake.titles[0] and "dropped 3" in fake.titles[0]


def test_quit_key_raises_for_engine_shutdown(monkeypatch):
    sink, fake = make_sink(monkeypatch)
    fake.key_queue = [ord("q")]
    with pytest.raises(WindowCloseRequested):
        sink.push(np.zeros((2, 2, 3), np.uint8), None, {})


def test_fullscreen_and_screenshot_keys(monkeypatch, tmp_path):
    sink, fake = make_sink(monkeypatch)
    sink.screenshot_dir = str(tmp_path)
    fake.key_queue = [ord("f"), ord("s")]
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert fake.props[-1] == (FakeCv.WND_PROP_FULLSCREEN, FakeCv.WINDOW_FULLSCREEN)
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert len(fake.saved) == 1


def test_display_mode_hotkeys(monkeypatch):
    sink, fake = make_sink(monkeypatch)

    class FakeProgram:
        def __init__(self):
            self.calls = []

        def set_display_mode(self, m):
            self.calls.append(m)

        def cycle_display_mode(self, delta=1):
            self.calls.append(("cycle", delta))
            return "Full-SBS"

    prog = FakeProgram()
    sink.mode_switcher = prog
    fake.key_queue = [ord("m"), ord("5")]
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    from desktop2stereo_tpu.core.config import DISPLAY_MODES

    assert prog.calls == [("cycle", 1), DISPLAY_MODES[4]]


def test_reference_key_aliases_tab_enter_space_arrows(monkeypatch):
    """The reference's own bindings (readme.md:367-388): Tab cycles the
    display mode, Enter/Space toggle fullscreen, Up/Down arrows step the
    depth strength — delivered as waitKeyEx extended codes (GTK keysym
    65362 and Windows VK 2621440 both accepted)."""
    sink, fake = make_sink(monkeypatch)

    class FakeProgram:
        def __init__(self):
            self.calls = []

        def cycle_display_mode(self, delta=1):
            self.calls.append(("cycle", delta))
            return "Full-SBS"

        def adjust_depth_strength(self, delta):
            self.calls.append(("adjust", delta))
            return 1.0

    prog = FakeProgram()
    sink.mode_switcher = prog
    frame = np.zeros((2, 2, 3), np.uint8)
    fake.key_queue = [9, 13, ord(" "), 65362, 2621440]
    sink.push(frame, None, {})  # Tab → cycle
    sink.push(frame, None, {})  # Enter → fullscreen on
    assert fake.props[-1] == (FakeCv.WND_PROP_FULLSCREEN,
                              FakeCv.WINDOW_FULLSCREEN)
    sink.push(frame, None, {})  # Space → fullscreen off
    assert fake.props[-1] == (FakeCv.WND_PROP_FULLSCREEN,
                              FakeCv.WINDOW_NORMAL)
    sink.push(frame, None, {})  # GTK Up → +0.5
    sink.push(frame, None, {})  # Windows Down → -0.5
    assert prog.calls == [("cycle", 1), ("adjust", 0.5), ("adjust", -0.5)]


def test_monitor_move_keys(monkeypatch):
    """Left/Right arrows relocate the window to the adjacent monitor
    (reference readme.md:374-375), re-applying fullscreen on the target."""
    from desktop2stereo_tpu.core import display as display_mod

    sink, fake = make_sink(monkeypatch)
    monkeypatch.setattr(
        display_mod, "list_monitors",
        lambda: [("eDP-1", 0, 0, 1920, 1080), ("HDMI-1", 1920, 0, 2560, 1440)])
    fake.moves = []
    fake.moveWindow = lambda _t, x, y: fake.moves.append((x, y))
    fake.getWindowImageRect = lambda _t: (10, 10, 640, 480)

    frame = np.zeros((2, 2, 3), np.uint8)
    fake.key_queue = [65363]  # GTK Right → monitor 1
    sink.push(frame, None, {})
    assert fake.moves[-1] == (1920 + 32, 0 + 32)
    fake.key_queue = [2424832]  # Windows Left: from monitor 0, wraps to 1
    sink.push(frame, None, {})
    assert fake.moves[-1] == (1920 + 32, 0 + 32)

    # fullscreen survives the move: dropped for moveWindow, re-applied
    sink._fullscreen = True
    fake.props.clear()
    fake.key_queue = [65363]
    sink.push(frame, None, {})
    assert fake.props == [
        (FakeCv.WND_PROP_FULLSCREEN, FakeCv.WINDOW_NORMAL),
        (FakeCv.WND_PROP_FULLSCREEN, FakeCv.WINDOW_FULLSCREEN),
    ]

    # single-monitor hosts: the key is a no-op
    monkeypatch.setattr(display_mod, "list_monitors",
                        lambda: [("eDP-1", 0, 0, 1920, 1080)])
    fake.moves.clear()
    fake.key_queue = [65363]
    sink.push(frame, None, {})
    assert fake.moves == []


def test_depth_strength_hotkeys(monkeypatch):
    """+/-/0 step the live depth strength (the reference viewer's
    UP/DOWN/0 keys, reference viewer.py:2321-2329)."""
    sink, fake = make_sink(monkeypatch)

    class FakeProgram:
        def __init__(self):
            self.calls = []

        def set_display_mode(self, m):
            pass

        def adjust_depth_strength(self, d):
            self.calls.append(d)
            return 2.0 + d

        def reset_depth_strength(self):
            self.calls.append("reset")
            return 2.0

    prog = FakeProgram()
    sink.mode_switcher = prog
    fake.key_queue = [ord("+"), ord("-"), ord("0"), ord("=")]
    for _ in range(4):
        sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert prog.calls == [0.5, -0.5, "reset", 0.5]


def test_fill_16_9_letterboxes_presented_frame(monkeypatch):
    """KEY_A parity (reference viewer.py:2340-2343): fill-16:9 pads the
    shown frame into a 16:9 canvas, centered, toggled live."""
    sink, fake = make_sink(monkeypatch)
    sink.fill_16_9 = True
    # 1:1 square → pillarboxed to 16:9 width
    sink.push(np.full((90, 90, 3), 7, np.uint8), None, {})
    shown = fake.shown[0]
    assert shown.shape == (90, 160, 3)
    assert shown[:, :35].max() == 0 and shown[:, -35:].max() == 0
    assert (shown[:, 35:125] == 7).all()
    # ultra-wide → letterboxed to 16:9 height
    sink.push(np.full((10, 320, 3), 7, np.uint8), None, {})
    assert fake.shown[1].shape == (180, 320, 3)
    # exact 16:9 passes through untouched
    sink.push(np.full((90, 160, 3), 7, np.uint8), None, {})
    assert (fake.shown[2] == 7).all()
    # 'a' toggles it off: next frame shown bare
    fake.key_queue = [ord("a")]
    sink.push(np.full((90, 90, 3), 7, np.uint8), None, {})
    sink.push(np.full((90, 90, 3), 7, np.uint8), None, {})
    assert fake.shown[-1].shape == (90, 90, 3)


def test_aspect_lock_toggle_recreates_window(monkeypatch):
    """KEY_L parity (reference viewer.py:2344-2347): live aspect-lock
    toggle re-creates the window with WINDOW_KEEPRATIO."""
    sink, fake = make_sink(monkeypatch)
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert not (fake.window_flags & FakeCv.WINDOW_KEEPRATIO)
    fake.key_queue = [ord("l")]
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert sink.keep_aspect and not sink._created
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert fake.window_flags & FakeCv.WINDOW_KEEPRATIO


def test_depth_mode_original_rgb_toggle(monkeypatch):
    """KEY_D parity (reference viewer.py:2310-2314): in Depth mode, 'd'
    flips to the original RGB (Mono program) and back; inert elsewhere."""
    sink, fake = make_sink(monkeypatch)

    class FakeProgram:
        def __init__(self):
            self.display_mode = "Depth"
            self.calls = []

        def set_display_mode(self, m):
            self.display_mode = m
            self.calls.append(m)

    prog = FakeProgram()
    sink.mode_switcher = prog
    fake.key_queue = [ord("d"), ord("d")]
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert prog.calls == ["Mono", "Depth"]
    # inert when not in Depth mode
    prog.display_mode = "Half-SBS"
    fake.key_queue = [ord("d")]
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert prog.calls == ["Mono", "Depth"]
    # an explicit mode change clears the pending restore state
    prog.display_mode = "Depth"
    fake.key_queue = [ord("d"), ord("3")]
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    sink.push(np.zeros((2, 2, 3), np.uint8), None, {})
    assert not sink._show_rgb_in_depth


def test_headless_construction_fails_cleanly(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    with pytest.raises((RuntimeError, ImportError)):
        WindowSink()
