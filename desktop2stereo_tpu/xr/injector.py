"""OS input injection: the capture-host half of the XR input loop.

The reference's headline trick — driving the desktop from inside the
headset — injects the laser cursor, clicks, scroll and virtual-keyboard
presses with SendInput/InjectTouchInput on Windows (reference
xr_viewer/input.py:121-390).  Here the capture host is a Linux X session,
so the injector is XTest (native/d2s_native.cpp `d2s_input_*`, dlopen'd
libXtst), reached through this shim:

- `XTestInjector`  — real injection into the X display being captured;
- `RecordingInjector` — an in-memory double for loopback tests;
- `InputBridge`    — decodes the wire events from xr/net.py's input
  channel (normalized cursor uv, buttons, scroll ticks, VK key presses)
  into injector calls, including the VK→X-keysym translation for the
  virtual keyboard's Windows-VK vocabulary (xr/keyboard.py).
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

# --------------------------------------------------------- VK → keysym ----

# X11 keysyms for the keyboard layer's Windows virtual-key codes
# (xr/keyboard.py VK table; the reference injects the same VKs natively).
_VK_KEYSYM: Dict[int, int] = {
    0x1B: 0xFF1B,  # Esc
    0x09: 0xFF09,  # Tab
    0x14: 0xFFE5,  # Caps → Caps_Lock
    0x10: 0xFFE1,  # Shift → Shift_L
    0x11: 0xFFE3,  # Ctrl → Control_L
    0x12: 0xFFE9,  # Alt → Alt_L
    0x5B: 0xFFEB,  # Win → Super_L
    0x5D: 0xFF67,  # Apps → Menu
    0x20: 0x0020,  # Space
    0x0D: 0xFF0D,  # Enter
    0x08: 0xFF08,  # Backspace
    0x2D: 0xFF63,  # Insert
    0x2E: 0xFFFF,  # Delete
    0x24: 0xFF50,  # Home
    0x23: 0xFF57,  # End
    0x21: 0xFF55,  # PgUp
    0x22: 0xFF56,  # PgDn
    0x2C: 0xFF61,  # PrtSc → Print
    0x91: 0xFF14,  # ScrLk
    0x13: 0xFF13,  # Pause
    0x26: 0xFF52,  # Up
    0x28: 0xFF54,  # Down
    0x25: 0xFF51,  # Left
    0x27: 0xFF53,  # Right
    # punctuation VKs → ASCII keysyms
    0xC0: 0x60, 0xBD: 0x2D, 0xBB: 0x3D, 0xDB: 0x5B, 0xDD: 0x5D,
    0xDC: 0x5C, 0xBA: 0x3B, 0xDE: 0x27, 0xBC: 0x2C, 0xBE: 0x2E, 0xBF: 0x2F,
}
for _i in range(10):                     # digits: VK == ASCII == keysym
    _VK_KEYSYM[0x30 + _i] = 0x30 + _i
for _c in range(ord("A"), ord("Z") + 1):  # letters: lowercase keysym
    _VK_KEYSYM[_c] = _c + 0x20
for _i in range(1, 13):                  # F1..F12
    _VK_KEYSYM[0x6F + _i] = 0xFFBD + _i


def vk_to_keysym(vk: int) -> Optional[int]:
    return _VK_KEYSYM.get(int(vk))


# ------------------------------------------------------------ injectors ---


class XTestInjector:
    """Real X11 injection via the native library (graceful: raises
    RuntimeError when no compiler/library/display/XTest)."""

    def __init__(self, display: str = ""):
        from desktop2stereo_tpu.native import load

        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.d2s_input_open(display.encode())
        if not self._h:
            raise RuntimeError("XTest input injection unavailable "
                               "(no display or libXtst)")
        w = ctypes.c_int()
        h = ctypes.c_int()
        lib.d2s_input_screen_size(self._h, ctypes.byref(w), ctypes.byref(h))
        self.screen_size: Tuple[int, int] = (w.value, h.value)

    def move(self, x: int, y: int) -> None:
        self._lib.d2s_input_move(self._h, int(x), int(y))

    def button(self, button: int, down: bool) -> None:
        self._lib.d2s_input_button(self._h, int(button), int(down))

    def key_vk(self, vk: int, down: bool) -> None:
        ks = vk_to_keysym(vk)
        if ks is not None:
            self._lib.d2s_input_key(self._h, ks, int(down))

    def close(self) -> None:
        if self._h:
            self._lib.d2s_input_close(self._h)
            self._h = None


class RecordingInjector:
    """Test double: records every call (the loopback e2e harness)."""

    def __init__(self, screen_size: Tuple[int, int] = (1920, 1080)):
        self.screen_size = screen_size
        self.events: List[tuple] = []

    def move(self, x: int, y: int) -> None:
        self.events.append(("move", int(x), int(y)))

    def button(self, button: int, down: bool) -> None:
        self.events.append(("button", int(button), bool(down)))

    def key_vk(self, vk: int, down: bool) -> None:
        self.events.append(("key", int(vk), bool(down)))

    def close(self) -> None:
        self.events.append(("close",))


def make_injector(display: str = "") -> Optional[XTestInjector]:
    """XTest injector if the host can inject, else None (headless TPU pods
    serve frames but can't click — the sink logs that input is inert)."""
    try:
        return XTestInjector(display)
    except RuntimeError:
        return None


# --------------------------------------------------------------- bridge ---

# X11 wheel buttons: 4 up, 5 down, 6 left, 7 right.  Tuples are
# (button-for-positive-ticks, button-for-negative): positive dy = scroll up
# (stick forward), positive dx = scroll right.
_WHEEL_V = (4, 5)
_WHEEL_H = (7, 6)


class InputBridge:
    """Wire events (xr/net.py input channel) → injector calls.

    Cursor positions travel as normalized (u, v) in IMAGE convention
    (v=0 top) of the captured frame, so resolution changes on either side
    never skew the mapping; the bridge scales to the injector's screen."""

    def __init__(self, injector, screen_size: Optional[Tuple[int, int]] = None):
        self.injector = injector
        self.screen_size = screen_size or getattr(
            injector, "screen_size", (1920, 1080))
        self.events_handled = 0

    def handle(self, events: List[dict]) -> None:
        inj = self.injector
        if inj is None:
            return
        w, h = self.screen_size
        for ev in events:
            t = ev.get("t")
            if t == "move":
                x = float(ev.get("u", 0.0)) * max(w - 1, 1)
                y = float(ev.get("v", 0.0)) * max(h - 1, 1)
                inj.move(int(round(x)), int(round(y)))
            elif t == "button":
                inj.button(int(ev.get("b", 1)), bool(ev.get("down")))
            elif t == "scroll":
                for ticks, (bpos, bneg) in ((int(ev.get("dy", 0)), _WHEEL_V),
                                            (int(ev.get("dx", 0)), _WHEEL_H)):
                    btn = bpos if ticks > 0 else bneg
                    for _ in range(abs(ticks)):
                        inj.button(btn, True)
                        inj.button(btn, False)
            elif t == "key":
                mods = ev.get("mods") or ()
                down = bool(ev.get("down", True))
                vk = int(ev.get("vk", 0))
                if down:
                    for m in mods:
                        inj.key_vk(int(m), True)
                    inj.key_vk(vk, True)
                else:
                    inj.key_vk(vk, False)
                    for m in reversed(list(mods)):
                        inj.key_vk(int(m), False)
            elif t == "tap":
                # one-shot key press+release with latched modifiers (the
                # virtual keyboard's output, xr/keyboard.py press())
                mods = [int(m) for m in (ev.get("mods") or ())]
                vk = int(ev.get("vk", 0))
                for m in mods:
                    inj.key_vk(m, True)
                inj.key_vk(vk, True)
                inj.key_vk(vk, False)
                for m in reversed(mods):
                    inj.key_vk(m, False)
            self.events_handled += 1
