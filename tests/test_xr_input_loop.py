"""XR → OS input loop: laser on the virtual screen drives the desktop.

VERDICT r3 bar: "loopback e2e test: scripted chord sequence on the client
moves/clicks a recording fake injector server-side".  Covered here
end-to-end over the real TCP input channel, plus units for the router
(cursor/click/scroll/keyboard policy composition), the injector bridge
(wire events → injector calls, VK→keysym coverage), and graceful
degradation on hosts that cannot inject.

Reference behavior: xr_viewer/input_handler.py:31-2046 (laser cursor,
trigger clicks, stick scroll/arrows, laser typing), input.py:121-390
(OS injection), constants.py:5-17 (edge snap, keyboard priority).
"""

import numpy as np
import pytest

from desktop2stereo_tpu.xr.injector import (InputBridge, RecordingInjector,
                                            make_injector, vk_to_keysym)
from desktop2stereo_tpu.xr.input_router import HandInput, OsInputRouter
from desktop2stereo_tpu.xr.keyboard import VK, build_layout


# ---- router ---------------------------------------------------------------


def hand_at(u, v, t=3.0, trigger=0.0):
    return HandInput(screen_uv=(u, v), plane_uv=(u, v), screen_dist=t,
                     trigger=trigger)


def test_router_moves_and_clicks():
    r = OsInputRouter((1920, 1080))
    ev = r.update({"right": hand_at(0.5, 0.5)}, now=0.0)
    moves = [e for e in ev if e["t"] == "move"]
    assert moves and moves[0]["u"] == pytest.approx(0.5, abs=1e-3)
    # v=0.5 (screen center, v up) → image v 0.5
    assert moves[0]["v"] == pytest.approx(0.5, abs=1e-3)
    ev = r.update({"right": hand_at(0.5, 0.5, trigger=1.0)}, now=0.1)
    assert {"t": "button", "b": 1, "down": True} in ev
    ev = r.update({"right": hand_at(0.5, 0.5, trigger=0.0)}, now=0.2)
    assert {"t": "button", "b": 1, "down": False} in ev


def test_router_vertical_mapping_top_of_screen_is_low_v():
    r = OsInputRouter((100, 100))
    ev = r.update({"right": hand_at(0.5, 0.9)}, now=0.0)  # near screen TOP
    mv = [e for e in ev if e["t"] == "move"][0]
    assert mv["v"] < 0.2  # image v near 0 (top)


def test_router_edge_snap_keeps_cursor_moving():
    """Off the bounded screen but near the plane: the cursor blends toward
    the clamped edge projection (reference input_handler.py:242-270)."""
    r = OsInputRouter((1000, 1000))
    r.update({"right": hand_at(0.9, 0.5)}, now=0.0)
    # ray slides off the right edge: bounded hit gone, plane uv keeps going
    ev = r.update({"right": HandInput(plane_uv=(1.2, 0.5))}, now=0.1)
    mv = [e for e in ev if e["t"] == "move"]
    assert mv and mv[0]["u"] > 0.9  # pulled toward the edge, not frozen


def test_router_drag_emits_press_then_moves():
    r = OsInputRouter((1000, 1000))
    r.update({"right": hand_at(0.2, 0.5)}, now=0.0)
    ev1 = r.update({"right": hand_at(0.2, 0.5, trigger=1.0)}, now=0.05)
    assert any(e["t"] == "button" and e["down"] for e in ev1)
    ev2 = r.update({"right": hand_at(0.4, 0.5, trigger=1.0)}, now=0.1)
    assert any(e["t"] == "move" for e in ev2)
    assert r.state.dragging
    ev3 = r.update({"right": hand_at(0.4, 0.5, trigger=0.0)}, now=0.2)
    assert any(e["t"] == "button" and not e["down"] for e in ev3)


def test_router_keyboard_typing_with_modifier_latch():
    keys = build_layout()
    shift = next(k for k in keys if k.label == "Shift")
    a = next(k for k in keys if k.label == "A")
    r = OsInputRouter((100, 100))

    def press(key, now):
        # trigger rising edge on a hovered key
        r.update({"right": HandInput(kb_key=key, kb_dist=0.4, trigger=1.0)},
                 now=now)
        return r.update({"right": HandInput(kb_key=key, kb_dist=0.4,
                                            trigger=0.0)}, now=now + 0.05)

    ev = press(shift, 0.0)
    assert not [e for e in ev if e["t"] == "tap"]  # modifiers latch silently
    ev = r.update({"right": HandInput(kb_key=a, kb_dist=0.4, trigger=1.0)},
                  now=0.2)
    # the A tap carries the latched Shift, and the latch is consumed
    taps = [e for e in ev if e["t"] == "tap"]
    assert taps == [{"t": "tap", "vk": VK["A"], "mods": [VK["Shift"]]}]
    assert r.kb.shift is False


def test_router_keyboard_tap_event_content():
    keys = build_layout()
    a = next(k for k in keys if k.label == "A")
    r = OsInputRouter((100, 100))
    ev = r.update({"right": HandInput(kb_key=a, kb_dist=0.4, trigger=1.0)},
                  now=0.0)
    taps = [e for e in ev if e["t"] == "tap"]
    assert taps == [{"t": "tap", "vk": VK["A"], "mods": []}]


def test_router_keyboard_owns_cursor_over_screen():
    """Keyboard closer than screen-minus-bias → no mouse events while
    typing (reference constants.py:9-17 ownership)."""
    keys = build_layout()
    a = next(k for k in keys if k.label == "A")
    r = OsInputRouter((100, 100))
    hand = HandInput(screen_uv=(0.5, 0.5), plane_uv=(0.5, 0.5),
                     screen_dist=3.0, kb_key=a, kb_dist=0.5, trigger=1.0)
    ev = r.update({"right": hand}, now=0.0)
    assert r.state.owner == "keyboard"
    assert not [e for e in ev if e["t"] in ("move", "button")]
    assert [e for e in ev if e["t"] == "tap"]


def test_router_scroll_and_arrow_accumulators():
    r = OsInputRouter((100, 100))
    total = 0
    for i in range(40):
        ev = r.update({}, scroll_xy=(0.0, 1.0), dt=1 / 30.0,
                      now=i / 30.0)
        for e in ev:
            if e["t"] == "scroll":
                total += e["dy"]
    assert total >= 10  # ~18 ticks/s at full deflection
    ev = r.update({}, arrow_xy=(1.0, 0.0), now=10.0)
    assert {"t": "tap", "vk": VK["Right"], "mods": []} in ev


def test_router_pinch_emits_touch_contacts():
    """Two-trigger pinch travels as REAL touch contacts (r05): down on
    engage, move while held, up on release — the reference's touch
    semantics (reference input.py:121-390), host decides injection."""
    r = OsInputRouter((1000, 1000))
    evs = r.update({"left": hand_at(0.4, 0.5, trigger=1.0),
                    "right": hand_at(0.6, 0.5, trigger=1.0)}, now=0.0)
    downs = [e for e in evs if e["t"] == "touch" and e["phase"] == "down"]
    assert len(downs) == 2 and {d["id"] for d in downs} == {0, 1}
    # contacts carry frame-normalized uv of both hands
    assert abs(downs[0]["u"] - 0.4) < 0.02 and abs(downs[1]["u"] - 0.6) < 0.02

    evs = []
    for i, span in enumerate((0.15, 0.22, 0.3)):
        evs += r.update({"left": hand_at(0.5 - span, 0.5, trigger=1.0),
                         "right": hand_at(0.5 + span, 0.5, trigger=1.0)},
                        now=0.1 + i * 0.1)
    moves = [e for e in evs if e["t"] == "touch" and e["phase"] == "move"]
    assert len(moves) >= 4                 # both contacts tracked the spread
    assert not [e for e in evs if e["t"] == "scroll"]   # no wheel synthesis
    assert not [e for e in evs if e["t"] == "button"]   # pinch != click/drag

    # trigger release lifts both contacts
    evs = r.update({"left": hand_at(0.35, 0.5, trigger=0.0),
                    "right": hand_at(0.8, 0.5, trigger=0.0)}, now=1.0)
    ups = [e for e in evs if e["t"] == "touch" and e["phase"] == "up"]
    assert {u["id"] for u in ups} == {0, 1}


def test_bridge_touch_to_uinput_injector():
    """With a touch-capable host the contacts land as multitouch frames."""
    from desktop2stereo_tpu.xr.injector import RecordingTouchInjector

    inj = RecordingInjector(screen_size=(2000, 1000))
    touch = RecordingTouchInjector(screen_size=(2000, 1000))
    b = InputBridge(inj, touch_injector=touch)
    b.handle([{"t": "touch", "id": 0, "u": 0.25, "v": 0.5, "phase": "down"},
              {"t": "touch", "id": 1, "u": 0.75, "v": 0.5, "phase": "down"}])
    b.handle([{"t": "touch", "id": 0, "u": 0.20, "v": 0.5, "phase": "move"},
              {"t": "touch", "id": 1, "u": 0.80, "v": 0.5, "phase": "move"}])
    b.handle([{"t": "touch", "id": 0, "phase": "up"},
              {"t": "touch", "id": 1, "phase": "up"}])
    ev = touch.events
    assert ("touch", 0, round(0.25 * 1999), round(0.5 * 999), True) in ev
    assert ("touch", 1, round(0.75 * 1999), round(0.5 * 999), True) in ev
    assert ev.count(("frame",)) == 3       # one SYN_REPORT per wire batch
    ups = [e for e in ev if e[0] == "touch" and e[4] is False]
    assert len(ups) == 2
    assert not inj.events                  # nothing leaked to the mouse path


def test_bridge_touch_fallback_synthesizes_ctrl_wheel_zoom():
    """Without uinput the SAME touch stream degrades to ctrl+wheel zoom
    (the r04 behavior, now synthesized host-side where capability lives)."""
    inj = RecordingInjector(screen_size=(1000, 1000))
    b = InputBridge(inj)                   # no touch injector
    b.handle([{"t": "touch", "id": 0, "u": 0.40, "v": 0.5, "phase": "down"},
              {"t": "touch", "id": 1, "u": 0.60, "v": 0.5, "phase": "down"}])
    for span in (0.15, 0.22, 0.30):
        b.handle([{"t": "touch", "id": 0, "u": 0.5 - span, "v": 0.5,
                   "phase": "move"},
                  {"t": "touch", "id": 1, "u": 0.5 + span, "v": 0.5,
                   "phase": "move"}])
    b.handle([{"t": "touch", "id": 0, "phase": "up"},
              {"t": "touch", "id": 1, "phase": "up"}])
    ev = inj.events
    ups = ev.count(("button", 4, True))    # wheel-up = zoom in (spread)
    assert ups >= 2
    ki = ev.index(("key", 0x11, True))     # Ctrl wraps the ticks
    assert ("key", 0x11, False) in ev[ki:]
    # pinching IN zooms out (wheel-down)
    b2 = InputBridge(RecordingInjector(screen_size=(1000, 1000)))
    b2.handle([{"t": "touch", "id": 0, "u": 0.2, "v": 0.5, "phase": "down"},
               {"t": "touch", "id": 1, "u": 0.8, "v": 0.5, "phase": "down"}])
    for span in (0.2, 0.1, 0.05):
        b2.handle([{"t": "touch", "id": 0, "u": 0.5 - span, "v": 0.5,
                    "phase": "move"},
                   {"t": "touch", "id": 1, "u": 0.5 + span, "v": 0.5,
                    "phase": "move"}])
    assert b2.injector.events.count(("button", 5, True)) >= 2


def test_make_touch_injector_degrades_without_uinput():
    from desktop2stereo_tpu.xr.injector import make_touch_injector

    # no /dev/uinput in CI: graceful None, never an exception
    tj = make_touch_injector((1920, 1080))
    assert tj is None or hasattr(tj, "touch")


# ---- bridge ----------------------------------------------------------------


def test_bridge_scales_moves_and_replays_keys():
    inj = RecordingInjector(screen_size=(3840, 2160))
    b = InputBridge(inj)
    b.handle([
        {"t": "move", "u": 0.5, "v": 0.25},
        {"t": "button", "b": 1, "down": True},
        {"t": "button", "b": 1, "down": False},
        {"t": "scroll", "dy": 2, "dx": -1},
        {"t": "tap", "vk": VK["A"], "mods": [VK["Shift"]]},
    ])
    ev = inj.events
    assert ev[0] == ("move", round(0.5 * 3839), round(0.25 * 2159))
    assert ("button", 1, True) in ev and ("button", 1, False) in ev
    # 2 up-ticks (button 4) and 1 left-tick (button 6), press+release each
    assert ev.count(("button", 4, True)) == 2
    assert ev.count(("button", 6, False)) == 1
    # shift-wrapped key tap
    ki = ev.index(("key", VK["Shift"], True))
    assert ev[ki + 1] == ("key", VK["A"], True)
    assert ev[ki + 2] == ("key", VK["A"], False)
    assert ev[ki + 3] == ("key", VK["Shift"], False)


def test_vk_keysym_covers_whole_layout():
    for key in build_layout():
        assert vk_to_keysym(key.vk) is not None, key.label


def test_make_injector_degrades_headless():
    # no X display in CI: graceful None, never an exception
    assert make_injector() is None or hasattr(make_injector(), "move")


# ---- net loopback -----------------------------------------------------------


def test_input_channel_over_tcp():
    from desktop2stereo_tpu.xr.frame_server import FrameServer
    from desktop2stereo_tpu.xr.net import FrameNetClient, FrameNetServer

    inj = RecordingInjector()
    bridge = InputBridge(inj, screen_size=(1000, 1000))
    srv = FrameNetServer(FrameServer(), host="127.0.0.1", port=0,
                         on_input=bridge.handle).start()
    try:
        c = FrameNetClient(host="127.0.0.1", port=srv.port)
        ok = c.send_input([{"t": "move", "u": 0.5, "v": 0.5},
                           {"t": "button", "b": 1, "down": True}])
        assert ok
        assert ("move", 500, 500) in inj.events
        assert ("button", 1, True) in inj.events
        c.close()
    finally:
        srv.close()


def test_input_channel_acks_false_without_handler():
    from desktop2stereo_tpu.xr.frame_server import FrameServer
    from desktop2stereo_tpu.xr.net import FrameNetClient, FrameNetServer

    srv = FrameNetServer(FrameServer(), host="127.0.0.1", port=0).start()
    try:
        c = FrameNetClient(host="127.0.0.1", port=srv.port)
        assert c.send_input([{"t": "move", "u": 0, "v": 0}]) is False
        c.close()
    finally:
        srv.close()


# ---- the loopback e2e bar -----------------------------------------------------


def test_e2e_scripted_laser_moves_and_clicks_recording_injector():
    """Client OpenXRPresenter (real chord router + input router) → real TCP
    input channel → server InputBridge → RecordingInjector.  The scripted
    sequence points the laser at two screen spots and pulls the trigger;
    the 'desktop' sees the cursor move and a click."""
    from desktop2stereo_tpu.tools import xr_client as XC
    from desktop2stereo_tpu.xr.controls import ControllerState
    from desktop2stereo_tpu.xr.frame_server import FrameServer
    from desktop2stereo_tpu.xr.net import FrameNetClient, FrameNetServer
    from tests.test_xr_client import _FakeXrRuntime

    inj = RecordingInjector()
    bridge = InputBridge(inj, screen_size=(1920, 1080))
    srv = FrameNetServer(FrameServer(), host="127.0.0.1", port=0,
                         on_input=bridge.handle).start()
    client = FrameNetClient(host="127.0.0.1", port=srv.port)
    try:
        rt = _FakeXrRuntime(probe_misses=0)
        # scripted controller: aim center, idle → aim center, trigger →
        # aim right-of-center, trigger held (drag) → release
        script = [
            ((0.0, 1.4, 0.0), (0.0, 0.0, -1.0), 0.0),
            ((0.0, 1.4, 0.0), (0.0, 0.0, -1.0), 1.0),
            ((0.0, 1.4, 0.0), (0.3, 0.0, -1.0), 1.0),
            ((0.0, 1.4, 0.0), (0.3, 0.0, -1.0), 0.0),
        ]
        step = {"i": 0}

        def sample():
            i = min(step["i"], len(script) - 1)
            origin, direction, trig = script[i]
            rt.last_aim = {"r": (np.array(origin), np.array(direction))}
            step["i"] += 1
            return ControllerState(trigger_r=trig)

        rt.sample_controllers = sample
        p = XC.OpenXRPresenter(0.064, 2.0, 0.01, runtime=rt,
                               input_sink=client.send_input)
        rgb = np.zeros((1080, 1920, 3), np.uint8)
        for _ in range(len(script)):
            assert p.push_packet(rgb, None)
        p.close()
    finally:
        client.close()
        srv.close()

    kinds = [e[0] for e in inj.events]
    assert "move" in kinds, inj.events
    assert ("button", 1, True) in inj.events   # trigger → click down
    assert ("button", 1, False) in inj.events  # release
    # the straight-ahead center aim maps near the frame center
    first_move = next(e for e in inj.events if e[0] == "move")
    assert abs(first_move[1] - 1920 // 2) < 60
    assert abs(first_move[2] - 1080 // 2) < 40
    # the drag moved the cursor right
    moves = [e for e in inj.events if e[0] == "move"]
    assert moves[-1][1] > first_move[1] + 100


def test_xr_sink_advertises_input_state():
    from desktop2stereo_tpu.sinks.xr import XrSink

    inj = RecordingInjector()
    sink = XrSink(port=0, inject_input=True, injector=inj)
    try:
        assert "input: XTest" in sink.url or "input:" in sink.url
        assert sink.bridge is not None
    finally:
        sink.close()

    sink2 = XrSink(port=0, inject_input=False)
    try:
        assert sink2.bridge is None and "none" in sink2.url
    finally:
        sink2.close()
