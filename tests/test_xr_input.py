"""XR laser hit-testing, keyboard layout, and input mapping tests."""

import math

import numpy as np
import pytest

from desktop2stereo_tpu.xr.geometry import CURVED_HALF_ANGLE_RAD, ScreenPose
from desktop2stereo_tpu.xr.input_map import (
    ArrowRepeater,
    ClickDragTracker,
    CursorMapper,
    OwnershipArbiter,
    PinchTracker,
    ScrollAccumulator,
)
from desktop2stereo_tpu.xr.keyboard import (
    UNITS_WIDE,
    KeyboardState,
    _ROW_SPECS,
    build_layout,
    hit_key,
)
from desktop2stereo_tpu.xr.laser import (
    HandCalibration,
    PlaneSpec,
    RayHit,
    ray_panel_hit,
    ray_plane_uv,
    ray_screen_hit,
)


# ---------------------------------------------------------------- laser ----

def test_flat_hit_center_and_corners():
    pose = ScreenPose(width=4.0, height=2.25, distance=3.0)
    origin = np.zeros(3)
    hit = ray_screen_hit(origin, np.array([0.0, 0.0, -1.0]), pose)
    assert hit is not None
    assert hit.u == pytest.approx(0.5) and hit.v == pytest.approx(0.5)
    assert hit.t == pytest.approx(3.0)

    # aim at the top-right corner
    d = np.array([2.0, 1.125, -3.0])
    d /= np.linalg.norm(d)
    hit = ray_screen_hit(origin, d, pose)
    assert hit is not None
    assert hit.u == pytest.approx(1.0, abs=1e-6)
    assert hit.v == pytest.approx(1.0, abs=1e-6)

    # just past the corner: miss, but the unbounded plane still reports UV
    d = np.array([2.2, 1.2, -3.0]); d /= np.linalg.norm(d)
    assert ray_screen_hit(origin, d, pose) is None
    u, v, _t = ray_plane_uv(origin, d, pose)
    assert u > 1.0 and v > 1.0


def test_flat_hit_respects_yaw_and_pan():
    pose = ScreenPose(width=2.0, height=2.0, distance=2.0, pan_x=1.0,
                      yaw=0.3)
    # shoot at the screen center: it sits at (pan_x, 0, -distance)
    center = np.array([1.0, 0.0, -2.0])
    d = center / np.linalg.norm(center)
    hit = ray_screen_hit(np.zeros(3), d, pose)
    assert hit is not None
    assert hit.u == pytest.approx(0.5, abs=1e-6)
    assert hit.v == pytest.approx(0.5, abs=1e-6)


@pytest.mark.parametrize("axis", ["horizontal", "vertical"])
def test_curved_hit_matches_mesh(axis):
    """Ray through each curved-mesh vertex must return that vertex's UV."""
    pose = ScreenPose(width=3.0, height=1.8, distance=2.5)
    mesh = pose.curved_mesh(segments=16, axis=axis)
    origin = np.zeros(3)
    for row in mesh[::5]:
        p, (u_want, v_want) = row[:3], row[3:]
        d = p / np.linalg.norm(p)
        hit = ray_screen_hit(origin, d, pose, curved=True, curve_axis=axis)
        assert hit is not None, (p, u_want, v_want)
        assert hit.u == pytest.approx(float(u_want), abs=2e-4)
        assert hit.v == pytest.approx(float(v_want), abs=2e-4)


def test_curved_miss_beyond_arc():
    pose = ScreenPose(width=3.0, height=1.8, distance=2.5)
    # a ray pointing far sideways must not hit the bounded arc
    d = np.array([0.95, 0.0, -0.3])
    d /= np.linalg.norm(d)
    assert ray_screen_hit(np.zeros(3), d, pose, curved=True) is None


def test_panel_hit_tilted():
    panel = PlaneSpec(pan_y=-0.35, distance=0.55, pitch=-0.45)
    _x, _y, normal, pos = panel.basis()
    # shoot straight at the panel origin along -normal direction offsets
    origin = pos + normal * 0.5
    hit = ray_panel_hit(origin, -normal, panel)
    assert hit is not None
    lx, ly, t = hit
    assert lx == pytest.approx(0.0, abs=1e-9)
    assert ly == pytest.approx(0.0, abs=1e-9)
    assert t == pytest.approx(0.5)


def test_hand_calibration_rotates_ray():
    cal = HandCalibration().nudge(0.1, 0.0)
    d = cal.apply(np.array([0.0, 0.0, -1.0]))
    assert d[0] != 0.0
    assert np.linalg.norm(d) == pytest.approx(1.0)
    # limit clamps
    cal = HandCalibration().nudge(10.0, -10.0)
    assert cal.yaw_offset == pytest.approx(0.35)
    assert cal.pitch_offset == pytest.approx(-0.35)


# ------------------------------------------------------------- keyboard ----

def test_layout_rows_sum_to_grid():
    for row in _ROW_SPECS:
        assert sum(w for _l, w in row) == pytest.approx(UNITS_WIDE)


def test_layout_no_overlap_and_hits():
    keys = build_layout()
    # every key's local rect maps back to itself through hit_key
    for i, k in enumerate(keys):
        x0, y0, x1, y1 = k.rect_local
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        assert hit_key(keys, cx, cy) == i
    # a point in the row-3 dead gap hits nothing
    gap_u = 16.5 / UNITS_WIDE
    lx = (gap_u - 0.5) * 2 * 0.30
    ly = (0.5 - 3.5 / 6.0) * 2 * 0.10
    assert hit_key(keys, lx, ly) is None


def test_keyboard_state_shift_latch():
    keys = {k.label: k for k in build_layout()}
    st = KeyboardState()
    assert st.press(keys["Shift"]) is None
    assert st.shift
    vk, mods = st.press(keys["A"])
    assert vk == ord("A") and 0x10 in mods
    assert not st.shift  # latch released
    vk, mods = st.press(keys["A"])
    assert mods == ()


def test_keyboard_caps_and_labels():
    keys = {k.label: k for k in build_layout()}
    st = KeyboardState()
    st.press(keys["Caps"])
    assert st.caps
    assert st.label_for(keys["A"]) == "A"
    st.shift = True
    assert st.label_for(keys["1"]) == "!"


# ------------------------------------------------------------ input map ----

def test_cursor_mapper_on_screen_and_edge_snap():
    m = CursorMapper(1920, 1080)
    s = m.update((0.5, 0.5), (0.5, 0.5))
    assert s.on_screen
    assert s.x == pytest.approx(1919 / 2) and s.y == pytest.approx(1079 / 2)
    # ray leaves the screen to the right: cursor pulls toward the edge
    s2 = m.update(None, (1.2, 0.5))
    assert not s2.on_screen
    assert s2.x > s.x
    assert s2.x <= 1919
    # repeated off-screen updates converge to the edge
    for _ in range(50):
        s3 = m.update(None, (1.2, 0.5))
    assert s3.x == pytest.approx(1919, abs=1.0)


def test_ownership_arbiter_bias_and_grace():
    arb = OwnershipArbiter(bias=0.06, grace_s=0.12)
    t = 100.0
    # keyboard holds even when the screen is a touch closer
    assert arb.decide(0.50, 0.47, now=t) == "keyboard"
    # decisively closer screen steals
    assert arb.decide(0.50, 0.40, now=t + 0.01) == "screen"
    # keyboard gone entirely → grace window suppresses the screen...
    arb2 = OwnershipArbiter(bias=0.06, grace_s=0.12)
    assert arb2.decide(0.5, None, now=t) == "keyboard"
    assert arb2.decide(None, 0.6, now=t + 0.05) is None
    # ...then the screen takes over
    assert arb2.decide(None, 0.6, now=t + 0.30) == "screen"


def test_click_drag_tracker():
    tr = ClickDragTracker()
    t = 10.0
    ev = tr.update(True, 100, 100, now=t)
    assert [e.kind for e in ev] == ["press"]
    ev = tr.update(True, 102, 100, now=t + 0.02)
    assert ev == []  # below drag threshold
    ev = tr.update(True, 110, 100, now=t + 0.05)
    assert [e.kind for e in ev] == ["drag_start", "drag"]
    ev = tr.update(False, 110, 100, now=t + 0.1)
    assert [e.kind for e in ev] == ["release"]
    # a completed DRAG does not arm double-click: quick press after the drag
    # is a plain press (a drag + a click is not a double-click gesture)
    ev = tr.update(True, 110, 100, now=t + 0.2)
    assert [e.kind for e in ev] == ["press"]


def test_click_click_is_double_but_only_nearby():
    tr = ClickDragTracker()
    t = 20.0
    # click 1 (press+release, no drag)
    tr.update(True, 50, 50, now=t)
    tr.update(False, 50, 50, now=t + 0.05)
    # quick nearby press → double
    ev = tr.update(True, 51, 50, now=t + 0.2)
    assert [e.kind for e in ev] == ["double", "press"]
    tr.update(False, 51, 50, now=t + 0.25)
    # a third quick press must NOT chain another double off the double
    ev = tr.update(True, 51, 50, now=t + 0.3)
    assert [e.kind for e in ev] == ["press"]

    # far-away second click is not a double even when fast
    tr2 = ClickDragTracker()
    tr2.update(True, 50, 50, now=t)
    tr2.update(False, 50, 50, now=t + 0.05)
    ev = tr2.update(True, 400, 300, now=t + 0.2)
    assert [e.kind for e in ev] == ["press"]


def test_scroll_accumulator_rates():
    acc = ScrollAccumulator(deadzone=0.15, ticks_per_s=18.0)
    assert acc.update(0.1, 0.5) == 0  # deadzone
    total = sum(acc.update(1.0, 0.1) for _ in range(10))
    assert total == 18  # full deflection for 1 s
    down = sum(acc.update(-1.0, 0.1) for _ in range(10))
    assert down == -18


def test_arrow_repeater_delay_then_repeat():
    rep = ArrowRepeater(initial_delay=0.35, repeat_s=0.09)
    t = 5.0
    assert rep.update(1.0, 0.0, now=t) == ["Right"]
    assert rep.update(1.0, 0.0, now=t + 0.1) == []      # waiting
    assert rep.update(1.0, 0.0, now=t + 0.4) == ["Right"]  # repeat starts
    assert rep.update(0.0, 0.0, now=t + 0.5) == []
    assert rep.update(0.0, 1.0, now=t + 0.6) == ["Up"]  # new direction


def test_pinch_tracker_scale_translate():
    p = PinchTracker()
    s0 = p.update((0, 0), (100, 0))
    assert s0.scale == pytest.approx(1.0)
    s1 = p.update((-50, 0), (150, 0))
    assert s1.scale == pytest.approx(2.0)
    assert s1.translate == (0.0, 0.0)
    s2 = p.update((0, 50), (100, 50))
    assert s2.translate[1] == pytest.approx(50.0)
    assert p.update(None, (0, 0)) is None
