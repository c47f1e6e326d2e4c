"""Controller chord policy (xr/controls.py) vs the reference's combination
table (reference readme.md:193-244, xr_viewer/input_handler.py:960-1330)."""

import numpy as np
import pytest

from desktop2stereo_tpu.xr.controls import (
    Action,
    ChordRouter,
    ControllerState,
)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def make():
    clk = Clock()
    return ChordRouter(clock=clk), clk


def kinds(actions):
    return [a.kind for a in actions]


def tick(router, clk, dt=0.05, **fields):
    clk.t += dt
    return router.update(ControllerState(**fields))


def test_grip_gated_stick_routing():
    """No grip → mouse layer; right grip → width/distance + depth knobs;
    left grip → translate + yaw/pitch (readme.md:197-232)."""
    r, clk = make()
    acts = tick(r, clk, stick_r=(0.8, -0.6), stick_l=(0.7, 0.9))
    assert set(kinds(acts)) == {"mouse_scroll_x", "mouse_scroll_y",
                                "arrow_x", "arrow_y"}
    acts = tick(r, clk, grip_r=True, stick_r=(0.8, -0.6), stick_l=(0.7, 0.9))
    assert set(kinds(acts)) == {"screen_width", "screen_distance",
                                "depth_scale", "effect_transparency"}
    w = next(a for a in acts if a.kind == "screen_width")
    assert w.value == pytest.approx(0.8)
    acts = tick(r, clk, grip_l=True, stick_l=(0.5, 0.0), stick_r=(0.0, -0.8))
    assert set(kinds(acts)) == {"screen_translate_x", "screen_pitch"}


def test_deadzone_suppresses_axis_actions():
    r, clk = make()
    assert tick(r, clk, stick_r=(0.1, -0.14), stick_l=(0.05, 0.0)) == []


def test_stick_button_short_vs_long():
    """Left stick button: short = cycle background, hold 1 s = help panel
    (input_handler.py:966-970); fires once at threshold."""
    r, clk = make()
    tick(r, clk, stick_btn_l=True)
    acts = tick(r, clk, dt=0.2)  # release at 0.2 s
    assert kinds(acts) == ["cycle_background"]
    tick(r, clk, stick_btn_l=True)
    acts = tick(r, clk, dt=1.1, stick_btn_l=True)  # cross 1 s while held
    assert kinds(acts) == ["toggle_help_panel"]
    assert tick(r, clk, dt=0.5, stick_btn_l=True) == []  # no refire
    assert tick(r, clk) == []  # release after long: no short replay


def test_right_stick_button_grip_context():
    """No grip: short = flat/curved, long = reset orientation; right grip:
    short = reset depth scale (readme.md:201-202,227)."""
    r, clk = make()
    tick(r, clk, stick_btn_r=True)
    assert kinds(tick(r, clk)) == ["toggle_screen_curve"]
    tick(r, clk, stick_btn_r=True)
    acts = tick(r, clk, dt=1.1, stick_btn_r=True)
    assert kinds(acts) == ["reset_screen_orientation"]
    tick(r, clk)  # release
    tick(r, clk, grip_r=True, stick_btn_r=True)
    assert kinds(tick(r, clk, grip_r=True)) == ["reset_depth_scale"]


def test_depth_zero_toggle_needs_right_grip():
    r, clk = make()
    tick(r, clk, grip_r=True, stick_btn_l=True)
    assert kinds(tick(r, clk, grip_r=True)) == ["toggle_depth_zero"]


def test_both_stick_buttons_chord_no_replay():
    """Both sticks pressed 0.5 s → help panel, and the combo release must
    not replay as single short presses."""
    r, clk = make()
    tick(r, clk, stick_btn_l=True, stick_btn_r=True)
    acts = tick(r, clk, dt=0.6, stick_btn_l=True, stick_btn_r=True)
    assert kinds(acts) == ["toggle_help_panel"]
    assert tick(r, clk) == []  # release: no cycle_background/curve leak


def test_x_button_three_tiers():
    """X: tap <1 s → keyboard; ≥1 s release → glow; ≥4 s → passthrough at
    threshold (readme.md:209-211)."""
    r, clk = make()
    tick(r, clk, btn_x=True)
    assert kinds(tick(r, clk, dt=0.3)) == ["toggle_keyboard"]
    tick(r, clk, btn_x=True)
    tick(r, clk, dt=1.5, btn_x=True)
    assert kinds(tick(r, clk)) == ["toggle_glow_mode"]
    tick(r, clk, btn_x=True)
    acts = tick(r, clk, dt=4.2, btn_x=True)
    assert kinds(acts) == ["toggle_passthrough"]
    assert tick(r, clk) == []  # release after top tier: nothing more


def test_y_and_menu_buttons():
    r, clk = make()
    tick(r, clk, btn_y=True)
    assert kinds(tick(r, clk)) == ["reset_screen_pose"]
    tick(r, clk, btn_y=True)
    assert kinds(tick(r, clk, dt=1.1, btn_y=True)) == ["cycle_screen_preset"]
    tick(r, clk)
    tick(r, clk, btn_menu=True)
    assert kinds(tick(r, clk)) == ["toggle_fps_overlay"]
    tick(r, clk, btn_menu=True)
    assert kinds(tick(r, clk, dt=1.1, btn_menu=True)) == ["reset_depth_ratio"]


def test_depth_ratio_fine_tune_ab_hold():
    r, clk = make()
    acts = tick(r, clk, grip_r=True, btn_a=True)
    assert kinds(acts) == ["depth_ratio_fine"]
    assert acts[0].value == 1.0
    acts = tick(r, clk, grip_r=True, btn_b=True)
    assert ("depth_ratio_fine", -1.0) in [(a.kind, a.value) for a in acts]


def test_calibration_combo_and_mode():
    """Menu+A+B held 1 s toggles calibration; in calibration sticks adjust
    offsets only and B saves (input_handler.py:1003-1035)."""
    r, clk = make()
    combo = dict(btn_menu=True, btn_a=True, btn_b=True)
    tick(r, clk, **combo)
    acts = tick(r, clk, dt=1.1, **combo)
    assert kinds(acts) == ["calibration_mode"]
    assert r.calibration_mode
    tick(r, clk)  # release all
    acts = tick(r, clk, stick_l=(0.0, 0.8), stick_r=(0.5, 0.0), grip_r=True)
    assert set(kinds(acts)) == {"calib_offset_y", "calib_rot"}
    acts = tick(r, clk, btn_b=True)  # rising edge saves + exits
    assert kinds(acts) == ["calibration_save"]
    assert not r.calibration_mode


def test_brand_switch_combo():
    r, clk = make()
    tick(r, clk, btn_a=True, btn_b=True)
    acts = tick(r, clk, dt=0.6, btn_a=True, btn_b=True)
    assert kinds(acts) == ["cycle_controller_brand"]
    assert tick(r, clk, dt=0.5, btn_a=True, btn_b=True) == []  # no refire


def test_a_double_press_toggles_overlays():
    r, clk = make()
    tick(r, clk, btn_a=True)
    tick(r, clk, dt=0.05)           # release 1
    tick(r, clk, dt=0.1, btn_a=True)
    acts = tick(r, clk, dt=0.05)    # release 2 within 0.5 s
    assert "toggle_all_overlays" in kinds(acts)


def test_crop_trigger_hold_cycles_and_double_tap():
    """Left trigger off screen: hold 3 s cycles auto→manual→off; in manual
    a double-tap toggles crop-adjust; tap after a fired hold is ignored
    (input_handler.py:1070-1118)."""
    r, clk = make()
    tick(r, clk, trigger_l=0.9)
    acts = tick(r, clk, dt=3.1, trigger_l=0.9)
    assert kinds(acts) == ["crop_mode"]
    assert r.crop_mode == "manual"
    acts = tick(r, clk)  # release after fired hold → NOT a tap
    assert acts == []
    # double-tap in manual mode
    tick(r, clk, trigger_l=0.9)
    tick(r, clk, dt=0.05)           # tap 1
    tick(r, clk, dt=0.1, trigger_l=0.9)
    acts = tick(r, clk, dt=0.05)    # tap 2
    assert kinds(acts) == ["crop_adjust_pause"]
    assert r.crop_adjust_active


def test_crop_gesture_requires_laser_off_screen():
    r, clk = make()
    tick(r, clk, trigger_l=0.9, laser_l_on_screen=True)
    acts = tick(r, clk, dt=3.5, trigger_l=0.9, laser_l_on_screen=True)
    assert acts == []  # on-screen trigger belongs to the click layer
    assert r.crop_mode == "auto"


def test_crop_adjust_stick_dominant_axis():
    r, clk = make()
    r.crop_mode = "manual"
    r.crop_adjust_active = True
    acts = tick(r, clk, stick_l=(0.9, 0.3))
    assert kinds(acts) == ["crop_width"]
    acts = tick(r, clk, stick_l=(0.2, -0.8))
    assert kinds(acts) == ["crop_height"]
    # with a grip held the stick reverts to its chord meaning
    acts = tick(r, clk, grip_l=True, stick_l=(0.9, 0.0))
    assert "crop_width" not in kinds(acts)


def test_drag_screen_conditions():
    """Grip + laser-on-screen + idle stick → drag; stick use or both grips
    suspend it (input_handler.py:1120-1175)."""
    r, clk = make()
    acts = tick(r, clk, grip_l=True, laser_l_on_screen=True)
    assert ("drag_screen", "left") in [(a.kind, a.hand) for a in acts]
    acts = tick(r, clk, grip_l=True, laser_l_on_screen=True,
                stick_l=(0.9, 0.0))
    assert "drag_screen" not in kinds(acts)
    acts = tick(r, clk, grip_l=True, grip_r=True, laser_l_on_screen=True,
                laser_r_on_screen=True)
    assert "drag_screen" not in kinds(acts)
    acts = tick(r, clk, grip_r=True, laser_r_on_screen=False)
    assert "drag_screen" not in kinds(acts)


def test_grip_target_latch_keyboard_priority():
    """Grip latches onto ONE target at close — keyboard beats screen — and
    keeps it until release (input_handler.py:1146-1160)."""
    r, clk = make()
    acts = tick(r, clk, grip_l=True, laser_l_on_screen=True,
                keyboard_hover_l=True)
    assert kinds(acts) == ["drag_keyboard"]
    # hover lost mid-drag: the latch holds (no retarget to the screen)
    acts = tick(r, clk, grip_l=True, laser_l_on_screen=True)
    assert kinds(acts) == ["drag_keyboard"]
    # release clears; regrip with laser only → screen
    tick(r, clk)
    acts = tick(r, clk, grip_l=True, laser_l_on_screen=True)
    assert kinds(acts) == ["drag_screen"]


def test_grip_screen_anchor_survives_laser_dropout():
    """Laser transiently off the screen pauses the drag but keeps the
    latch, so the grab resumes when it re-enters (input_handler.py:1173-1175)."""
    r, clk = make()
    tick(r, clk, grip_r=True, laser_r_on_screen=True)
    acts = tick(r, clk, grip_r=True, laser_r_on_screen=False)
    assert "drag_screen" not in kinds(acts)
    acts = tick(r, clk, grip_r=True, laser_r_on_screen=True)
    assert ("drag_screen", "right") in [(a.kind, a.hand) for a in acts]


def test_seat_adjust_both_grips_hold():
    r, clk = make()
    tick(r, clk, grip_l=True, grip_r=True)
    acts = tick(r, clk, dt=3.1, grip_l=True, grip_r=True)
    assert "seat_adjust" in kinds(acts)
    assert r.seat_adjust_active
