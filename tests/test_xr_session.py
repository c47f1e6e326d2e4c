"""XR session state machine tests (fake runtime, no headset)."""

from typing import List, Optional, Sequence, Tuple

import pytest

from desktop2stereo_tpu.xr.session import (
    BINDING_TABLES,
    GL_RGBA8,
    GL_SRGB8_ALPHA8,
    FrameTimer,
    ReferenceSpace,
    SessionManager,
    SessionPhase,
    SwapchainSpec,
    SystemInfo,
    choose_color_format,
    choose_reference_space,
    plan_swapchains,
    trackpad_button_zone,
)


class FakeRuntime:
    def __init__(self, appear_after: int = 0,
                 spaces=(ReferenceSpace.STAGE, ReferenceSpace.LOCAL),
                 formats=(GL_RGBA8, GL_SRGB8_ALPHA8),
                 reject_profiles: Sequence[str] = ()):
        self.appear_after = appear_after
        self.probes = 0
        self.spaces = tuple(spaces)
        self.formats = tuple(formats)
        self.reject = set(reject_profiles)
        self.session_created: Optional[Tuple] = None
        self.destroyed = 0
        self.suggested: List[str] = []

    def probe_system(self) -> Optional[SystemInfo]:
        self.probes += 1
        if self.probes <= self.appear_after:
            return None
        return SystemInfo(
            recommended_size=(2064, 2208),
            color_formats=self.formats,
            reference_spaces=self.spaces,
        )

    def create_session(self, space, swapchains):
        self.session_created = (space, tuple(swapchains))

    def destroy_session(self):
        self.destroyed += 1

    def suggest_bindings(self, profile, bindings) -> bool:
        self.suggested.append(profile)
        return profile not in self.reject


def test_space_and_format_choices():
    assert choose_reference_space(
        [ReferenceSpace.LOCAL, ReferenceSpace.STAGE]) is ReferenceSpace.STAGE
    assert choose_reference_space([ReferenceSpace.LOCAL]) is ReferenceSpace.LOCAL
    assert choose_color_format([GL_RGBA8, GL_SRGB8_ALPHA8]) == GL_SRGB8_ALPHA8
    assert choose_color_format([GL_RGBA8]) == GL_RGBA8
    assert choose_color_format([0x1234]) == 0x1234  # runtime's own choice


def test_hot_wait_retry_until_headset():
    rt = FakeRuntime(appear_after=3)
    mgr = SessionManager(rt, retry_delay=0.1, poll_step=0.1)
    slept = []
    info = mgr.wait_for_device(lambda: False, sleep=slept.append)
    assert info is not None and rt.probes == 4
    assert slept  # actually waited between probes


def test_hot_wait_interrupted_by_shutdown():
    rt = FakeRuntime(appear_after=100)
    mgr = SessionManager(rt, retry_delay=0.1, poll_step=0.1)
    calls = {"n": 0}

    def should_stop():
        calls["n"] += 1
        return calls["n"] > 5

    assert mgr.wait_for_device(should_stop, sleep=lambda _s: None) is None


def test_bring_up_plans_srgb_swapchains_and_bindings():
    rt = FakeRuntime(reject_profiles=["/interaction_profiles/htc/vive_controller"])
    mgr = SessionManager(rt)
    mgr.wait_for_device(lambda: False, sleep=lambda _s: None)
    mgr.bring_up()
    space, chains = rt.session_created
    assert space is ReferenceSpace.STAGE
    assert len(chains) == 2
    assert chains[0] == SwapchainSpec(2064, 2208, GL_SRGB8_ALPHA8)
    assert set(rt.suggested) == set(BINDING_TABLES)
    assert "/interaction_profiles/htc/vive_controller" not in mgr.bound_profiles
    assert "/interaction_profiles/oculus/touch_controller" in mgr.bound_profiles
    assert mgr.phase is SessionPhase.READY


def test_lifecycle_transitions():
    rt = FakeRuntime()
    mgr = SessionManager(rt)
    mgr.wait_for_device(lambda: False, sleep=lambda _s: None)
    mgr.bring_up()
    assert not mgr.should_render
    assert mgr.on_state(SessionPhase.SYNCHRONIZED)
    assert mgr.on_state(SessionPhase.VISIBLE)
    assert mgr.on_state(SessionPhase.FOCUSED)
    assert mgr.should_render
    # illegal jump ignored
    assert not mgr.on_state(SessionPhase.READY)
    assert mgr.phase is SessionPhase.FOCUSED
    assert mgr.on_state(SessionPhase.STOPPING)
    mgr.tear_down()
    assert rt.destroyed == 1 and mgr.phase is SessionPhase.IDLE
    assert mgr.swapchains == []


def test_trackpad_zones():
    assert trackpad_button_zone(0.0, 0.8) == "top"
    assert trackpad_button_zone(0.0, -0.8) == "bottom"
    assert trackpad_button_zone(0.0, 0.0) is None


def test_frame_timer():
    ft = FrameTimer()
    assert ft.push_period_ns(11_111_111) == pytest.approx(90.0, rel=1e-3)
    assert ft.push_period_ns(0) is None
    # timestamp-ring fallback: 90 Hz timestamps
    out = None
    for i in range(10):
        out = ft.push_timestamp(i / 90.0)
    assert out == pytest.approx(90.0, rel=1e-6)
