"""Display probing + output-resolution policy (reference utils.py:287-343)."""

import numpy as np

from desktop2stereo_tpu.core.display import (
    NO_RESIZE_SENTINEL,
    compute_output_resolution,
    get_monitor_size,
    get_refresh_rate,
)


def test_explicit_values_win():
    assert compute_output_resolution(1440, "Half-SBS", "Local Viewer") == 1440
    assert compute_output_resolution("2160", "Half-SBS", "Local Viewer") == 2160
    assert compute_output_resolution(" 720 ", "Full-TAB", None) == 720


def test_auto_headless_gets_no_resize_sentinel():
    # streaming/XR modes process the captured frame at native size
    assert compute_output_resolution("Auto", "Half-SBS", "OpenXR") == NO_RESIZE_SENTINEL
    assert compute_output_resolution(None, "Half-SBS", None) == NO_RESIZE_SENTINEL
    assert compute_output_resolution(0, "Half-SBS", "MJPEG") == NO_RESIZE_SENTINEL


def test_auto_viewer_uses_monitor_height():
    h = compute_output_resolution("Auto", "Half-SBS", "Local Viewer")
    _, mon_h = get_monitor_size()
    assert h == max(2, (mon_h // 2) * 2)
    # Full-TAB halves the height (each eye gets half the rows)
    tab = compute_output_resolution("Auto", "Full-TAB", "Local Viewer")
    assert tab == max(2, ((mon_h // 2) // 2) * 2)
    assert h % 2 == 0 and tab % 2 == 0


def test_probes_never_raise_and_have_sane_defaults():
    w, h = get_monitor_size()
    assert w >= 640 and h >= 480
    assert 20.0 <= get_refresh_rate() <= 480.0


def test_settings_resolves_auto(tmp_path):
    from desktop2stereo_tpu.core.config import Settings, load_settings, save_settings

    s = Settings.from_yaml_dict({
        "Processing Resolution": "Auto",  # the reference's key name
        "Set FPS": "Auto",
        "Run Mode": "Streamer",
    })
    assert s.output_resolution == NO_RESIZE_SENTINEL
    assert s.fps >= 20.0
    # round-trip preserves the user's "Auto" strings
    p = tmp_path / "settings.yaml"
    save_settings(s, p)
    again = load_settings(p)
    assert again.extra.get("Processing Resolution", "Auto") == "Auto" or \
        again.output_resolution == NO_RESIZE_SENTINEL


def test_settings_output_resolution_key_compat():
    """The reference reads "Processing Resolution" (reference utils.py:844);
    earlier versions here wrote "Output Resolution".  Both must load, the
    canonical key must win a tie, and saves must emit the reference name."""
    from desktop2stereo_tpu.core.config import Settings

    assert Settings.from_yaml_dict(
        {"Processing Resolution": 1440}).output_resolution == 1440
    assert Settings.from_yaml_dict(
        {"Output Resolution": 1440}).output_resolution == 1440
    for order in (
        {"Output Resolution": 720, "Processing Resolution": 1440},
        {"Processing Resolution": 1440, "Output Resolution": 720},
    ):
        assert Settings.from_yaml_dict(order).output_resolution == 1440
    assert Settings(output_resolution=900).to_yaml_dict()[
        "Processing Resolution"] == 900


def test_force_fp32_quirk_in_registry():
    """The quirk field exists for models whose whole graph needs f32
    (reference FORCE_FP32_KEYWORDS, utils.py:234-238).  ZoeDepth used to
    carry it, but its metric-bins head now promotes itself to f32
    internally (models/zoedepth.py) so the BEiT trunk rides bf16 — the
    registry must NOT force the whole model anymore."""
    from desktop2stereo_tpu.core.registry import MODEL_REGISTRY, get_spec

    assert not get_spec("zoedepth-nyu").force_fp32
    assert not get_spec("zoedepth-kitti").force_fp32
    assert not get_spec("Depth-Anything-V2-Small").force_fp32
    # the mechanism stays available for future quirked checkpoints
    assert all(hasattr(s, "force_fp32") for s in MODEL_REGISTRY.values())
