"""XR overlay / OSD rendering tests."""

import numpy as np

from desktop2stereo_tpu.xr.keyboard import KeyboardState, build_layout
from desktop2stereo_tpu.xr.overlay import (
    OverlayThrottle,
    crop_osd,
    depth_osd,
    fps_panel,
    help_rows,
    preset_osd,
    render_help_panel,
    render_keyboard_texture,
    render_text_panel,
    seat_osd,
)


def _nonblank(img: np.ndarray) -> bool:
    return img.std() > 1.0


def test_text_panel_shape_and_content():
    img = render_text_panel(["hello", "world"], width=300)
    assert img.dtype == np.uint8 and img.shape[2] == 4
    assert img.shape[1] == 300
    assert _nonblank(img)


def test_osd_panels_render():
    for img in (
        fps_panel(59.9, 48.2, 14.1, model="DA-V2-L", depth_strength=2.0),
        depth_osd(2.0),
        depth_osd(2.0, lang="CN"),
        preset_osd("Cinema", 0, 4),
        seat_osd("Center", 0, 3, lang="CN"),
        crop_osd("auto", (0.02, 0.1, 0.98, 0.9), paused=True),
    ):
        assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 4
        assert _nonblank(img)


def test_help_rows_bilingual():
    en = help_rows("EN")
    cn = help_rows("CN")
    assert len(en) > 10 and len(cn) > 10
    assert any(h for _i, _g, _e, h in en)
    img_en = render_help_panel("EN")
    img_cn = render_help_panel("CN")
    assert _nonblank(img_en) and _nonblank(img_cn)


def test_keyboard_texture_states():
    keys = build_layout()
    base = render_keyboard_texture(keys)
    assert base.shape == (384, 1280, 4)
    hover = render_keyboard_texture(keys, hover=10)
    assert not np.array_equal(base, hover)
    st = KeyboardState()
    st.press({k.label: k for k in keys}["Shift"])
    shifted = render_keyboard_texture(keys, state=st)
    assert not np.array_equal(base, shifted)  # latched tint + labels change


def test_overlay_throttle():
    calls = []

    def render(x):
        calls.append(x)
        return np.full((2, 2, 4), x, np.uint8)

    th = OverlayThrottle(interval=0.5)
    a = th.maybe(render, 1, now=0.0)
    b = th.maybe(render, 2, now=0.2)   # cached
    assert np.array_equal(a, b) and calls == [1]
    c = th.maybe(render, 3, now=0.6)   # re-rendered
    assert c[0, 0, 0] == 3 and calls == [1, 3]
