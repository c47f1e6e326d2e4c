"""Headless GL exercise of the workstation presenters (VERDICT r04 item 6).

xr/gl_theater.py was import-guarded and untested — a shader-compile error
or GL state bug would ship silently.  Mesa's EGL surfaceless platform +
llvmpipe gives CI a REAL GL core context: these tests compile every
TheaterGL program, render actual theater frames, and compare against the
numpy rasterizer (xr/raster.py) that pins the scene's behavior — so a
DIBR_FRAG or draw-list-submission regression fails HERE, not on a user's
workstation (the reference runs its GL path in production, reference
xr_viewer/implementation.py:1880-2045, viewer.py:386-631)."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

from desktop2stereo_tpu.xr.environment import (EnvironmentProfile, FillLight,
                                               Lighting)
from desktop2stereo_tpu.xr.raster import (render_items, symmetric_proj,
                                          view_translate)
from desktop2stereo_tpu.xr.theater import Theater

W, H = 240, 136

# Mesa's llvmpipe EGL context cannot share a process with the native
# runtimes other test modules load (torch/transformers/safetensors bring
# their own LLVM/OpenMP; glTexImage then segfaults mid-suite even though
# this module alone is green).  So the real GL tests only run in a CLEAN
# subprocess: the outer collection sees them skipped plus one wrapper test
# that re-runs this file isolated and surfaces its output on failure.
_ISOLATED = os.environ.get("D2S_GL_SUBPROC") == "1"
_isolated_only = pytest.mark.skipif(
    not _ISOLATED, reason="GL tests run via test_gl_suite_in_clean_subprocess")


if not _ISOLATED:
    def test_gl_suite_in_clean_subprocess():
        """Run this module's GL tests in a fresh interpreter (no torch/jax
        native state) and fail with their output if any fails."""
        env = dict(os.environ, D2S_GL_SUBPROC="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", os.path.abspath(__file__),
             "-q", "-p", "no:cacheprovider"],
            capture_output=True, text=True, env=env, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, (
            f"isolated GL suite failed (rc={r.returncode}):\n"
            f"{r.stdout}\n{r.stderr}")
        if "passed" not in r.stdout and "skipped" in r.stdout:
            # host without PyOpenGL / Mesa EGL: the inner gl_ctx fixture
            # skipped everything — propagate the skip, don't fail the
            # documented no-display default suite
            pytest.skip(f"GL unavailable in subprocess: {r.stdout.strip()}")
        import re as _re

        m = _re.search(r"(\d+) passed", r.stdout)
        assert m and int(m.group(1)) >= 5, r.stdout


def _profile(**kw):
    return EnvironmentProfile(lighting=Lighting(
        exposure=1.2, ambient_color=(0.10, 0.10, 0.12),
        head_light_color=(0.5, 0.5, 0.55)),
        fill_lights=(FillLight(position=(0.0, 2.6, -2.0),
                               color=(0.9, 0.8, 0.6), range=7.0),), **kw)


def _frame(w=320, h=180):
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, :, 0] = 200
    rgb[h // 3:2 * h // 3, w // 3:2 * w // 3] = (30, 220, 40)
    return rgb


@pytest.fixture(scope="module")
def gl_ctx():
    try:
        from desktop2stereo_tpu.xr.headless_gl import create_headless_context
    except Exception as e:  # pragma: no cover
        pytest.skip(f"headless GL unavailable: {e}")
    try:
        ctx = create_headless_context(W, H)
    except RuntimeError as e:  # pragma: no cover - no EGL on this host
        pytest.skip(f"headless GL unavailable: {e}")
    yield ctx
    ctx.destroy()


@pytest.fixture(scope="module")
def theater_gl(gl_ctx):
    from desktop2stereo_tpu.xr.gl_theater import TheaterGL

    # constructing TheaterGL compiles ALL theater programs (color, tex,
    # screen/DIBR) — a GLSL syntax/link error fails right here
    return TheaterGL()


def _gl_render(theater_gl, th, rgb, depth=None, eye_offset=0.0,
               strength=0.0, convergence=0.0, eye_x=0.0):
    from desktop2stereo_tpu.xr.headless_gl import read_pixels

    dibr = {"eye_offset": eye_offset, "strength": strength,
            "convergence": convergence, "roll": 0.0, "corner_radius": 0.0}
    theater_gl.set_frame(rgb, depth)
    clear, items = th.frame_items(rgb, gpu=True, dibr=dibr)
    view = view_translate((eye_x, th.origin_y, 0.0))
    proj = symmetric_proj(75.0, W / H)
    theater_gl.render((0, 0, W, H), clear, items, view, proj)
    return read_pixels(W, H)[:, :, :3]


def _soft_render(th, rgb, eye_x=0.0):
    clear, items = th.frame_items(rgb)
    view = view_translate((eye_x, th.origin_y, 0.0))
    proj = symmetric_proj(75.0, W / H)
    return render_items(W, H, clear, items, view, proj)


def _block_mean(img, k=8):
    h, w = img.shape[:2]
    img = img[: h // k * k, : w // k * k].astype(np.float32)
    return img.reshape(h // k, k, w // k, k, -1).mean((1, 3))


@_isolated_only
def test_gl_matches_soft_rasterizer_on_theater_frame(theater_gl):
    """The GL backend and the numpy rasterizer consume identical draw
    lists; at zero parallax their outputs must agree structurally
    (block-mean tolerance absorbs filtering differences, not missing
    geometry or a broken shader)."""
    th = Theater(profile=_profile())
    rgb = _frame()
    gl_img = _gl_render(theater_gl, th, rgb)
    sw_img = _soft_render(th, rgb)
    # screen center shows the frame's green square in BOTH
    for img in (gl_img, sw_img):
        c = img[H // 2, W // 2]
        assert c[1] > 120 and c[0] < 120, c
    gb, sb = _block_mean(gl_img), _block_mean(sw_img)
    diff = np.abs(gb - sb).mean()
    assert diff < 26.0, f"GL vs soft rasterizer diverged: mean {diff:.1f}"
    # the room is lit in the corners in both (not clear-black)
    for y, x in ((3, 3), (3, W - 4), (H - 4, 3), (H - 4, W - 4)):
        assert gl_img[y, x].sum() > 20, (y, x, gl_img[y, x])


@_isolated_only
def test_gl_dibr_warp_produces_parallax(theater_gl):
    """Nonzero eye offset + a depth gradient must SHIFT screen content
    between the eyes — the DIBR fragment shader actually warping (a
    regression to pass-through sampling fails this)."""
    th = Theater(profile=_profile())
    rgb = _frame()
    depth = np.tile(np.linspace(0.0, 1.0, 96, dtype=np.float32), (54, 1))
    left = _gl_render(theater_gl, th, rgb, depth=depth,
                      eye_offset=-0.05, strength=3.0)
    right = _gl_render(theater_gl, th, rgb, depth=depth,
                       eye_offset=+0.05, strength=3.0)
    zero = _gl_render(theater_gl, th, rgb, depth=depth,
                      eye_offset=0.0, strength=3.0)
    # parallax: the screen region differs between eyes
    band = slice(H // 3, 2 * H // 3)
    assert (np.abs(left[band].astype(int)
                   - right[band].astype(int)) > 20).mean() > 0.01
    # and each eye differs from the zero-offset render
    assert (left != zero).any() and (right != zero).any()


@_isolated_only
def test_gl_ui_toggles_change_pixels(theater_gl):
    """glow/keyboard/help/fps toggles alter the GL output too (prog_tex +
    blending paths; pins the overlay texture submission)."""
    th = Theater(profile=_profile())
    th.set_stats(60.0, 55.0, 16.0, "test")
    rgb = _frame()
    base = _gl_render(theater_gl, th, rgb)
    changed = {}
    for toggle in ("glow", "keyboard", "help_panel", "fps_overlay"):
        th.ui[toggle] = True
        on = _gl_render(theater_gl, th, rgb)
        changed[toggle] = bool((on != base).any())
        th.ui[toggle] = False
    assert all(changed.values()), changed


@_isolated_only
def test_gl_curved_screen_renders(theater_gl):
    th = Theater(profile=_profile())
    th.ui["curved"] = True
    rgb = _frame()
    img = _gl_render(theater_gl, th, rgb)
    c = img[H // 2, W // 2]
    assert c[1] > 100, c   # green square still lands mid-screen


@_isolated_only
def test_gl_frame_texture_reupload_new_shape(theater_gl):
    """Shape change re-creates the frame textures without GL errors."""
    from OpenGL import GL

    th = Theater(profile=_profile())
    _gl_render(theater_gl, th, _frame(320, 180))
    _gl_render(theater_gl, th, _frame(200, 112),
               depth=np.zeros((28, 50), np.float32))
    assert GL.glGetError() == GL.GL_NO_ERROR
