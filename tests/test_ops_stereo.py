"""Stereo compositor parity vs torch grid_sample oracle + DIBR sanity."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from desktop2stereo_tpu.ops.stereo import (
    make_sbs,
    dibr_render,
    compose_display,
    stereo_compose,
)


def torch_make_sbs(rgb_hwc, depth, ipd=0.064, ratio=2.0, conv=0.0, mode="Half-SBS"):
    """Oracle for reference depth.py:2122-2184 (CUDA grid_sample path)."""
    rgb = torch.from_numpy(rgb_hwc).permute(2, 0, 1)
    d = torch.from_numpy(depth)
    C, H, W = rgb.shape
    img = rgb.unsqueeze(0).clamp(0, 255)
    shifts = -(d - conv) * ratio * (ipd * W) * 0.05
    xs = torch.linspace(-1, 1, W).view(1, 1, W).expand(1, H, W)
    ys = torch.linspace(-1, 1, H).view(1, H, 1).expand(1, H, W)
    sn = shifts * (2.0 / (W - 1))
    gl = torch.stack([xs + sn, ys], dim=-1)
    gr = torch.stack([xs - sn, ys], dim=-1)
    left = F.grid_sample(img, gl, mode="bilinear", padding_mode="reflection", align_corners=True)[0]
    right = F.grid_sample(img, gr, mode="bilinear", padding_mode="reflection", align_corners=True)[0]
    if mode in ("Half-TAB", "Full-TAB"):
        out = torch.cat([left, right], dim=1)
    else:
        out = torch.cat([left, right], dim=2)
    if mode not in ("Full-SBS", "Full-TAB"):
        out = F.interpolate(out.unsqueeze(0), size=left.shape[1:], mode="area")[0]
    return out.clamp(0, 255).permute(1, 2, 0).numpy()


@pytest.mark.parametrize("mode", ["Half-SBS", "Full-SBS", "Half-TAB", "Full-TAB"])
def test_make_sbs_matches_torch(rng, mode):
    rgb = (rng.random((60, 90, 3)) * 255).astype(np.float32)
    depth = rng.random((60, 90)).astype(np.float32)
    ref = torch_make_sbs(rgb, depth, mode=mode)
    out = np.asarray(make_sbs(jnp.asarray(rgb), jnp.asarray(depth), display_mode=mode))
    assert out.shape == ref.shape
    assert np.abs(ref - out).max() < 1e-2


def test_make_sbs_strong_parallax_reflection(rng):
    # large shifts to exercise reflection padding
    rgb = (rng.random((40, 50, 3)) * 255).astype(np.float32)
    depth = np.ones((40, 50), dtype=np.float32)
    ref = torch_make_sbs(rgb, depth, ratio=8.0, mode="Full-SBS")
    out = np.asarray(make_sbs(jnp.asarray(rgb), jnp.asarray(depth), depth_ratio=8.0, display_mode="Full-SBS"))
    assert np.abs(ref - out).max() < 1e-2


def test_dibr_zero_depth_zero_offset_is_identity(rng):
    rgb = (rng.random((32, 48, 3)) * 255).astype(np.float32)
    depth = np.zeros((32, 48), dtype=np.float32)
    out = np.asarray(dibr_render(jnp.asarray(rgb), jnp.asarray(depth), eye_offset=-0.032, depth_strength=0.0))
    assert np.abs(out - rgb).max() < 1e-3


def test_dibr_parallax_shifts_content(rng):
    # Constant near-plane depth: the backward warp becomes a uniform
    # horizontal translation (GLSL: px = eye·(-1·1.0)·strength away from
    # edges), opposite per eye.  depth=1 → depth_shaped = -1.
    W, H = 128, 32
    rgb = (rng.random((H, W, 3)) * 255).astype(np.float32)
    depth = np.ones((H, W), dtype=np.float32)
    eye, strength = 0.05, 2.0
    shift_px = eye * 1.0 * strength * W  # 12.8 px
    left = np.asarray(dibr_render(jnp.asarray(rgb), jnp.asarray(depth), -eye, strength))
    right = np.asarray(dibr_render(jnp.asarray(rgb), jnp.asarray(depth), +eye, strength))

    xs = np.arange(W, dtype=np.float64)
    mid = slice(30, 98)  # away from the edge-falloff band
    for out, sign in ((left, -1.0), (right, +1.0)):
        src = xs + sign * shift_px
        expected = np.stack(
            [np.interp(src[mid], xs, rgb[16, :, c]) for c in range(3)], axis=-1
        )
        assert np.abs(out[16, mid] - expected).max() < 1e-2, sign


@pytest.mark.parametrize("mode", [
    "Half-SBS", "Full-SBS", "Half-TAB", "Full-TAB",
    "Anaglyph", "Row-Interleaved", "Column-Interleaved", "Mono",
])
def test_compose_display_shapes(rng, mode):
    left = (rng.random((24, 30, 3)) * 255).astype(np.float32)
    right = (rng.random((24, 30, 3)) * 255).astype(np.float32)
    out = np.asarray(compose_display(jnp.asarray(left), jnp.asarray(right), mode))
    if mode == "Full-SBS":
        assert out.shape == (24, 60, 3)
    elif mode == "Full-TAB":
        assert out.shape == (48, 30, 3)
    else:
        assert out.shape == (24, 30, 3)
    if mode == "Row-Interleaved":
        assert np.allclose(out[0], left[0]) and np.allclose(out[1], right[1])
    if mode == "Anaglyph":
        assert np.allclose(out[..., 0], left[..., 0])
        assert np.allclose(out[..., 1:], right[..., 1:])


def test_stereo_compose_end_to_end(rng):
    rgb = (rng.random((48, 64, 3)) * 255).astype(np.float32)
    depth = rng.random((48, 64)).astype(np.float32)
    out = np.asarray(stereo_compose(jnp.asarray(rgb), jnp.asarray(depth)))
    assert out.shape == (48, 64, 3)
    assert out.min() >= 0 and out.max() <= 255
    d = np.asarray(stereo_compose(jnp.asarray(rgb), jnp.asarray(depth), display_mode="Depth"))
    assert d.shape == (48, 64, 3)


def test_depth_colormap_spectral_matches_reference_formula(rng):
    """Weighted-key Spectral_r colormap ≡ the reference shader math
    (reference viewer.py:639-663) at the key centers and midpoints."""
    from desktop2stereo_tpu.ops.stereo import depth_colormap_spectral

    d = jnp.asarray([[0.125, 0.375, 0.625, 0.875, 0.25, 0.0, 1.0]],
                    jnp.float32)
    out = np.asarray(depth_colormap_spectral(d))[0] / 255.0
    np.testing.assert_allclose(out[0], [0.0, 0.298, 0.651], atol=1e-6)  # blue
    np.testing.assert_allclose(out[1], [0.0, 0.5, 0.0], atol=1e-6)      # green
    np.testing.assert_allclose(out[2], [1.0, 0.851, 0.0], atol=1e-6)    # yellow
    np.testing.assert_allclose(out[3], [0.988, 0.0, 0.0], atol=1e-6)    # red
    # midpoint blends blue+green equally
    np.testing.assert_allclose(out[4], (np.array([0.0, 0.298, 0.651])
                                        + np.array([0.0, 0.5, 0.0])) / 2,
                               atol=1e-6)
    # the end keys still cover the range ends (support ±0.25 around centers)
    np.testing.assert_allclose(out[5], [0.0, 0.298, 0.651], atol=1e-6)
    np.testing.assert_allclose(out[6], [0.988, 0.0, 0.0], atol=1e-6)


def test_edge_feather_matches_reference_formula(rng):
    """edge_feather ≡ the GLSL block (reference viewer.py:586-613): per
    pixel, rgb × (fadeL·fadeR·fadeT·fadeB)^0.7 with smoothstep fades —
    checked against a direct (non-separable) numpy evaluation."""
    from desktop2stereo_tpu.ops.stereo import edge_feather

    H, W, width = 40, 64, 0.1
    eye = rng.random((H, W, 3)).astype(np.float32) * 255.0

    def ss(x):
        t = np.clip(x / width, 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    u = (np.arange(W, dtype=np.float32) + 0.5) / W
    v = (np.arange(H, dtype=np.float32) + 0.5) / H
    fall = (ss(v)[:, None] * ss(1.0 - v)[:, None]
            * ss(u)[None, :] * ss(1.0 - u)[None, :]) ** 0.7
    want = eye * fall[..., None]

    got = np.asarray(edge_feather(jnp.asarray(eye), width=width))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)
    # interior is untouched, borders are darkened
    assert np.allclose(got[H // 2, W // 2], eye[H // 2, W // 2])
    # the corner pixel is strongly attenuated (its center sits well inside
    # the smoothstep band, so it is small but nonzero — like the GLSL)
    assert got[0, 0, 0] < 0.05 * eye[0, 0, 0]


def test_stereo_compose_feather_flag(rng):
    """feather=True darkens each eye's borders without changing shape."""
    from desktop2stereo_tpu.ops.stereo import stereo_compose

    rgb = jnp.asarray(rng.random((40, 64, 3)) * 255.0, jnp.float32)
    depth = jnp.asarray(rng.random((40, 64)), jnp.float32)
    plain = np.asarray(stereo_compose(rgb, depth, display_mode="Full-SBS"))
    soft = np.asarray(stereo_compose(rgb, depth, display_mode="Full-SBS",
                                     feather=True))
    assert soft.shape == plain.shape
    # each eye's outer corner fades to ~0; the seam between eyes too
    assert soft[0, 0].sum() < plain[0, 0].sum() or plain[0, 0].sum() == 0
    assert np.all(soft <= plain + 1e-3)


@pytest.mark.slow
def test_stereo_compose_fill_16_9_pads_each_eye(rng):
    """FILL_16_9 parity (reference depth.py:2175-2177 via main.py:1340):
    each EYE pads to 16:9 before arrangement, so bars sit beside each eye
    rather than around the composed pair."""
    from desktop2stereo_tpu.ops.stereo import stereo_compose

    H, W = 90, 90  # square source → pillarboxed eyes
    rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
    depth = jnp.asarray(rng.random((H, W)), jnp.float32)
    out = np.asarray(stereo_compose(rgb, depth, display_mode="Full-SBS",
                                    fill_16_9=True))
    assert out.shape == (90, 320, 3)  # each eye 90x160, concat → 320
    # bars: left edge of each eye viewport is black
    assert out[:, :35].max() == 0.0          # left bar of the left eye
    assert out[:, 160:195].max() == 0.0      # left bar of the right eye
    assert out[:, 35:125].mean() > 1.0       # content present
    # Half-SBS squeezes the padded pair back to one eye's 16:9 footprint
    half = np.asarray(stereo_compose(rgb, depth, display_mode="Half-SBS",
                                     fill_16_9=True))
    assert half.shape == (90, 160, 3)
    # the fast (legacy make_sbs) path honors it too
    fast = np.asarray(stereo_compose(rgb, depth, display_mode="Full-SBS",
                                     quality="fast", fill_16_9=True))
    assert fast.shape == (90, 320, 3)


# ---------------------------------------------------------------------------
# Tier 2: the reference's OWN compositor as the oracle (AST-extracted from
# /root/reference/depth.py, same scheme as test_ops_depth_post) — this
# parity cannot drift from the upstream source.
# ---------------------------------------------------------------------------

def _ref_sbs_ns():
    import contextlib

    from tests.reference_loader import load_reference_functions

    return load_reference_functions(
        "depth.py",
        ["make_sbs_core", "pad_to_aspect_tensor"],
        globals_extra={
            "maybe_autocast": lambda _dev: contextlib.nullcontext(),
            "IS_DIRECTML": False,  # the grid_sample path we mirror
            "DEVICE": torch.device("cpu"),
        },
    )


@pytest.mark.parametrize("mode", ["Half-SBS", "Full-SBS", "Half-TAB", "Full-TAB"])
@pytest.mark.parametrize("fill", [False, True])
def test_make_sbs_vs_actual_reference_source(rng, mode, fill):
    ns = _ref_sbs_ns()
    H, W = 72, 72  # square → fill_16_9 actually pads
    rgb = (rng.random((H, W, 3)) * 255).astype(np.float32)
    depth = rng.random((H, W)).astype(np.float32)
    want = ns["make_sbs_core"](
        torch.from_numpy(rgb).permute(2, 0, 1).contiguous(),
        torch.from_numpy(depth), ipd_uv=0.064, depth_ratio=2.0,
        display_mode=mode, fill_16_9=fill, convergence=0.1,
    ).permute(1, 2, 0).numpy()
    got = np.asarray(make_sbs(jnp.asarray(rgb), jnp.asarray(depth),
                              convergence=0.1, display_mode=mode,
                              fill_16_9=fill))
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.abs(got - want).max() < 1e-2


@pytest.mark.parametrize("shape", [(40, 90), (90, 40), (45, 80)])
def test_pad_to_aspect_vs_actual_reference_source(rng, shape):
    from desktop2stereo_tpu.ops.stereo import pad_to_aspect

    ns = _ref_sbs_ns()
    img = (rng.random(shape + (3,)) * 255).astype(np.float32)
    want = ns["pad_to_aspect_tensor"](
        torch.from_numpy(img).permute(2, 0, 1)).permute(1, 2, 0).numpy()
    got = np.asarray(pad_to_aspect(jnp.asarray(img)))
    assert got.shape == want.shape
    assert np.abs(got - want).max() == 0.0


# --------------------------------------------------------------------------
# Roll-aware parallax (reference u_roll, viewer.py:399,544-556)
# --------------------------------------------------------------------------

def _np_sample2d(img, px, py):
    """Clamp-to-edge bilinear sample at pixel coords (numpy oracle)."""
    H, W = img.shape[:2]
    pxc = np.clip(px, 0.0, W - 1.0)
    pyc = np.clip(py, 0.0, H - 1.0)
    x0 = np.floor(pxc).astype(int)
    y0 = np.floor(pyc).astype(int)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = (pxc - x0)[..., None] if img.ndim == 3 else (pxc - x0)
    fy = (pyc - y0)[..., None] if img.ndim == 3 else (pyc - y0)
    top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def _np_dibr_warp_oracle(rgb, depth, eye, strength, conv, roll):
    """Independent numpy transcription of the reference shader's warp core
    (reference viewer.py:540-556): 3-tap pre-smooth along the rotated
    parallax direction, shaped depth, x-only edge falloff, shifted_uv =
    uv - (px*cos, px*sin).  Inpaint/confidence excluded — callers pick
    scenes where confidence is 0."""
    H, W = depth.shape
    c, s = np.cos(roll), np.sin(roll)
    sign = 1.0 if eye > 0 else -1.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    def dsamp(k):  # depth tap at k*(c,s) px (per-axis pixel sizes)
        return _np_sample2d(depth.astype(np.float64), xx + k * c, yy + k * s)

    d = (depth * 0.7 + dsamp(-sign * 1.5) * 0.15 + dsamp(+sign * 1.5) * 0.15)
    shaped = -d * (1.0 + 0.35 * (1.0 - d))
    u = (xx + 0.5) / W

    def sstep(x):
        t = np.clip(x / 0.05, 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    ef = sstep(u) * sstep(1.0 - u)
    px_shift = eye * (shaped + conv) * strength * ef
    return _np_sample2d(rgb.astype(np.float64),
                        xx - px_shift * c * W, yy - px_shift * s * H)


@pytest.mark.parametrize("roll", [0.3, -0.7, np.pi / 2, np.pi])
def test_dibr_roll_matches_reference_warp_math(rng, roll):
    """roll≠0 warp vs the independently-transcribed shader oracle on a
    smooth scene (depth gradient gentle enough that the disocclusion
    confidence is 0 everywhere — the inpaint never blends in)."""
    H, W = 64, 96
    rgb = (rng.random((H, W, 3)) * 255).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    depth = (0.2 + 0.005 * xx + 0.003 * yy).astype(np.float32)  # gentle
    out = np.asarray(dibr_render(
        jnp.asarray(rgb), jnp.asarray(depth), +0.03,
        depth_strength=1.0, convergence=0.1, roll=float(roll)))
    ref = _np_dibr_warp_oracle(rgb, depth, +0.03, 1.0, 0.1, float(roll))
    # interior only: within ~5px of the border the shifted coords go out of
    # bounds, where the shader switches to conf=1 inpaint (oracle excludes)
    assert np.abs(out[8:-8, 8:-8] - ref[8:-8, 8:-8]).max() < 1e-2


def test_inpaint_sweep_direction_is_eye_independent(rng):
    """The reference's inpaint sweep direction is the SAME for both eyes:
    g_par_dir folds in sign(eye_offset) and g_sweep_sign = -sign(eye_offset),
    so their product is always -x (reference viewer.py:442,540-543).  At
    conf=1 the output is the fill alone, so fully-disoccluded pixels must
    render IDENTICALLY in the two eyes — a per-eye sweep pairing (the old
    behavior) pulls background from opposite sides and fails this."""
    H, W = 48, 128
    # sharp vertical depth edge → jump=0.6 ≥ 0.10 → conf=1 within 2px of it
    depth = np.full((H, W), 0.8, np.float32)
    depth[:, : W // 2] = 0.2
    # asymmetric colors so opposite sweeps would disagree loudly
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[:, : W // 2, 0] = 200.0   # left half red
    rgb[:, W // 2:, 2] = 200.0    # right half blue
    out_l = np.asarray(dibr_render(jnp.asarray(rgb), jnp.asarray(depth),
                                   -0.02, depth_strength=1.0))
    out_r = np.asarray(dibr_render(jnp.asarray(rgb), jnp.asarray(depth),
                                   +0.02, depth_strength=1.0))
    edge = W // 2
    band = slice(edge - 1, edge + 2)   # |d(x-2)-d(x+2)| = 0.6 → conf = 1
    np.testing.assert_allclose(out_l[4:-4, band], out_r[4:-4, band],
                               atol=1e-3)


def test_roll_gate_rejects_half_turn():
    """roll=π has sin≈0 but a FLIPPED parallax direction — the fast-path
    gate must classify it as rolled, or it lands on the horizontal-only
    Pallas/const-offset paths with the wrong sweep sign."""
    from desktop2stereo_tpu.ops.stereo import _is_rolled

    assert not _is_rolled(0.0)
    assert not _is_rolled(2.0 * np.pi)   # full turn IS the identity
    assert _is_rolled(np.pi)
    assert _is_rolled(-np.pi)
    assert _is_rolled(0.3)


@pytest.mark.slow
def test_dibr_roll_quarter_turn_moves_parallax_vertical(rng):
    """At roll=π/2 the parallax is purely vertical: constant near depth →
    a uniform vertical translation (the roll=0 test's transposed twin)."""
    W, H = 48, 128
    rgb = (rng.random((H, W, 3)) * 255).astype(np.float32)
    depth = np.ones((H, W), dtype=np.float32)
    eye, strength = 0.05, 2.0
    shift_px = eye * 1.0 * strength * H  # 12.8 px vertically
    out = np.asarray(dibr_render(
        jnp.asarray(rgb), jnp.asarray(depth), +eye, strength,
        roll=float(np.pi / 2)))
    ys = np.arange(H, dtype=np.float64)
    mid = slice(30, 98)
    src = ys + shift_px
    col = 20  # columns keep full edge_falloff=1 away from x edges
    expected = np.stack(
        [np.interp(src[mid], ys, rgb[:, col, c]) for c in range(3)], axis=-1)
    assert np.abs(out[mid, col] - expected).max() < 1e-2


def test_stereo_compose_roll_plumbs_through(rng):
    rgb = (rng.random((40, 64, 3)) * 255).astype(np.float32)
    depth = rng.random((40, 64)).astype(np.float32)
    a = np.asarray(stereo_compose(jnp.asarray(rgb), jnp.asarray(depth),
                                  roll=0.0))
    b = np.asarray(stereo_compose(jnp.asarray(rgb), jnp.asarray(depth),
                                  roll=0.4))
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 1.0  # roll visibly changes the warp
