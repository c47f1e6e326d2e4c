"""Pallas kernel parity (interpret mode on CPU) vs the jnp reference paths."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.pallas.warp import horizontal_sample, horizontal_sample_ref
from desktop2stereo_tpu.ops import stereo as S


def test_horizontal_sample_matches_ref():
    rng = np.random.default_rng(0)
    H, W, C = 40, 384, 3
    img = jnp.asarray(rng.random((H, W, C)), jnp.float32)
    base = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    px = jnp.asarray(np.clip(base + rng.uniform(-90, 90, (H, W)), 0, W - 1)
                     .astype(np.float32))
    want = np.asarray(horizontal_sample_ref(img, px))
    got = np.asarray(horizontal_sample(img, px, max_disp=128, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_dibr_kernel_matches_jnp_path():
    """Fused warp+inpaint+blend kernel ≡ the jnp composition used on CPU."""
    from desktop2stereo_tpu.ops.pallas.dibr import dibr_warp_fill_blend

    rng = np.random.default_rng(1)
    H, W = 96, 256
    rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
    d = jnp.asarray(rng.random((H, W)), jnp.float32)
    conf = jnp.asarray(rng.random((H, W)), jnp.float32)
    base = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    px = jnp.asarray(
        np.clip(base + rng.uniform(-40, 40, (H, W)), 0, W - 1).astype(np.float32))

    got = np.asarray(dibr_warp_fill_blend(
        rgb, d, conf, px, max_disp=64, search_radius=12,
        depth_tolerance=0.012, sweep_sign=1.0, interpret=True,
    ))

    color = np.asarray(horizontal_sample_ref(rgb, px))
    # the kernel takes RAW depth and computes the 3-tap center smooth
    # itself (taps read raw — the reference shader's split, r05); the jnp
    # oracle mirrors that: smoothed center, raw neighbor taps
    sm = (d * 0.7 + S._sample_const_offset(d, -1.5) * 0.15
          + S._sample_const_offset(d, +1.5) * 0.15)
    filled = np.asarray(S.push_pull_inpaint(rgb, d, -sm, 1.0, 12, 0.012))
    want = color + np.asarray(conf)[..., None] * (filled - color)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_dibr_render_cpu_uses_jnp_path():
    """On CPU dibr_render must keep working end-to-end (fallback path)."""
    rng = np.random.default_rng(2)
    rgb = jnp.asarray(rng.random((48, 96, 3)) * 255.0, jnp.float32)
    depth = jnp.asarray(rng.random((48, 96)), jnp.float32)
    out = S.dibr_render(rgb, depth, -0.032)
    assert out.shape == rgb.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dibr_pair_kernel_matches_per_eye_jnp():
    """The fused both-eyes kernel ≡ two jnp dibr_render calls."""
    from desktop2stereo_tpu.ops.pallas.dibr import dibr_render_pair

    rng = np.random.default_rng(3)
    H, W = 96, 256
    rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
    depth = jnp.asarray(rng.random((H, W)), jnp.float32)
    ipd, strength, conv = 0.064, 1.0, 0.01

    left, right = dibr_render_pair(
        rgb, depth, ipd=ipd, depth_strength=strength, convergence=conv,
        interpret=True,
    )
    want_l = np.asarray(S.dibr_render(rgb, depth, -ipd / 2, strength, conv))
    want_r = np.asarray(S.dibr_render(rgb, depth, +ipd / 2, strength, conv))
    np.testing.assert_allclose(np.asarray(left), want_l, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(right), want_r, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_dibr_pair_fused_half_sbs_u8():
    """out_mode='half_sbs_u8' ≡ eyes → compose_display('Half-SBS') →
    clip(+0.5)→u8, fused into the kernel (incl. non-128-multiple width)."""
    from desktop2stereo_tpu.ops.pallas.dibr import (
        dibr_render_pair, dibr_render_pair_planar, pad_planar,
    )

    rng = np.random.default_rng(4)
    for H, W in ((96, 256), (50, 200)):
        rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
        depth = jnp.asarray(rng.random((H, W)), jnp.float32)
        ipd, strength, conv = 0.064, 2.0, 0.01

        rgbp, depp = pad_planar(rgb, depth)
        fused = dibr_render_pair_planar(
            rgbp, depp, W, ipd=ipd, depth_strength=strength,
            convergence=conv, out_mode="half_sbs_u8", interpret=True,
        )
        got = np.asarray(fused).transpose(1, 2, 0)[:H, :W]

        left, right = dibr_render_pair(
            rgb, depth, ipd=ipd, depth_strength=strength, convergence=conv,
            interpret=True,
        )
        sbs = np.concatenate([np.asarray(left), np.asarray(right)], axis=1)
        want_f = (sbs[:, 0::2] + sbs[:, 1::2]) * 0.5
        want = np.clip(want_f + 0.5, 0.0, 255.0).astype(np.uint8)
        # f32-associativity at the quantization boundary can flip one LSB
        np.testing.assert_allclose(
            got.astype(np.int32), want.astype(np.int32), atol=1)


@pytest.mark.slow
def test_dibr_pair_hwc_u8_modes_match_eyes_u8():
    """'sbs_hwc_u8' / 'eyes_hwc_u8' ≡ 'eyes_u8' + the XLA crop/concat/
    transpose tail they replace — exact (quantize commutes with the
    interleave permutation).  Covers an exact-lane-multiple width and a
    padded one (trailing lanes cropped by the caller)."""
    from desktop2stereo_tpu.ops.pallas.dibr import (
        dibr_render_pair_planar, pad_planar,
    )

    rng = np.random.default_rng(6)
    for H, W in ((96, 256), (50, 200)):
        rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
        depth = jnp.asarray(rng.random((H, W)), jnp.float32)
        rgbp, depp = pad_planar(rgb, depth)
        kw = dict(ipd=0.064, depth_strength=2.0, convergence=0.01,
                  interpret=True)
        lq, rq = dibr_render_pair_planar(rgbp, depp, W, out_mode="eyes_u8",
                                         **kw)
        l_hwc = np.asarray(lq)[:, :H, :W].transpose(1, 2, 0)
        r_hwc = np.asarray(rq)[:, :H, :W].transpose(1, 2, 0)

        flat = dibr_render_pair_planar(rgbp, depp, W, out_mode="sbs_hwc_u8",
                                       **kw)
        got = np.asarray(flat)[:H, : 6 * W].reshape(H, 2 * W, 3)
        np.testing.assert_array_equal(
            got, np.concatenate([l_hwc, r_hwc], axis=1))

        l8, r8 = dibr_render_pair_planar(rgbp, depp, W,
                                         out_mode="eyes_hwc_u8", **kw)
        np.testing.assert_array_equal(
            np.asarray(l8)[:H, : 3 * W].reshape(H, W, 3), l_hwc)
        np.testing.assert_array_equal(
            np.asarray(r8)[:H, : 3 * W].reshape(H, W, 3), r_hwc)


@pytest.mark.slow
def test_dibr_pair_feather_matches_jnp():
    """In-kernel per-eye edge feathering ≡ the jnp edge_feather applied to
    the unfeathered kernel eyes (reference viewer.py:586-613 KEY_B)."""
    from desktop2stereo_tpu.ops.pallas.dibr import (
        dibr_render_pair_planar, pad_planar,
    )
    from desktop2stereo_tpu.ops.stereo import edge_feather

    rng = np.random.default_rng(7)
    H, W = 96, 256
    rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
    depth = jnp.asarray(rng.random((H, W)), jnp.float32)
    rgbp, depp = pad_planar(rgb, depth)
    kw = dict(ipd=0.064, depth_strength=2.0, convergence=0.01,
              interpret=True)
    width = 0.08  # wide band so it spans several pixels at this size
    lf, rf = dibr_render_pair_planar(
        rgbp, depp, W, out_mode="eyes", feather=width, height=H, **kw)
    lp, rp = dibr_render_pair_planar(rgbp, depp, W, out_mode="eyes", **kw)
    for got, plain in ((lf, lp), (rf, rp)):
        eye = np.asarray(plain).transpose(1, 2, 0)[:H, :W]
        want = np.asarray(edge_feather(jnp.asarray(eye), width=width))
        have = np.asarray(got).transpose(1, 2, 0)[:H, :W]
        np.testing.assert_allclose(have, want, atol=2e-2, rtol=1e-4)


def test_dibr_pair_eyes_u8_quantizes_in_kernel():
    """out_mode='eyes_u8' ≡ out_mode='eyes' → clip(+0.5)→u8 per eye (the
    half-width Half-SBS tail's building block: each eye already renders at
    output width, so no squeeze — just the fused quantize)."""
    from desktop2stereo_tpu.ops.pallas.dibr import (
        dibr_render_pair_planar, pad_planar,
    )

    rng = np.random.default_rng(5)
    for H, W in ((96, 256), (50, 200)):
        rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
        depth = jnp.asarray(rng.random((H, W)), jnp.float32)
        rgbp, depp = pad_planar(rgb, depth)
        kw = dict(ipd=0.064, depth_strength=2.0, convergence=0.01,
                  interpret=True)
        lq, rq = dibr_render_pair_planar(rgbp, depp, W, out_mode="eyes_u8", **kw)
        lf, rf = dibr_render_pair_planar(rgbp, depp, W, out_mode="eyes", **kw)
        for q, f in ((lq, lf), (rq, rf)):
            want = np.clip(np.asarray(f) + 0.5, 0.0, 255.0).astype(np.uint8)
            np.testing.assert_array_equal(np.asarray(q), want)
