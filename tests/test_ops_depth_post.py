"""Depth post-processing parity, two tiers:

1. against a torch oracle rebuilt from the reference's documented math
   (fast, self-contained), and
2. against the reference's ACTUAL functions, AST-extracted from
   /root/reference/depth.py at test time (reference_loader.
   load_reference_functions) — the oracle that cannot drift."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from desktop2stereo_tpu.ops.depth_post import (
    normalize_depth,
    apply_gamma,
    apply_foreground_scale,
    anti_alias,
    ema,
    post_process_depth,
)


def torch_normalize(depth: torch.Tensor, metric: bool, percentile=2.0, cap=6144):
    """Oracle mirroring reference depth.py:816-867."""
    d = depth.squeeze()
    if metric:
        valid = d > 0
        inv = torch.where(valid, 1.0 / d.clamp(min=1e-12), d)
        v = inv[valid]
    else:
        inv = d
        v = inv.flatten()
    if v.numel() <= 10:
        dmin = torch.zeros(())
        dmax = torch.zeros(())
    else:
        vv = v
        if vv.numel() > cap:
            step = (vv.numel() + cap - 1) // cap
            vv = vv[::step]
        n = vv.numel()
        lo_q = percentile / 100.0
        tail = min(n, max(1, int(round(lo_q * (n - 1))) + 1))
        if tail == n:
            dmin, dmax = vv.min(), vv.max()
        else:
            dmin = torch.topk(vv, tail, largest=False).values.max()
            dmax = torch.topk(vv, tail, largest=True).values.min()
    denom = (dmax - dmin).clamp_min(1e-6)
    return ((inv - dmin) / denom).clamp(0.0, 1.0)


@pytest.mark.parametrize("shape", [(64, 80), (300, 400)])
def test_normalize_relative(rng, shape):
    d = (rng.random(shape) * 10 + 0.5).astype(np.float32)
    ref = torch_normalize(torch.from_numpy(d), metric=False).numpy()
    out = np.asarray(normalize_depth(jnp.asarray(d), metric=False))
    assert np.abs(ref - out).max() < 1e-5


def test_normalize_metric(rng):
    d = (rng.random((100, 120)) * 20).astype(np.float32)
    d[d < 1.0] = 0.0  # some invalid pixels
    ref = torch_normalize(torch.from_numpy(d), metric=True).numpy()
    out = np.asarray(normalize_depth(jnp.asarray(d), metric=True))
    # Metric path differs slightly in subsample ordering (valid-compaction
    # happens before striding in torch, after in ours); bound is looser.
    assert np.abs(ref - out).mean() < 2e-2


def test_gamma_and_foreground_scale(rng):
    d = rng.random((50, 60)).astype(np.float32)
    td = torch.from_numpy(d)
    assert np.allclose(np.asarray(apply_gamma(jnp.asarray(d))), torch.pow(td, 1.45).numpy(), atol=1e-6)

    for scale in (0.0, 0.5, 2.0, -0.5):
        exponent = 1.0 / (1.0 + scale)
        dist = td.clamp(0, 1) - 0.5
        if abs(scale) < 1e-6:
            ref = td.clamp(0, 1)
        else:
            ref = (0.5 + torch.sign(dist) * torch.pow(torch.abs(dist), exponent)).clamp(0, 1)
        out = np.asarray(apply_foreground_scale(jnp.asarray(d), scale))
        assert np.abs(ref.numpy() - out).max() < 1e-5, scale


@pytest.mark.parametrize("strength", [1.0, 2.0, 4.0])
def test_anti_alias_matches_torch_conv(rng, strength):
    d = rng.random((64, 96)).astype(np.float32)
    k = int(3 * strength) | 1
    sigma = 0.5 * strength
    coords = torch.arange(k, dtype=torch.float32) - k // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    t = torch.from_numpy(d)[None, None]
    t = F.conv2d(t, g.view(1, 1, 1, -1), padding=(0, k // 2))
    t = F.conv2d(t, g.view(1, 1, -1, 1), padding=(k // 2, 0))
    ref = t[0, 0].numpy()
    out = np.asarray(anti_alias(jnp.asarray(d), strength))
    assert np.abs(ref - out).max() < 1e-5


def test_anti_alias_below_threshold_is_identity(rng):
    d = rng.random((16, 16)).astype(np.float32)
    assert np.array_equal(np.asarray(anti_alias(jnp.asarray(d), 0.5)), d)


def test_ema_matches_lerp(rng):
    prev = rng.random((32, 32)).astype(np.float32)
    cur = rng.random((32, 32)).astype(np.float32)
    ref = torch.from_numpy(prev).lerp(torch.from_numpy(cur), 0.1).numpy()
    out = np.asarray(ema(jnp.asarray(prev), jnp.asarray(cur), alpha=0.9))
    assert np.abs(ref - out).max() < 1e-6
    assert ema(None, jnp.asarray(cur)) is not None


def test_post_process_chain_range(rng):
    d = (rng.random((128, 160)) * 3).astype(np.float32)
    out = np.asarray(post_process_depth(jnp.asarray(d), foreground_scale=0.05, aa_strength=2.0))
    assert out.shape == (128, 160)
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# Tier 2: the reference's OWN functions as the oracle (AST-extracted from
# /root/reference/depth.py, so this parity cannot drift from upstream).
# ---------------------------------------------------------------------------

def _ref_post_ns(metric: bool, fg: float, aa: float):
    from tests.reference_loader import load_reference_functions

    return load_reference_functions(
        "depth.py",
        ["post_process_depth", "normalize", "apply_gamma",
         "apply_foreground_scale", "anti_alias", "_aa_kernel_cache",
         "_percentile_bounds_no_lerp", "_percentile_bounds_sort"],
        globals_extra={"is_metric": lambda: metric,
                       "FOREGROUND_SCALE": fg, "AA_STRENGTH": aa},
    )


@pytest.mark.parametrize("metric", [False, True])
@pytest.mark.parametrize("fg,aa", [(0.0, 1.0), (0.1, 2.0)])
def test_full_chain_vs_actual_reference_source(rng, metric, fg, aa):
    ns = _ref_post_ns(metric, fg, aa)
    d = (rng.random((120, 160)) * (20.0 if metric else 3.0)).astype(np.float32)
    if metric:
        d[d < 1.0] = 0.0  # invalid pixels exercise the valid-mask path

    want = ns["post_process_depth"](torch.from_numpy(d.copy()))
    want = np.asarray(want.detach().numpy())
    got = np.asarray(post_process_depth(
        jnp.asarray(d), metric=metric, foreground_scale=fg, aa_strength=aa))
    assert got.shape == want.shape
    if metric:
        # valid-compaction vs strided-subsample ordering differs (documented
        # in normalize_depth); bound the mean, not the max
        assert np.abs(got - want).mean() < 2e-2
    else:
        assert np.abs(got - want).max() < 1e-4


def test_normalize_vs_actual_reference_source(rng):
    ns = _ref_post_ns(False, 0.0, 1.0)
    d = (rng.random((300, 400)) * 10 + 0.5).astype(np.float32)
    want = ns["normalize"](torch.from_numpy(d.copy())).numpy()
    got = np.asarray(normalize_depth(jnp.asarray(d), metric=False))
    assert np.abs(got - want).max() < 1e-5
