"""Depth post-processing: percentile normalize → gamma → foreground scale →
anti-alias → temporal EMA.

Functional JAX reimplementation of the reference chain (reference
depth.py:806-814 `post_process_depth`, 816-867 `normalize`, 775 `apply_gamma`,
709-736 `apply_foreground_scale`, 740-765 `anti_alias`, 1865-1894
`DepthStabilizer`).  All state (EMA carry) is explicit so the whole chain
fuses into the jitted frame program; no Python-side mutability.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PERCENTILE = 2.0
SUBSAMPLE_CAP = 6_144


def _tail_count(n: int, percentile: float) -> int:
    lo_q = max(0.0, min(1.0, percentile / 100.0))
    return min(n, max(1, int(round(lo_q * (n - 1))) + 1))


def percentile_bounds(values: jax.Array, percentile: float = PERCENTILE) -> Tuple[jax.Array, jax.Array]:
    """(lo, hi) percentile clip bounds over a flat vector, matching the
    reference's topk formulation (reference depth.py:787-797): lo = max of the
    smallest `tail_count` values, hi = min of the largest `tail_count`."""
    v = jnp.sort(values.reshape(-1))
    n = v.shape[0]
    tc = _tail_count(n, percentile)
    if tc >= n:
        return v[0], v[-1]
    return v[tc - 1], v[n - tc]


def _subsample(flat: jax.Array, cap: int = SUBSAMPLE_CAP) -> jax.Array:
    n = flat.shape[0]
    if n <= cap:
        return flat
    step = (n + cap - 1) // cap
    return flat[::step]


def normalize_depth(
    depth: jax.Array,
    metric: bool = False,
    percentile: float = PERCENTILE,
    subsample_cap: int = SUBSAMPLE_CAP,
) -> jax.Array:
    """Raw model output → [0,1], near≈1 / far≈0.

    Non-metric (disparity) models: percentile clip + min-max (reference
    depth.py:846-867).  Metric models additionally invert 1/d over the valid
    (d>0) mask first (reference depth.py:838-844).  Everything is static-shape:
    the valid-mask reduction uses an inf-ranked sort instead of boolean
    indexing so it jits.
    """
    d = depth.astype(jnp.float32).squeeze()
    flat = d.reshape(-1)

    if metric:
        valid = flat > 0
        inv_flat = jnp.where(valid, 1.0 / jnp.maximum(flat, 1e-12), flat)
        v = _subsample(inv_flat, subsample_cap)
        valid_s = _subsample(valid.astype(jnp.int32), subsample_cap)
        n = v.shape[0]
        # Sort with invalids pushed to +inf so the first `count` entries are
        # the sorted valid values.
        sorted_v = jnp.sort(jnp.where(valid_s > 0, v, jnp.inf))
        count = jnp.sum(valid_s)
        # Dynamic tail count mirroring _tail_count on the runtime valid count.
        lo_q = percentile / 100.0
        tc = jnp.clip(jnp.round(lo_q * (count - 1)).astype(jnp.int32) + 1, 1, jnp.maximum(count, 1))
        lo = sorted_v[jnp.clip(tc - 1, 0, n - 1)]
        hi = sorted_v[jnp.clip(count - tc, 0, n - 1)]
        # Degenerate inputs (<=10 valid values) fall back to 0/0 like the
        # reference (depth.py:849-851) — denominator clamp handles it.
        few = count <= 10
        lo = jnp.where(few, 0.0, lo)
        hi = jnp.where(few, 0.0, hi)
        inv = inv_flat.reshape(d.shape)
    else:
        inv = d
        v = _subsample(flat, subsample_cap)
        lo_b, hi_b = percentile_bounds(v, percentile)
        few = v.shape[0] <= 10
        lo = jnp.where(few, 0.0, lo_b)
        hi = jnp.where(few, 0.0, hi_b)

    denom = jnp.maximum(hi - lo, 1e-6)
    return jnp.clip((inv - lo) / denom, 0.0, 1.0)


def apply_gamma(depth01: jax.Array, gamma: float = 1.45) -> jax.Array:
    """(reference depth.py:775)"""
    return jnp.power(depth01, gamma)


def apply_foreground_scale(
    depth01: jax.Array, scale: float, mid: float = 0.5, eps: float = 1e-6
) -> jax.Array:
    """Power-curve contrast around `mid` (reference depth.py:709-736)."""
    if not (-1.0 + 1e-12 < scale):
        raise ValueError("scale must be greater than -1.0")
    d = jnp.clip(depth01, 0.0, 1.0)
    if abs(scale) < eps:
        return d
    exponent = 1.0 / (1.0 + scale)
    dist = d - mid
    out = mid + jnp.sign(dist) * jnp.power(jnp.abs(dist), exponent)
    return jnp.clip(out, 0.0, 1.0)


@functools.lru_cache(maxsize=32)
def _gauss_kernel(k: int, sigma: float) -> np.ndarray:
    coords = np.arange(k, dtype=np.float64) - k // 2
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def anti_alias(depth: jax.Array, strength: float = 1.0) -> jax.Array:
    """Separable Gaussian with zero ('same') padding, k = int(3·strength)|1
    (reference depth.py:740-765 — torch conv2d zero-pads, slightly darkening
    borders; we match that exactly).

    Implemented as shifted multiply-adds, not conv_general: a C=1 conv is
    the worst case for XLA's TPU conv path (sub-lane channel dim), while k
    static shifts fuse into one elementwise pass per axis — same math."""
    k = int(3 * strength) | 1
    if k < 3:
        return depth
    g = _gauss_kernel(k, 0.5 * strength)
    r = k // 2
    x = depth
    for axis in (0, 1):
        pad = [(r, r) if a == axis else (0, 0) for a in range(2)]
        xp = jnp.pad(x, pad)  # zeros — the torch conv2d border behavior
        acc = None
        for i in range(k):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(i, i + x.shape[axis])
            term = xp[tuple(sl)] * float(g[i])
            acc = term if acc is None else acc + term
        x = acc
    return x


def ema(prev: Optional[jax.Array], depth: jax.Array, alpha: float = 0.9) -> jax.Array:
    """Temporal EMA: prev.lerp(depth, 1-α) (reference depth.py:1877-1887).

    `prev is None` (first frame / reset) passes depth through — the caller
    keeps the carry and resets it on shape change, mirroring DepthStabilizer.
    """
    if prev is None:
        return depth
    w = 1.0 - alpha
    return prev + w * (depth - prev)


def post_process_depth(
    depth_raw: jax.Array,
    metric: bool = False,
    gamma: float = 1.45,
    foreground_scale: float = 0.0,
    aa_strength: float = 1.0,
) -> jax.Array:
    """Full chain minus EMA (reference depth.py:806-814)."""
    d = normalize_depth(depth_raw, metric=metric)
    d = apply_gamma(d, gamma)
    d = apply_foreground_scale(d, foreground_scale)
    d = anti_alias(d, aa_strength)
    return d
