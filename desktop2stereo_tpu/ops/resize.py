"""Resize ops as dense weight-matrix matmuls (MXU-native, torch-exact).

The reference resizes with ``F.interpolate`` in four flavors on its hot path
(reference depth.py:676-706, 1999-2004; modeling bilinear align-corners
variants): bicubic+antialias for model input, bilinear for depth-back-to-frame
and DPT internals, and 'area' for Half-SBS downsampling.

TPU-first design: every separable resize with *static* shapes is two matmuls
``W_h @ X @ W_w^T`` where the 1-D weight matrices replicate torch's kernels
bit-for-bit (computed in float64 numpy at trace time, cached).  On the MXU a
dense (518×2160)@(2160×3840·3) matmul is ~0.1 ms — far faster than a gather —
and numerically exact vs. the reference, which a generic ``jax.image.resize``
is not.  Layout is NHWC throughout (TPU-native).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize",
    "resize_weights",
    "resize_halved",
    "patch_aligned_size",
    "resize_patch_aligned",
]


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Keys cubic convolution kernel with free parameter `a`.

    torch uses a=-0.75 for plain bicubic and a=-0.5 when antialias=True
    (matching PIL); both are the standard piecewise cubic.
    """
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )
    return out


def _triangle_kernel(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


@functools.lru_cache(maxsize=256)
def resize_weights(
    in_size: int,
    out_size: int,
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
    scale_override: Optional[float] = None,
) -> np.ndarray:
    """[out_size, in_size] float32 row matrix replicating torch F.interpolate.

    Supported modes: "bilinear", "bicubic", "area", "nearest".
    Edge handling is clamp-to-edge (torch semantics): out-of-range taps fold
    their weight onto the boundary sample.  `scale_override` reproduces
    torch's scale_factor-based sampling (src = dst/scale) when it differs
    from out/in — e.g. DINOv2's interpolate_offset pos-embed kludge.
    """
    if in_size == out_size and mode != "area" and scale_override is None:
        return np.eye(out_size, dtype=np.float32)

    W = np.zeros((out_size, in_size), dtype=np.float64)

    if mode == "nearest":
        scale = in_size / out_size
        for i in range(out_size):
            src = min(in_size - 1, int(math.floor(i * scale)))
            W[i, src] = 1.0
        return W.astype(np.float32)

    if mode == "area":
        # Matches F.interpolate(mode="area") == adaptive_avg_pool: each output
        # cell averages input cells overlapping [i*in/out, (i+1)*in/out).
        # torch's adaptive pool uses integer start/end indices.
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -(-((i + 1) * in_size) // out_size)  # ceil
            W[i, start:end] = 1.0 / (end - start)
        return W.astype(np.float32)

    if mode == "bilinear":
        support, kernel = 1.0, _triangle_kernel
        a = None
    elif mode == "bicubic":
        support = 2.0
        a = -0.5 if antialias else -0.75
        kernel = lambda x: _cubic_kernel(x, a)  # noqa: E731
    else:
        raise ValueError(f"unsupported resize mode {mode!r}")

    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        centers = np.arange(out_size) * scale
        kscale = 1.0
    else:
        scale = (1.0 / scale_override) if scale_override else in_size / out_size
        centers = (np.arange(out_size) + 0.5) * scale - 0.5
        # Antialias widens the kernel by the downscale factor.
        kscale = max(scale, 1.0) if antialias else 1.0

    radius = support * kscale
    for i in range(out_size):
        c = centers[i]
        if antialias:
            # torch AA windows truncate at the image edge and renormalize
            # over in-bounds taps only (aten UpSampleKernel.cpp AA path).
            lo = max(0, int(c + 0.5 - radius + 0.5))
            hi = min(in_size, int(c + 0.5 + radius + 0.5))
            taps = np.arange(lo, hi)
            w = kernel((taps - c) / kscale)
            s = w.sum()
            if s != 0.0:
                w = w / s
            W[i, lo:hi] = w
        else:
            # non-AA path clamps indices: out-of-range taps fold onto the edge
            lo = int(math.floor(c)) - int(support) + 1
            taps = np.arange(lo, lo + int(2 * support))
            w = kernel(taps - c)
            s = w.sum()
            if s != 0.0:
                w = w / s
            np.add.at(W[i], np.clip(taps, 0, in_size - 1), w)

    return W.astype(np.float32)


def _apply_1d(x: jax.Array, w: np.ndarray, axis: int) -> jax.Array:
    """Contract `axis` of x with the [out,in] weight matrix on the MXU."""
    from desktop2stereo_tpu.ops.hoist import hoist_const

    # weight matrices reach many MB at 4K: under a HoistedJit they become
    # runtime arguments instead of inline HLO constants (see ops/hoist.py)
    wj = hoist_const(w.astype(np.float32, copy=False))
    if x.dtype != jnp.float32:
        wj = wj.astype(x.dtype)
    # f32 inputs demand full-precision accumulation (on TPU the MXU would
    # otherwise round operands to bf16 — ~1e-2 error, over our parity budget).
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum(
        "...i,oi->...o", x, wj, preferred_element_type=x.dtype, precision=precision
    )
    return jnp.moveaxis(y, -1, axis)


def resize(
    x: jax.Array,
    size: Tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    antialias: bool = False,
    scale_override: Optional[Tuple[float, float]] = None,
) -> jax.Array:
    """Resize NHWC / HWC / HW array to `size` (H, W), torch-parity.

    Equivalent to torch ``F.interpolate(x, size, mode=..., align_corners=...,
    antialias=...)`` on the spatial dims, for static shapes.
    `scale_override` = (sh, sw) replicates scale_factor-based calls.
    """
    h_axis = x.ndim - 3 if x.ndim >= 3 else 0
    w_axis = h_axis + 1
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = size
    sh, sw = scale_override if scale_override is not None else (None, None)
    if (in_h, in_w) == (out_h, out_w) and mode != "area" and scale_override is None:
        return x
    orig_dtype = x.dtype
    if not jnp.issubdtype(orig_dtype, jnp.floating):
        x = x.astype(jnp.float32)

    def axis_resize(y, axis, n_in, n_out):
        # Integer-factor area downscale is a uniform block mean (torch's
        # adaptive-pool indices land exactly on block edges) — a block mean
        # beats the dense [n_out, n_in] contraction by ~n_in/n_out FLOPs,
        # and it must be reduce_window, NOT reshape(-1,f).mean: the reshape
        # form is lane-shuffle-bound on TPU when `axis` is the minor (W)
        # dim (~8× slower at 4K — CLAUDE.md rule; same reason the fused
        # preprocess squeezes via reduce_window).
        sc_axis = sh if axis == h_axis else sw
        if mode == "area" and n_in % n_out == 0 and sc_axis is None:
            f = n_in // n_out
            if f == 1:
                return y
            window = [1] * y.ndim
            window[axis] = f
            summed = jax.lax.reduce_window(
                y, jnp.zeros((), y.dtype), jax.lax.add,
                tuple(window), tuple(window), "VALID")
            return summed / f
        return _apply_1d(
            y, resize_weights(n_in, n_out, mode, align_corners, antialias, sc_axis),
            axis)

    if in_h != out_h or mode == "area" or sh is not None:
        x = axis_resize(x, h_axis, in_h, out_h)
    if in_w != out_w or mode == "area" or sw is not None:
        x = axis_resize(x, w_axis, in_w, out_w)
    return x


def resize_halved(
    x: jax.Array,
    full_size: Tuple[int, int],
    halve_axis: int,
    mode: str = "bilinear",
) -> jax.Array:
    """``pair-mean-halve(resize(x, full_size))`` as ONE composed weight
    matrix on the halved axis — the Half-SBS/TAB fused tail's depth path.

    Both steps are fixed linear maps, so ``Box2 @ W_resize`` (composed on
    the host at trace time) produces the same values to f32 rounding with
    half the matmul FLOPs and no full-res intermediate in HBM.  `halve_axis` is 0 (H,
    Half-TAB) or 1 (W, Half-SBS) of the spatial dims; the full-size dim on
    that axis must be even."""
    h_axis = x.ndim - 3 if x.ndim >= 3 else 0
    out_h, out_w = full_size
    axes = (out_h, out_w)
    assert axes[halve_axis] % 2 == 0, full_size

    for ax_rel in (0, 1):
        axis = h_axis + ax_rel
        n_in = x.shape[axis]
        n_out = axes[ax_rel]
        if ax_rel == halve_axis:
            w = resize_weights(n_in, n_out, mode)
            w = 0.5 * (w[0::2] + w[1::2])  # fold the pair-mean in
            x = _apply_1d(x, w.astype(np.float32), axis)
        elif n_in != n_out:
            x = _apply_1d(x, resize_weights(n_in, n_out, mode), axis)
    return x


def patch_aligned_size(
    h: int, w: int, target: int, patch: int
) -> Tuple[int, int]:
    """Longest-side→target scale with each dim snapped to the nearest patch
    multiple (reference depth.py:676-695 `_resize_patch_aligned_t` geometry)."""
    longest = max(h, w)
    scale = target / float(longest) if longest != target else 1.0
    sh = max(1, int(round(h * scale)))
    sw = max(1, int(round(w * scale)))

    def nearest_multiple(x: int, p: int) -> int:
        down = (x // p) * p
        up = down + p
        return up if abs(up - x) <= abs(x - down) else down

    return max(patch, nearest_multiple(sh, patch)), max(patch, nearest_multiple(sw, patch))


def resize_patch_aligned(
    x: jax.Array, target: int, patch: int, antialias: bool = True
) -> jax.Array:
    """Aspect-preserving longest-side resize, patch-grid aligned, in one shot.

    Matches the reference CUDA path: bicubic + antialias (reference
    depth.py:697-699).  NHWC input.
    """
    h, w = x.shape[-3], x.shape[-2]
    nh, nw = patch_aligned_size(h, w, target, patch)
    if (nh, nw) == (h, w):
        return x
    return resize(x, (nh, nw), mode="bicubic", antialias=antialias)
