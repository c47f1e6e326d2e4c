"""Decompose the fused Half-SBS tail at the flagship 4K shape: what of the
tail_ms is depth-post / resize / squeeze glue vs the Pallas pair kernel,
and how the out_mode variants compare IN CONTEXT (not as isolated
microbenches — benchmarks/dibr.py showed eyes_u8+XLA-relayout beating the
in-kernel interleave, this confirms it inside the real tail program)."""
import numpy as np

from desktop2stereo_tpu.core.runtime import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.depth_post import ema as ema_op
from desktop2stereo_tpu.ops.depth_post import post_process_depth
from desktop2stereo_tpu.ops.pallas.dibr import (
    dibr_render_pair_planar, pair_tiling)
from desktop2stereo_tpu.ops.resize import resize

try:
    from benchmarks._timing import timeit
except ImportError:
    from _timing import timeit

OH, OW = 2160, 3840
MH, MW = 294, 518
EH, EW = OH, OW // 2

rng = np.random.default_rng(0)
raw = jax.device_put(rng.random((MH, MW), np.float32).astype(np.float32))
ema_prev = jax.device_put(np.full((MH, MW), np.nan, np.float32))
planar = jax.device_put((rng.random((3, OH, OW)) * 255.0).astype(np.float32))

hp2, wp2, _ = pair_tiling(EH, EW)
rgb_h_dev = jax.device_put((rng.random((3, hp2, wp2)) * 255.0).astype(np.float32))
dep_h_dev = jax.device_put(rng.random((1, hp2, wp2)).astype(np.float32))

KW = dict(ipd=0.064, depth_strength=2.0, convergence=0.0)


@jax.jit
def post_small(r, e):
    d = post_process_depth(r, metric=False, foreground_scale=0.0,
                           aa_strength=1.0)
    s = ema_op(e, d, 0.9)
    return jnp.where(jnp.isnan(e), d, s)


@jax.jit
def upsample(s):
    return resize(s[..., None], (OH, OW), mode="bilinear")[..., 0]


@jax.jit
def squeeze(p, d):
    rgb_h = jax.lax.reduce_window(p, 0.0, jax.lax.add, (1, 1, 2), (1, 1, 2),
                                  "VALID") * 0.5
    dep_h = jax.lax.reduce_window(d, 0.0, jax.lax.add, (1, 2), (1, 2),
                                  "VALID") * 0.5
    rgb_h = jnp.pad(rgb_h, ((0, 0), (0, hp2 - EH), (0, wp2 - EW)),
                    mode="edge")
    dep_h = jnp.pad(dep_h, ((0, hp2 - EH), (0, wp2 - EW)), mode="edge")
    return rgb_h, dep_h


@jax.jit
def kernel_hwc(rp, dp):
    flat = dibr_render_pair_planar(rp, dp, EW, out_mode="sbs_hwc_u8", **KW)
    return flat[:EH].reshape(EH, 2 * EW, 3)


@jax.jit
def kernel_eyes_u8_relayout(rp, dp):
    l, r = dibr_render_pair_planar(rp, dp, EW, out_mode="eyes_u8", **KW)
    return jnp.concatenate(
        [l[:, :EH, :EW], r[:, :EH, :EW]], axis=2).transpose(1, 2, 0)


@jax.jit
def full_tail_hwc(r, e, p):
    s = post_small(r, e)
    d = upsample(s)
    rgb_h, dep_h = squeeze(p, d)
    return kernel_hwc(rgb_h, dep_h[None]), s


@jax.jit
def full_tail_eyes(r, e, p):
    s = post_small(r, e)
    d = upsample(s)
    rgb_h, dep_h = squeeze(p, d)
    return kernel_eyes_u8_relayout(rgb_h, dep_h[None]), s


@jax.jit
def full_tail_direct_resize(r, e, p):
    """Variant: resize depth DIRECTLY to the eye grid (per-eye-viewport
    texture sampling, exactly what the reference's GL shader does) instead
    of full-res resize + pair-mean."""
    s = post_small(r, e)
    d_h = resize(s[..., None], (EH, EW), mode="bilinear")[..., 0]
    rgb_h = jax.lax.reduce_window(p, 0.0, jax.lax.add, (1, 1, 2), (1, 1, 2),
                                  "VALID") * 0.5
    rgb_h = jnp.pad(rgb_h, ((0, 0), (0, hp2 - EH), (0, wp2 - EW)),
                    mode="edge")
    d_h = jnp.pad(d_h, ((0, hp2 - EH), (0, wp2 - EW)), mode="edge")
    l, rr = dibr_render_pair_planar(rgb_h, d_h[None], EW, out_mode="eyes_u8",
                                    **KW)
    return jnp.concatenate(
        [l[:, :EH, :EW], rr[:, :EH, :EW]], axis=2).transpose(1, 2, 0), s


timeit("post_small (518)", post_small, raw, ema_prev)
timeit("upsample 518->4K", upsample, post_small(raw, ema_prev))
timeit("squeeze rgb+depth", squeeze, planar, upsample(post_small(raw, ema_prev)))
timeit("kernel sbs_hwc_u8", kernel_hwc, rgb_h_dev, dep_h_dev)
timeit("kernel eyes_u8 + XLA relayout", kernel_eyes_u8_relayout,
       rgb_h_dev, dep_h_dev)
timeit("FULL tail (hwc kernel)", full_tail_hwc, raw, ema_prev, planar)
timeit("FULL tail (eyes_u8 + relayout)", full_tail_eyes, raw, ema_prev, planar)
timeit("FULL tail (direct depth resize)", full_tail_direct_resize,
       raw, ema_prev, planar)

a = np.asarray(full_tail_hwc(raw, ema_prev, planar)[0]).astype(np.int32)
b = np.asarray(full_tail_eyes(raw, ema_prev, planar)[0]).astype(np.int32)
c = np.asarray(full_tail_direct_resize(raw, ema_prev, planar)[0]).astype(np.int32)
print("relayout parity |Δ|max:", np.abs(a - b).max())
print("direct-resize drift |Δ|max:", np.abs(a - c).max(),
      " mean:", np.abs(a - c).mean().round(4))
