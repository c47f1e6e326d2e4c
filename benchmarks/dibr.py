"""TPU timing: fused half_sbs_u8 planar kernel vs old eyes+XLA-compose path."""
import jax
import jax.numpy as jnp
import numpy as np

from desktop2stereo_tpu.core.runtime import setup_compilation_cache
from desktop2stereo_tpu.ops.pallas.dibr import (
    dibr_render_pair, dibr_render_pair_planar, pad_planar, pair_tiling,
)
from desktop2stereo_tpu.ops.stereo import compose_display

setup_compilation_cache()

H, W = 2160, 3840
rng = np.random.default_rng(0)
rgb = jax.device_put(rng.random((H, W, 3), np.float32) * 255.0)
depth = jax.device_put(rng.random((H, W), np.float32))
hp, wp, _ = pair_tiling(H, W)
rgbp = jax.device_put(rng.random((3, hp, wp), np.float32) * 255.0)
depp = jax.device_put(rng.random((1, hp, wp), np.float32))

try:
    from benchmarks._timing import timeit
except ImportError:
    from _timing import timeit


@jax.jit
def old_path(r, d):
    l, rr = dibr_render_pair(r, d, ipd=0.064, depth_strength=2.0)
    out = compose_display(l, rr, "Half-SBS")
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)

@jax.jit
def fused(rp, dp):
    out = dibr_render_pair_planar(rp, dp, W, ipd=0.064, depth_strength=2.0,
                                  out_mode="half_sbs_u8")
    return out.transpose(1, 2, 0)[:H, :W]

@jax.jit
def fused_planar_out(rp, dp):
    return dibr_render_pair_planar(rp, dp, W, ipd=0.064, depth_strength=2.0,
                                   out_mode="half_sbs_u8")

@jax.jit
def pad_only(r, d):
    return pad_planar(r, d)

timeit("old: pair + XLA compose + cast", old_path, rgb, depth)
timeit("fused kernel + u8 transpose to HWC", fused, rgbp, depp)
timeit("fused kernel, planar u8 out (no transp)", fused_planar_out, rgbp, depp)
timeit("pad/transpose glue (HWC->planar)", pad_only, rgb, depth)

out_a = np.asarray(fused(rgbp, depp))
print("fused output ok:", out_a.shape, out_a.dtype, out_a[::700, ::900, 0].tolist())

# --- production arrangement: half-width eyes at OUTPUT size -----------------
# 4K Half-SBS: each eye renders at [2160, 1920] from the pair-mean-squeezed
# source.  eyes_u8 needs an XLA concat + CHW→HWC transpose after the kernel;
# sbs_hwc_u8 emits the final interleaved layout (row crop + free reshape).
EH, EW = H, W // 2
hp2, wp2, _ = pair_tiling(EH, EW)
rgb_h = jax.device_put(rng.random((3, hp2, wp2), np.float32) * 255.0)
dep_h = jax.device_put(rng.random((1, hp2, wp2), np.float32))


@jax.jit
def prod_eyes_u8(rp, dp):
    l, r = dibr_render_pair_planar(rp, dp, EW, ipd=0.064, depth_strength=2.0,
                                   out_mode="eyes_u8")
    return jnp.concatenate(
        [l[:, :EH, :EW], r[:, :EH, :EW]], axis=2).transpose(1, 2, 0)


@jax.jit
def prod_sbs_hwc(rp, dp):
    flat = dibr_render_pair_planar(rp, dp, EW, ipd=0.064, depth_strength=2.0,
                                   out_mode="sbs_hwc_u8")
    return flat[:EH].reshape(EH, 2 * EW, 3)


timeit("PROD eyes_u8 + XLA concat/transpose", prod_eyes_u8, rgb_h, dep_h)
timeit("PROD sbs_hwc_u8 (in-kernel HWC)", prod_sbs_hwc, rgb_h, dep_h)
a = np.asarray(prod_eyes_u8(rgb_h, dep_h)).astype(np.int32)
b = np.asarray(prod_sbs_hwc(rgb_h, dep_h)).astype(np.int32)
print("prod parity max |Δ|:", np.abs(a - b).max())
