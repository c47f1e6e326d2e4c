"""Fused int8 dense kernel: quantize → int8×int8 MXU matmul → dequant.

The XLA formulation of QuantDense (ops/quant.py xla_quant_dense)
materializes three intermediates per matmul — the int8 activation tensor,
the int32 accumulator, and the f32 rescale — i.e. ~2.5 extra HBM passes
around the MXU op.  At ViT-L's sizes that overhead eats most of int8's 2×
MXU-rate win.  This kernel keeps the whole chain in VMEM: each grid step
loads a (row, feature) tile pair, computes the per-row (per-token)
activation scales and quantizes in-register, runs the int8×int8→int32 dot
on the MXU, and applies the f32 rescale + bias epilogue before the single
bf16/f32 output write.

HBM traffic: read x once per feature-tile sweep (the row tile stays
resident while the feature index varies — the grid iterates the feature
axis fastest), read the int8 kernel once per row tile, write the float
output once — nothing int8/int32 ever hits HBM, and unlike the XLA form
there is no separate scale-reduction pass at all.

Tiling: grid (rows/tm, F/tf) with tf ≤ 512 so no block exceeds ~2 MB —
the whole working set (x tile + weight tile + out tile, double-buffered)
stays ≪ the ~16 MB/core VMEM budget even for DA3-Giant's [1536, 8192]
SwiGLU weights.

Quantization scheme (matches xla_quant_dense bit-exactly): symmetric,
zero-point-free, per-row dynamic activation scales × per-output-channel
weight scales.  Analog of the reference's TensorRT INT8 engine path
(reference depth.py:1049-1118); follows the guide's quantization-kernel
pattern.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(*refs, has_bias: bool, has_sx: bool, out_dtype):
    """Unpack the positional ref list (x, wq, scale[, bias][, sx], out)
    according to the optional-input flags and run the tile body."""
    it = iter(refs)
    x_ref, wq_ref, scale_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    sx_ref = next(it) if has_sx else None
    out_ref = next(it)
    _body(x_ref, wq_ref, scale_ref, bias_ref, sx_ref, out_ref, out_dtype)


def _body(x_ref, wq_ref, scale_ref, bias_ref, sx_ref, out_ref, out_dtype):
    """One (row, feature) tile: per-row quantize, int8 MXU dot, rescale."""
    xf = x_ref[...].astype(jnp.float32)
    if sx_ref is not None:
        # caller-supplied per-row scales — the row-parallel TP path, where
        # the abs-max must span the FULL K dim, not this shard's slice
        sx = sx_ref[...]
    else:
        # per-row dynamic scale — same clamp/round as dynamic_quantize_rows
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if out_dtype == jnp.int32:
        # raw-accumulator mode (row-parallel TP): the caller psums the
        # exact int32 partials across shards and dequantizes AFTER — f32
        # partial rescales would reorder the summation and flip downstream
        # int8 rounding decisions, compounding through the encoder
        out_ref[...] = acc
        return
    out = acc.astype(jnp.float32) * (sx * scale_ref[0, :][None, :])
    if bias_ref is not None:
        out = out + bias_ref[0, :][None, :]
    out_ref[...] = out.astype(out_dtype)


# Test/tuning override: None = platform dispatch, True/False forces.
FORCE_KERNEL: Optional[bool] = None

# K scales the x tile (tm·K·4 B f32) and weight tile (K·tf B int8); at
# K=8192 the double-buffered working set is ~22 MB — past ~16 MB/core
# VMEM already needs the compiler to narrow tiles, so stop there.  Every
# registry model's widest K is 4096 (ViT-L fc2) / 6144 (ViT-G w3).
_MAX_K = 8192

# Lazy one-time Mosaic probe: a compile failure inside an OUTER jit trace
# surfaces at the outer compile where QuantDense's try/except can't catch
# it, so prove the kernel compiles on this backend once, eagerly, before
# ever dispatching it from inside a trace.
_PROBE_OK: Optional[bool] = None


def probe() -> bool:
    """Compile+run the kernel once on a tiny shape; cache the verdict."""
    global _PROBE_OK
    if _PROBE_OK is None:
        try:
            import numpy as np

            out = quant_dense_matmul(
                jnp.ones((8, 128), jnp.float32),
                jnp.ones((128, 128), jnp.int8),
                jnp.ones((128,), jnp.float32),
            )
            _PROBE_OK = bool(np.isfinite(np.asarray(out)).all())
        except Exception:
            _PROBE_OK = False
    return _PROBE_OK


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def quant_dense_matmul(
    x: jax.Array,         # [..., K] float activations
    kernel_q: jax.Array,  # [K, F] int8
    scale: jax.Array,     # [F] f32 per-output-channel weight scales
    bias: Optional[jax.Array] = None,  # [F]
    row_scale: Optional[jax.Array] = None,  # [..., 1] f32 per-row act scales
    interpret: bool = False,
    out_dtype=None,       # default x.dtype; f32 for row-parallel partials
) -> jax.Array:
    """Fused QuantDense forward; returns [..., F] in out_dtype (x.dtype).

    Numerics match ops/quant.py xla_quant_dense exactly: same per-row
    dynamic activation scales, same round/clip, f32 epilogue.  `row_scale`
    overrides the in-kernel abs-max — the row-parallel TP path supplies
    scales spanning the full (unsharded) K dim so per-shard quantization
    matches the single-chip result (and takes f32 partials out, so the
    cross-shard psum accumulates before the final cast).
    """
    K, F = kernel_q.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # Row tile: big enough to keep the MXU busy; feature tile: ≤512 lanes
    # so weight (K×tf int8) and out (tm×tf f32) blocks stay ~≤2 MB each.
    tm = 256 if M >= 256 else _round_up(max(M, 8), 8)
    tf = min(512, _round_up(F, 128))
    nm, nf = pl.cdiv(M, tm), pl.cdiv(F, tf)

    in_specs = [
        pl.BlockSpec((tm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tf), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x2, kernel_q, scale.astype(jnp.float32).reshape(1, F)]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32).reshape(1, F))
    if row_scale is not None:
        in_specs.append(
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM))
        args.append(row_scale.astype(jnp.float32).reshape(M, 1))
    out_dtype = x.dtype if out_dtype is None else out_dtype
    kernel = functools.partial(
        _kernel, has_bias=bias is not None, has_sx=row_scale is not None,
        out_dtype=out_dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, F), out_dtype),
        grid=(nm, nf),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tf), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(*lead, F)


def supported(kernel_q: jax.Array) -> bool:
    """Shapes the kernel accepts: lane-aligned K of bounded size (every
    block is tiled small, so F is unconstrained)."""
    K, _ = kernel_q.shape
    return K % 128 == 0 and K <= _MAX_K
