"""Pallas TPU attention kernel for ViT-scale sequences.

Replaces the reference's xformers memory-efficient attention (reference
models/.../dinov2_layers/attention.py:20-82).  ViT encoders here see
N ≈ 200…5500 tokens (e.g. 37²+1 = 1370 at 518²), head_dim 64: full K/V for
one head fits comfortably in VMEM, so instead of a streaming-softmax flash
loop we use a single-pass blocked kernel — each grid step computes one query
block against the whole key/value set, with the softmax entirely on-chip.
The N×N logits matrix never touches HBM (the win over the XLA path, which
materializes ~B·H·N²·4 bytes per layer — 130 ms vs 2.1 ms at N=5548 on v5e).

Performance notes (measured v5e):
- q/k/v stay bf16 INTO the dots with f32 accumulation — pre-casting inputs
  to f32 halves MXU rate;
- the query block is chosen adaptively: as large as the ~10 MB VMEM logits
  budget allows (whole-sequence for ViT frames).  At DepthPro's tile batch
  (36×16 heads × 730 tokens) this runs 2.3 ms vs 4.1 ms for XLA attention.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this sequence length the single-pass kernel's K/V VMEM footprint
# stops fitting; fall back to XLA.
MAX_SEQ_SINGLE_PASS = 8192
MIN_BLOCK_Q = 128
# f32 logits VMEM budget per grid step (v5e scoped vmem is 16 MB; leave
# room for K/V + q + out blocks).
LOGITS_VMEM_BUDGET = 10 * 1024 * 1024
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block_q(n: int) -> int:
    """Largest power-of-2 fraction of the padded sequence whose f32 logits
    block fits the VMEM budget.  Halving from n_pad keeps divisibility."""
    n_pad = _round_up(n, MIN_BLOCK_Q)
    bq = n_pad
    while bq > MIN_BLOCK_Q and bq * n_pad * 4 > LOGITS_VMEM_BUDGET:
        bq //= 2
    return max(bq, MIN_BLOCK_Q)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    q = q_ref[0]                                 # [BQ, hd] (bf16 in, f32 acc)
    k = k_ref[0]                                 # [N_pad, hd]
    v = v_ref[0]                                 # [N_pad, hd]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # [BQ, N_pad] f32

    n_pad = k.shape[0]
    if n_pad != n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_valid, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / s).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """[B,N,H,hd] q/k/v → [B,N,H,hd]; softmax(QKᵀ/√hd)V, non-causal."""
    B, N, H, hd = q.shape
    if N > MAX_SEQ_SINGLE_PASS:
        from desktop2stereo_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v)

    scale = 1.0 / math.sqrt(hd)
    block_q = _pick_block_q(N)
    n_pad = _round_up(N, block_q)

    def to_bh(t):
        t = t.transpose(0, 2, 1, 3).reshape(B * H, N, hd)
        if n_pad != N:
            t = jnp.pad(t, ((0, 0), (0, n_pad - N), (0, 0)))
        return t

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    grid = (B * H, n_pad // block_q)
    itemsize = jnp.dtype(q.dtype).itemsize
    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=N, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hd), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, hd), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                1.2 * (block_q * n_pad * 4 + 2 * n_pad * hd * itemsize
                       + 3 * block_q * hd * itemsize) + 1_000_000
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * hd,
            bytes_accessed=(3 * B * H * N * hd + B * H * N * hd) * itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :N].reshape(B, H, N, hd).transpose(0, 2, 1, 3)
    return out
