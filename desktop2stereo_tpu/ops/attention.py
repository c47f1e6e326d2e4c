"""Attention dispatch: Pallas flash kernel on TPU, XLA softmax elsewhere.

Replaces the reference's xformers memory-efficient attention
(reference models/.../dinov2_layers/attention.py:20-82) and SDP-backend
selection (reference depth.py:184-190) with a single entry point.  Layout is
[B, N, H, hd] (BNHD) throughout.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _platform() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "cpu"


def xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """Plain softmax attention; f32 accumulation for the logits/softmax.
    `bias` [H,N,M] (or broadcastable) is added to the scaled logits — the
    BEiT relative-position-bias hook."""
    B, N, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v, preferred_element_type=q.dtype)


# Test/tuning override: None = size-based dispatch, True/False forces.
FORCE_FLASH: Optional[bool] = None


def _sharded_flash(ctx, q, k, v) -> jax.Array:
    """Run the flash kernel per-shard under a TP/SP trace.

    A bare pallas_call is an opaque custom call to GSPMD, which would
    gather/replicate its operands per layer — so instead shard_map splits
    the HEAD axis over the model axis (attention is embarrassingly parallel
    over heads between the column-parallel qkv and row-parallel proj; the
    Megatron decomposition) and the batch over the data axis, and each
    shard runs the Pallas kernel on its local [B/dp, N, H/tp, hd] block.
    Interpret mode keeps the kernel in the graph on CPU meshes (the
    multichip dryrun), compiling to the real Mosaic kernel on TPU.
    """
    from jax.sharding import PartitionSpec as P

    from desktop2stereo_tpu.core.runtime import DATA_AXIS, MODEL_AXIS
    from desktop2stereo_tpu.ops.pallas.flash_attention import flash_attention

    spec = P(DATA_AXIS, None, MODEL_AXIS, None)
    interp = _platform() != "tpu"

    def local(ql, kl, vl):
        return flash_attention(ql, kl, vl, interpret=interp)

    # check_vma=False: pallas out_shapes carry no vma annotation, which the
    # checker rejects; there are no collectives inside to validate anyway
    return jax.shard_map(
        local, mesh=ctx.mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    use_flash: Optional[bool] = None,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """[B,N,H,hd] q/k/v → [B,N,H,hd] attention output.

    On TPU with flash-compatible shapes, uses the Pallas kernel
    (ops/pallas/flash_attention.py); otherwise the XLA path.  Both paths are
    numerically equivalent within bf16 tolerance.

    Dispatch is by total logits volume, not just sequence length: XLA's
    materialized B·H·N² f32 logits are the bottleneck, so a big BATCH of
    short sequences (DepthPro's 36-tile pyramid: 36×16×730² → 4.1 ms/layer
    XLA vs 2.3 ms flash) needs the kernel as much as one long sequence
    (N=5548: 130 ms XLA vs 2.1 ms flash).  Below ~32M logits both paths are
    sub-ms and XLA's fused softmax wins slightly.

    Under a `parallel_frame_apply` trace (TP/SP mesh), the kernel runs
    per-shard via shard_map over the head axis (see _sharded_flash); shapes
    that don't divide the mesh fall back to the XLA path, which GSPMD
    shards exactly.
    """
    if use_flash is None:
        use_flash = FORCE_FLASH

    from desktop2stereo_tpu.parallel.sharding import current_context

    ctx = current_context()
    if ctx is not None:
        # ANY parallel trace — including a pure-DP mesh (tp==1, where the
        # head spec is a no-op): a bare pallas_call is opaque to GSPMD and
        # would gather/replicate operands, so the kernel must always enter
        # the graph through _sharded_flash's shard_map
        B, N, H, _ = q.shape
        fits = bias is None and H % ctx.tp == 0 and B % ctx.dp == 0
        if use_flash is None:
            # per-shard logits volume decides, same threshold as below
            use_flash = (
                _platform() == "tpu"
                and (N >= 1024
                     or (B // ctx.dp) * (H // ctx.tp) * N * N >= 32_000_000)
            )
        if use_flash and fits:
            try:
                return _sharded_flash(ctx, q, k, v)
            except Exception:
                pass  # shard_map/pallas unavailable → GSPMD-sharded XLA
        if fits:
            # pin the Megatron layout (heads sharded, tokens gathered) so
            # the softmax reduces over LOCAL key tokens: under SP, GSPMD
            # would otherwise shard the key dim and reorder the max/sum —
            # harmless in f32, but int8 models amplify the reordering
            # through downstream round() decisions
            from jax.sharding import NamedSharding, PartitionSpec as P

            from desktop2stereo_tpu.core.runtime import DATA_AXIS, MODEL_AXIS

            s = NamedSharding(ctx.mesh, P(DATA_AXIS, None, MODEL_AXIS, None))
            q, k, v = (jax.lax.with_sharding_constraint(t, s)
                       for t in (q, k, v))
        return xla_attention(q, k, v, bias)

    if use_flash is None:
        B, N, H, _ = q.shape
        use_flash = (
            _platform() == "tpu" and bias is None
            and (N >= 1024 or B * H * N * N >= 32_000_000)
        )
    if use_flash and bias is None:
        try:
            from desktop2stereo_tpu.ops.pallas.flash_attention import flash_attention

            return flash_attention(q, k, v)
        except Exception:
            pass  # pallas unavailable / unsupported shape → XLA fallback
    return xla_attention(q, k, v, bias)
