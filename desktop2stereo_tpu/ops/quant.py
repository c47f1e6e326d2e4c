"""Int8 quantized inference building blocks (opt-in, `--quant int8`).

The TPU-native analog of the reference's TensorRT INT8/FP8 engine options
(reference depth.py:1049-1118 builder flags): the v5e MXU runs int8 at 2x
the bf16 rate (394 vs 197 TOPS), and ~95% of a ViT encoder's FLOPs sit in
four Dense matmuls per layer — so those go int8 x int8 -> int32 while
everything else (patch embed, LayerNorms, attention, the DPT decoder)
stays in the bf16 path.

Scheme: symmetric, zero-point-free.
- Weights: per-output-channel scales, quantized ONCE at load time
  (`quantize_tree`), stored int8 in the param tree (also halves weight HBM
  traffic vs bf16).
- Activations: dynamic per-row (per-token) abs-max scales, computed per
  call — no calibration set needed (the app sees arbitrary desktops, so
  static activation ranges would be wrong anyway), and outlier tokens
  don't crush other tokens' resolution (~13× lower mean error than a
  per-tensor scale on outlier-bearing activations).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array):
    """[in, out] float kernel → (int8 kernel, [out] f32 scales).

    Symmetric per-output-channel: scale = absmax/127 per column."""
    w = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def dynamic_quantize(x: jax.Array):
    """float activations → (int8, scalar f32 scale), per-tensor abs-max."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(ax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dynamic_quantize_rows(x2: jax.Array):
    """[M, K] float activations → (int8 [M, K], f32 scales [M, 1]),
    per-row (= per-token) abs-max.  Outlier tokens stop crushing other
    tokens' resolution vs the per-tensor scheme — the standard dynamic
    int8 recipe for transformer activations."""
    xf = x2.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                        1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127)
    return q.astype(jnp.int8), scale


def xla_quant_dense(x: jax.Array, kernel_q: jax.Array, scale: jax.Array,
                    bias=None) -> jax.Array:
    """The canonical XLA int8 formulation: dynamic per-row (per-token)
    activation quantize → int8×int8→int32 dot → f32 rescale (+bias), cast
    to x.dtype.  QuantDense's fallback path and the parity oracle for the
    fused Pallas kernel (bench.py kernel_parity, tests, benchmarks) — ONE
    copy, so the scheme can't drift between module and oracles."""
    d_in = x.shape[-1]
    lead = x.shape[:-1]
    xq, sx = dynamic_quantize_rows(x.reshape(-1, d_in))
    acc = jax.lax.dot_general(
        xq, kernel_q,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sx * scale.astype(jnp.float32)[None, :])
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.reshape(*lead, kernel_q.shape[1]).astype(x.dtype)


def tp_quant_dense(ctx, x: jax.Array, kernel_q: jax.Array,
                   scale: jax.Array, bias, role: "str | None"):
    """Fused int8 kernel under a TP trace, or None when shapes don't fit.

    A bare pallas_call is opaque to GSPMD, so the kernel runs per-shard via
    `jax.shard_map` along its Megatron role: column-parallel layers split F
    (each chip produces its feature slice, no collective), row-parallel
    layers split K (each chip contributes a partial matmul, psum'd inside
    the map).  Row-parallel activation scales must span the FULL K dim to
    match single-chip numerics, so they're computed outside the map (GSPMD
    inserts the cross-shard max) and fed to the kernel as `row_scale`.
    Interpret mode keeps the kernel in the graph on CPU meshes (the
    multichip dryrun); on TPU it compiles to the real Mosaic kernel.
    """
    from jax.sharding import PartitionSpec as P

    from desktop2stereo_tpu.core.runtime import DATA_AXIS, MODEL_AXIS
    from desktop2stereo_tpu.ops.pallas import quant_matmul as qm

    if x.ndim != 3 or role not in ("col", "row"):
        return None
    B, N, K = x.shape
    _, F = kernel_q.shape
    tp, dp = ctx.tp, ctx.dp
    if B % dp:
        return None
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    interp = platform != "tpu"
    if not interp and not qm.probe():
        return None

    if role == "col":
        if F % tp or not qm.supported(kernel_q):
            return None
        x_spec = P(DATA_AXIS, None, None)
        in_specs = [x_spec, P(None, MODEL_AXIS), P(MODEL_AXIS)]
        args = [x, kernel_q, scale]
        if bias is not None:
            in_specs.append(P(MODEL_AXIS))
            args.append(bias)

        def local_col(xl, wq, s, b=None):
            return qm.quant_dense_matmul(xl, wq, s, b, interpret=interp)

        # check_vma=False: pallas out_shapes carry no vma annotation
        return jax.shard_map(
            local_col, mesh=ctx.mesh, in_specs=tuple(in_specs),
            out_specs=P(DATA_AXIS, None, MODEL_AXIS), check_vma=False,
        )(*args)

    # row-parallel: K splits; per-shard K must still satisfy the kernel's
    # lane alignment
    k_local = K // tp
    if K % tp or k_local % 128 or k_local > qm._MAX_K:
        return None
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0  # [B,N,1], full-K abs-max

    def local_row(xl, sxl, wq):
        # raw int32 accumulators out: integer psum is exact and
        # order-free, so the sharded result is BIT-IDENTICAL to the
        # single-chip kernel (f32 partial rescales would reorder the sum
        # and flip downstream int8 rounding, compounding per layer)
        acc = qm.quant_dense_matmul(
            xl, wq, jnp.ones((wq.shape[1],), jnp.float32),
            row_scale=sxl, interpret=interp, out_dtype=jnp.int32)
        return jax.lax.psum(acc, MODEL_AXIS)

    acc = jax.shard_map(
        local_row, mesh=ctx.mesh,
        in_specs=(P(DATA_AXIS, None, MODEL_AXIS), P(DATA_AXIS, None, None),
                  P(MODEL_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None), check_vma=False,
    )(x, sx, kernel_q)
    out = acc.astype(jnp.float32) * (sx * scale.astype(jnp.float32)[None, None, :])
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, None, :]
    return out.astype(x.dtype)


def _use_kernel(kernel_q: jax.Array) -> bool:
    """Fused Pallas path on TPU (ops/pallas/quant_matmul.py — one kernel
    instead of quantize/matmul/dequant as three XLA passes); the plain XLA
    formulation elsewhere and for shapes the kernel rejects."""
    from desktop2stereo_tpu.ops.pallas import quant_matmul as qm

    if qm.FORCE_KERNEL is not None:
        return qm.FORCE_KERNEL
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    # qm.probe() compiles the kernel ONCE eagerly: a Mosaic failure during
    # an outer jit trace would surface at the outer compile, past the
    # dispatch try/except — prove it here instead.
    return platform == "tpu" and qm.supported(kernel_q) and qm.probe()


class QuantDense(nn.Module):
    """Drop-in for nn.Dense with an int8 x int8 → int32 MXU matmul.

    Params: `kernel_q` [in, out] int8, `scale` [out] f32, `bias` [out] —
    produced from a float tree by `quantize_tree`, never by random init
    (init here creates float-shaped placeholders so jit_init works; the
    factory always passes the tree through quantize_tree for quant mode).
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_in = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (d_in, self.features),
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        from desktop2stereo_tpu.parallel.sharding import (
            current_context,
            megatron_role,
        )

        ctx = current_context()
        if ctx is not None:
            # ANY parallel trace — including pure DP (tp==1), where a bare
            # pallas_call would be opaque to GSPMD: run the fused kernel
            # per-shard along this Dense's Megatron role; shapes that don't
            # divide the mesh use the XLA formulation, which GSPMD shards
            # exactly.
            out = tp_quant_dense(ctx, x, kernel_q, scale, bias,
                                 megatron_role(self.name or ""))
            if out is not None:
                return out
            return xla_quant_dense(x, kernel_q, scale, bias)

        rows = x.size // d_in if x.size else 0
        if rows >= 8 and _use_kernel(kernel_q):
            from desktop2stereo_tpu.ops.pallas.quant_matmul import (
                quant_dense_matmul,
            )

            try:
                return quant_dense_matmul(x, kernel_q, scale, bias)
            except Exception:
                pass  # pallas unavailable / unsupported shape → XLA fallback

        return xla_quant_dense(x, kernel_q, scale, bias)


# Dense param names the encoder quantizes (dinov2.py module names).
_QUANT_DENSE_NAMES = frozenset(
    {"qkv", "proj", "fc1", "fc2", "weights_in", "weights_out",
     "w12", "w3",           # DA3 ViT-G SwiGLU naming
     "w1", "w2",            # InfiniDepth DINOv3 SwiGLU naming
     "query", "key", "value"})  # BEiT separate-QKV naming


def quantize_tree(params: Any, scope="backbone") -> Any:
    """Walk a float param tree and convert every targeted Dense
    ({kernel, bias}) under the `scope` subtree(s) into QuantDense form
    ({kernel_q, scale, bias}).  `scope` is one encoder subtree name or a
    tuple of them (DepthPro has two ViT towers: patch_encoder +
    image_encoder).

    Conversion applies only BENEATH a dict key in `scope` (the ViT trunk)
    to dicts whose KEY is in the encoder's quantized-Dense name set with a
    2D kernel — the patch embed, decoder modules (which may reuse names
    like "proj"), and every non-encoder Dense pass through untouched."""
    scopes = (scope,) if isinstance(scope, str) else tuple(scope)

    def walk(name: str, node: Any, in_scope: bool) -> Any:
        if isinstance(node, dict):
            if (in_scope and name in _QUANT_DENSE_NAMES and "kernel" in node
                    and getattr(node["kernel"], "ndim", 0) == 2):
                q, scale = quantize_weight(node["kernel"])
                out: Dict[str, Any] = {"kernel_q": q, "scale": scale}
                if "bias" in node:
                    out["bias"] = jnp.asarray(node["bias"], jnp.float32)
                return out
            return {k: walk(k, v, in_scope or k in scopes)
                    for k, v in node.items()}
        return node

    return walk("", params, False)
