"""DINOv2 ViT encoder (flax.linen), the backbone of the Depth-Anything family.

Re-implements the math of the HF `Dinov2Backbone` the reference loads through
AutoModelForDepthEstimation (reference depth.py:1645-1662): patch14 conv
embedding + cls token + bicubically interpolated position embeddings,
pre-norm blocks with LayerScale, exact-GELU (or SwiGLU for giant) MLPs, and a
final LayerNorm applied to each selected hidden state.

TPU-first choices (not a torch translation):
- NHWC layout; the 14x14/s14 patch conv is a reshape + one einsum (pure MXU).
- QKV fused into a single [D, 3D] matmul (converter concatenates HF q/k/v).
- Attention dispatches to a Pallas flash-attention kernel on TPU and falls
  back to the XLA softmax path elsewhere (ops/attention.py).
- Position-embedding interpolation is static-shape (per compiled input size)
  so the whole encoder jits into one program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu

from desktop2stereo_tpu.ops.attention import multi_head_attention
from desktop2stereo_tpu.ops.resize import resize


class PatchEmbed(nn.Module):
    hidden_size: int
    patch_size: int = 14

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels [B,H,W,3] → tokens [B, gh*gw, D].

        Equivalent to Conv2d(3, D, k=p, s=p): reshape into patch vectors and
        one einsum — lowers to a single MXU matmul instead of a conv.
        """
        B, H, W, C = pixels.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p * p * C, self.hidden_size)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden_size,))
        if (gh * p, gw * p) != (H, W):
            # valid-padding conv semantics: a stride-p conv drops the
            # sub-patch remainder (DepthPro runs DINOv2/14 on 384px tiles →
            # 27×27 patches, 6px discarded, matching HF's Conv2d patchify)
            pixels = pixels[:, : gh * p, : gw * p]
        x = pixels.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = jnp.einsum(
            "bnd,de->bne", x, kernel.astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        return x + bias.astype(x.dtype)


class Dinov2Embeddings(nn.Module):
    hidden_size: int
    patch_size: int = 14
    pretrain_grid: int = 37  # 518/14; position table is pretrain_grid²+1
    # Original (non-HF) dinov2 interpolates pos embeddings with a 0.1
    # scale-factor offset (VDA checkpoints); HF uses plain size-based.
    interpolate_offset: float = 0.0

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        B, H, W, _ = pixels.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        tokens = PatchEmbed(self.hidden_size, self.patch_size, name="patch_embeddings")(pixels)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden_size))
        pos = self.param(
            "position_embeddings",
            nn.initializers.zeros,
            (1, self.pretrain_grid * self.pretrain_grid + 1, self.hidden_size),
        )

        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            # HF interpolates in f32 bicubic align_corners=False
            # (modeling_dinov2.py interpolate_pos_encoding).
            grid = patch_pos.reshape(self.pretrain_grid, self.pretrain_grid, self.hidden_size)
            M = self.pretrain_grid
            scale = (
                ((gh + self.interpolate_offset) / M, (gw + self.interpolate_offset) / M)
                if self.interpolate_offset else None
            )
            grid = resize(grid.astype(jnp.float32), (gh, gw), mode="bicubic",
                          scale_override=scale)
            patch_pos = grid.reshape(1, gh * gw, self.hidden_size)
        pos_full = jnp.concatenate([cls_pos, patch_pos.astype(pos.dtype)], axis=1)

        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.hidden_size)).astype(tokens.dtype), tokens], axis=1)
        return x + pos_full.astype(tokens.dtype)


def _dense(features: int, name: str, dtype, quant: bool,
           use_bias: bool = True):
    """nn.Dense, or the int8 QuantDense when the encoder runs quantized
    (ops/quant.py; the reference's TRT INT8 engine analog)."""
    if quant:
        from desktop2stereo_tpu.ops.quant import QuantDense

        return QuantDense(features, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, name=name, dtype=dtype)


class Mlp(nn.Module):
    hidden_size: int
    mlp_dim: int
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _dense(self.mlp_dim, "fc1", x.dtype, self.quant)(x)
        x = gelu(x)
        return _dense(self.hidden_size, "fc2", x.dtype, self.quant)(x)


class SwiGLU(nn.Module):
    """dinov2-giant FFN (HF Dinov2SwiGLUFFN): silu(x1)*x2 gate."""

    hidden_size: int
    mlp_dim: int
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = (int(self.mlp_dim * 2 / 3) + 7) // 8 * 8
        x = _dense(2 * hidden, "weights_in", x.dtype, self.quant)(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        return _dense(self.hidden_size, "weights_out", x.dtype, self.quant)(
            jax.nn.silu(x1) * x2
        )


class Attention(nn.Module):
    hidden_size: int
    num_heads: int
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, D = x.shape
        qkv = _dense(3 * D, "qkv", x.dtype, self.quant)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.num_heads

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd)

        out = multi_head_attention(heads(q), heads(k), heads(v))
        out = out.reshape(B, N, D)
        return _dense(D, "proj", x.dtype, self.quant)(out)


class Dinov2Layer(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_dim: int
    use_swiglu: bool = False
    layer_norm_eps: float = 1e-6
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # sequence-parallel hook: under parallel_frame_apply(...,
        # sequence_parallel=True) this pins the residual stream token-sharded
        # over the model axis (no-op otherwise; parallel/sharding.py)
        from desktop2stereo_tpu.parallel.sharding import token_constraint

        x = token_constraint(x)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm1", dtype=x.dtype)(x)
        h = Attention(self.hidden_size, self.num_heads, quant=self.quant,
                      name="attention")(h)
        ls1 = self.param("layer_scale1", nn.initializers.ones, (self.hidden_size,))
        x = x + h * ls1.astype(x.dtype)

        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm2", dtype=x.dtype)(x)
        if self.use_swiglu:
            h = SwiGLU(self.hidden_size, self.mlp_dim, quant=self.quant,
                       name="mlp")(h)
        else:
            h = Mlp(self.hidden_size, self.mlp_dim, quant=self.quant,
                    name="mlp")(h)
        ls2 = self.param("layer_scale2", nn.initializers.ones, (self.hidden_size,))
        return x + h * ls2.astype(x.dtype)


class Dinov2Encoder(nn.Module):
    """ViT trunk returning the hidden states selected by `out_layers`
    (0-indexed layer outputs; e.g. (2,5,8,11) for ViT-S — the DA neck inputs,
    see core/registry.DPT_LAYER_IDS)."""

    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    out_layers: Tuple[int, ...]
    patch_size: int = 14
    use_swiglu: bool = False
    layer_norm_eps: float = 1e-6
    apply_final_layernorm: bool = True
    interpolate_offset: float = 0.0
    pretrain_grid: int = 37
    # When set, only these out_layers get the final LayerNorm (DepthPro's
    # intermediate hooks consume RAW hidden states while the last hidden
    # state is normed — HF Dinov2Model semantics).
    final_norm_indices: Optional[Tuple[int, ...]] = None
    # int8 block matmuls (ops/quant.py); params must have passed
    # quantize_tree.  Opt-in via --quant int8.
    quant: bool = False

    @nn.compact
    def __call__(self, pixels: jax.Array) -> Tuple[jax.Array, ...]:
        x = Dinov2Embeddings(
            self.hidden_size, self.patch_size, pretrain_grid=self.pretrain_grid,
            interpolate_offset=self.interpolate_offset, name="embeddings",
        )(pixels)
        outputs = []
        want = set(self.out_layers)
        last = max(want)
        for i in range(self.num_layers):
            x = Dinov2Layer(
                self.hidden_size, self.num_heads, self.mlp_dim,
                use_swiglu=self.use_swiglu, layer_norm_eps=self.layer_norm_eps,
                quant=self.quant, name=f"layer_{i}",
            )(x)
            if i in want:
                outputs.append(x)
            if i == last and len(outputs) == len(want):
                break  # trailing layers feed nothing (DA uses up to layer 11/23/39)
        if self.apply_final_layernorm:
            ln = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layernorm", dtype=x.dtype)
            ordered = sorted(self.out_layers)
            norm_set = (set(self.final_norm_indices)
                        if self.final_norm_indices is not None else set(ordered))
            outputs = [ln(o) if ordered[i] in norm_set else o
                       for i, o in enumerate(outputs)]
        return tuple(outputs)
