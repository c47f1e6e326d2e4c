"""Classic DPT (MiDaS v3 / Intel dpt-large family): plain ViT backbone +
readout-project DPT decoder.

Math-parity reimplementation of HF `DPTForDepthEstimation` (non-hybrid),
which the reference serves through AutoModelForDepthEstimation (reference
depth.py:1645-1662; registry entries dpt-large, and the ViT trunk shared by
the BEiT/ZoeDepth variants).  Differences from the DepthAnything decoder:

- backbone hidden states feed the neck PRE-layernorm, with the cls token
  consumed by a per-stage readout projection Linear(2D→D)+GELU;
- fusion upsamples by a fixed ×2 (scale_factor) instead of to the next
  stage's size, and the residual is resized to the fused map (align=False);
- the head upsamples ×2 (align_corners=True) between its convs and returns
  depth at its own resolution (the pipeline resizes to the frame).

TPU-first: same NHWC/einsum patterns as the DA stack; resizes are the
dense-matmul kernels from ops/resize.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu

from desktop2stereo_tpu.models.init_util import jit_init

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.dpt import (
    ConvTransposeSameStride,
    FeatureFusionLayer,
    ReassembleLayer,
)
from desktop2stereo_tpu.ops.attention import multi_head_attention
from desktop2stereo_tpu.ops.resize import resize

# HF DPTConfig presets (Intel/dpt-large, Intel/dpt-hybrid-midas backbone dims)
DPT_VIT_PRESETS = {
    # variant: (hidden, layers, heads, mlp, out_indices)
    "vitb": (768, 12, 12, 3072, (2, 5, 8, 11)),
    "vitl": (1024, 24, 16, 4096, (5, 11, 17, 23)),
}


class ViTLayer(nn.Module):
    """Standard HF ViT block (no LayerScale; LN eps 1e-12)."""

    hidden_size: int
    num_heads: int
    mlp_dim: int
    layer_norm_eps: float = 1e-12
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from desktop2stereo_tpu.models.dinov2 import _dense

        B, N, D = x.shape
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm1", dtype=x.dtype)(x)
        qkv = _dense(3 * D, "qkv", h.dtype, self.quant)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // self.num_heads

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd)

        out = multi_head_attention(heads(q), heads(k), heads(v)).reshape(B, N, D)
        x = x + _dense(D, "proj", out.dtype, self.quant)(out)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm2", dtype=x.dtype)(x)
        h = _dense(self.mlp_dim, "fc1", h.dtype, self.quant)(h)
        h = gelu(h)
        return x + _dense(D, "fc2", h.dtype, self.quant)(h)


class ClassicDPTDecoder(nn.Module):
    """Shared classic-DPT decoder: readout-project reassemble → rn convs →
    ×2 fusion chain → 3-conv head (HF DPTNeck + DPTDepthEstimationHead).
    Consumes full token sequences [B, 1+N, D] (cls first); used by the
    plain-ViT (dpt-large) and BEiT (dpt-beit-*) families."""

    hidden_size: int
    neck_channels: Sequence[int]
    fusion_channels: int
    head_mid_channels: int = 32  # ZoeDepth's num_relative_features

    @nn.compact
    def __call__(self, feats, gh: int, gw: int, return_aux: bool = False):
        D = self.hidden_size
        B = feats[0].shape[0]
        factors = (4, 2, 1, -2)
        stages = []
        for i, f in enumerate(feats):
            cls_tok, tokens = f[:, 0], f[:, 1:]
            readout = jnp.broadcast_to(cls_tok[:, None, :], tokens.shape)
            merged = jnp.concatenate([tokens, readout], axis=-1)
            proj = nn.Dense(D, name=f"readout_{i}", dtype=merged.dtype)(merged)
            proj = gelu(proj)
            grid = proj.reshape(B, gh, gw, D)
            grid = ReassembleLayer(self.neck_channels[i], factors[i],
                                   name=f"reassemble_{i}")(grid)
            grid = nn.Conv(self.fusion_channels, (3, 3), padding=[(1, 1), (1, 1)],
                           use_bias=False, name=f"conv_{i}", dtype=grid.dtype)(grid)
            stages.append(grid)

        # fusion: coarsest-first, fixed ×2 upsample each step
        fused = None
        fused_list = []
        for j, s in enumerate(stages[::-1]):
            layer = FeatureFusionLayer(self.fusion_channels, name=f"fusion_{j}")
            fused = layer(s, None, None) if fused is None else layer(fused, s, None)
            fused_list.append(fused)

        h = nn.Conv(self.fusion_channels // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="head_conv1", dtype=fused.dtype)(fused)
        h = resize(h, (h.shape[1] * 2, h.shape[2] * 2), mode="bilinear",
                   align_corners=True)
        h = nn.Conv(self.head_mid_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="head_conv2", dtype=h.dtype)(h)
        feat_mid = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3", dtype=feat_mid.dtype)(feat_mid)
        depth = nn.relu(h)[..., 0]
        if return_aux:
            # ZoeDepth consumes: fusion pyramid (coarsest→finest), the
            # coarsest rn conv output ("bottleneck"), and the post-relu
            # mid features (HF modeling_zoedepth.py:309-380)
            return depth, {
                "fusion": fused_list,
                "bottleneck": stages[3],
                "features": feat_mid,
            }
        return depth


class DPTViT(nn.Module):
    """pixels [B,H,W,3] (normalized) → depth [B,h',w'] (MiDaS disparity).

    h'/w' = 8·ceil-ish of the patch grid as produced by the ×2 fusion chain
    (HF returns depth at head resolution, not input resolution).
    """

    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    out_indices: Tuple[int, ...]
    neck_channels: Sequence[int]
    fusion_channels: int
    patch_size: int = 16
    pretrain_grid: int = 24  # 384/16; dpt-large pos table is 24²+1
    quant: bool = False  # int8 encoder matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "DPTViT":
        hidden, layers, heads, mlp, out_idx = DPT_VIT_PRESETS[spec.variant]
        return cls(
            hidden_size=hidden, num_layers=layers, num_heads=heads, mlp_dim=mlp,
            out_indices=out_idx, neck_channels=spec.neck_channels,
            fusion_channels=spec.fusion_channels, patch_size=spec.patch_size,
            quant=quant,
        )

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        B, H, W, C = pixels.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        D = self.hidden_size

        # --- embeddings: patch conv + cls + bilinear-resized pos table ---
        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(), (p * p * C, D))
        pbias = self.param("patch_bias", nn.initializers.zeros, (D,))
        x = pixels.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = jnp.einsum("bnd,de->bne", x, kernel.astype(x.dtype),
                       preferred_element_type=x.dtype) + pbias.astype(x.dtype)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, self.pretrain_grid**2 + 1, D))
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            # HF DPT resizes pos embeddings bilinear, align_corners=False
            # (modeling_dpt.py _resize_pos_embed)
            grid = patch_pos.reshape(self.pretrain_grid, self.pretrain_grid, D)
            grid = resize(grid.astype(jnp.float32), (gh, gw), mode="bilinear")
            patch_pos = grid.reshape(1, gh * gw, D)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(x.dtype), x], axis=1
        ) + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(x.dtype)

        # --- encoder: collect PRE-norm hidden states at out_indices ---
        feats = []
        want = set(self.out_indices)
        for i in range(self.num_layers):
            x = ViTLayer(self.hidden_size, self.num_heads, self.mlp_dim,
                         quant=self.quant, name=f"layer_{i}")(x)
            if i in want:
                feats.append(x)

        return ClassicDPTDecoder(
            hidden_size=D, neck_channels=self.neck_channels,
            fusion_channels=self.fusion_channels, name="decoder",
        )(feats, gh, gw)


def build_dpt_vit(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
                  rng_seed: int = 0, init_size: Optional[int] = None,
                  quant: bool = False):
    model = DPTViT.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_dpt_vit

        params = {"params": convert_dpt_vit(ckpt, spec)}
    else:
        size = init_size or (spec.patch_size * 4)
        float_model = DPTViT.from_spec(spec) if quant else model
        params = jit_init(float_model, jnp.zeros((1, size, size, 3), jnp.float32),
                     rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        # the ViT blocks sit at the model's top level (no "backbone"
        # wrapper), so scope on the layer dirs themselves
        params = quantize_tree(
            params, scope=tuple(f"layer_{i}" for i in range(model.num_layers)))

    def apply(p, pixels):
        return model.apply(p, pixels)

    return apply, params, spec


class DPTDinov2(nn.Module):
    """DINOv2 trunk + classic readout-project DPT decoder — the actual
    architecture of facebook/dpt-dinov2-* (HF `DPTForDepthEstimation` with
    `backbone_config=Dinov2Config`, modeling_dpt.py backbone path): the
    backbone emits final-layernormed token sequences WITH the cls token,
    and the neck consumes cls via per-stage readout projections — unlike
    DepthAnything, whose neck drops cls and has no readout (this family
    was mis-routed through DepthAnything before r05).

    Feature layers follow the DINOv2 depth-adaptation convention (the
    LAST FOUR blocks); published checkpoints carry the definitive
    out_indices in their config.json — revalidate with
    `convert.py --verify-depth` when egress allows."""

    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    neck_channels: Sequence[int]
    fusion_channels: int
    patch_size: int = 14
    quant: bool = False

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "DPTDinov2":
        hidden, layers, heads, mlp = spec.dims
        return cls(hidden_size=hidden, num_layers=layers, num_heads=heads,
                   mlp_dim=mlp, neck_channels=spec.neck_channels,
                   fusion_channels=spec.fusion_channels,
                   patch_size=spec.patch_size, quant=quant)

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        from desktop2stereo_tpu.models.dinov2 import Dinov2Encoder

        B, H, W, _ = pixels.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        feats = Dinov2Encoder(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            out_layers=tuple(range(self.num_layers - 4, self.num_layers)),
            patch_size=self.patch_size, quant=self.quant, name="backbone",
        )(pixels)
        return ClassicDPTDecoder(
            hidden_size=self.hidden_size, neck_channels=self.neck_channels,
            fusion_channels=self.fusion_channels, name="decoder",
        )(list(feats), gh, gw)


def build_dpt_dinov2(spec: ModelSpec, checkpoint=None,
                     param_dtype=jnp.float32, rng_seed: int = 0,
                     init_size: Optional[int] = None, quant: bool = False):
    model = DPTDinov2.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_dpt_dinov2

        params = {"params": convert_dpt_dinov2(ckpt, spec)}
    else:
        size = init_size or (spec.patch_size * 4)
        float_model = DPTDinov2.from_spec(spec) if quant else model
        params = jit_init(float_model,
                          jnp.zeros((1, size, size, 3), jnp.float32),
                          rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        params = quantize_tree(params, scope=("backbone",))

    def apply(p, pixels):
        return model.apply(p, pixels)

    return apply, params, spec
