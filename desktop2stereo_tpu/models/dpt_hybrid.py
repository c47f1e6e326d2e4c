"""DPT-Hybrid (MiDaS 3.0 dpt-hybrid-midas): BiT/ResNetv2 stem + ViT trunk.

Math-parity reimplementation of HF `DPTForDepthEstimation(is_hybrid=True)`
(the reference serves it through AutoModelForDepthEstimation, registry
`dpt-hybrid-midas`): a 3-stage BiT convnet (weight-standardized convs +
GroupNorm/ReLU bottlenecks, TF-SAME padding) whose last feature map becomes
the ViT patch embedding, with the first two conv stages feeding the DPT
neck directly (neck_ignore_stages [0,1]) and ViT layers 8/11 supplying the
two coarse stages through readout projection.

TPU-first: the weight standardization is folded at call time as a cheap
per-output-channel normalize (XLA fuses it ahead of the conv); SAME padding
maps to lax's native SAME; everything stays NHWC.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu

from desktop2stereo_tpu.models.init_util import jit_init

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.dpt import FeatureFusionLayer, ReassembleLayer
from desktop2stereo_tpu.models.dpt_vit import ViTLayer
from desktop2stereo_tpu.ops.resize import resize

# dpt-hybrid-midas facts (HF Intel/dpt-hybrid-midas config); the module is
# parameterized so tiny parity-test configs can be built too.
BIT_DEPTHS = (3, 4, 9)
BIT_HIDDEN = (256, 512, 1024)
BIT_EMBED = 64
VIT_HIDDEN, VIT_LAYERS, VIT_HEADS, VIT_MLP = 768, 12, 12, 3072
VIT_OUT = (8, 11)
NECK_CHANNELS = (256, 512, 768, 768)
FUSION = 256
PRETRAIN_GRID = 24  # 384/16


class WSConv(nn.Module):
    """Weight-standardized conv (HF WeightStandardizedConv2d, eps 1e-8):
    kernel normalized per output channel before the conv."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features))
        k32 = kernel.astype(jnp.float32)
        mean = jnp.mean(k32, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(k32, axis=(0, 1, 2), keepdims=True)
        k = ((k32 - mean) * jax.lax.rsqrt(var + 1e-8)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class GroupNormAct(nn.Module):
    channels: int
    act: bool = True
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm", dtype=x.dtype)(x)
        return nn.relu(x) if self.act else x


def _make_div(v: int, divisor: int = 8) -> int:
    min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class BitBottleneck(nn.Module):
    """Non-preactivation bottleneck (HF BitBottleneckLayer)."""

    out_channels: int
    stride: int = 1
    is_first: bool = False
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mid = _make_div(int(self.out_channels * 0.25))
        shortcut = x
        if self.is_first:
            shortcut = WSConv(self.out_channels, (1, 1), (self.stride, self.stride),
                              name="downsample_conv")(x)
            shortcut = GroupNormAct(self.out_channels, act=False, groups=self.groups,
                                    name="downsample_norm")(shortcut)
        h = WSConv(mid, (1, 1), name="conv1")(x)
        h = GroupNormAct(mid, groups=self.groups, name="norm1")(h)
        h = WSConv(mid, (3, 3), (self.stride, self.stride), name="conv2")(h)
        h = GroupNormAct(mid, groups=self.groups, name="norm2")(h)
        h = WSConv(self.out_channels, (1, 1), name="conv3")(h)
        h = GroupNormAct(self.out_channels, act=False, groups=self.groups, name="norm3")(h)
        return nn.relu(h + shortcut)


class BitStem(nn.Module):
    embed: int = BIT_EMBED
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = WSConv(self.embed, (7, 7), (2, 2), name="conv")(x)
        h = GroupNormAct(self.embed, groups=self.groups, name="norm")(h)
        # TF-SAME max pool 3x3 s2 (post-ReLU inputs, so 0-pad == -inf-pad)
        return nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")


class BitBackbone(nn.Module):
    """3-stage BiT; returns (stage1, stage2, stage3) feature maps at
    strides 4/8/16."""

    depths: Tuple[int, ...] = BIT_DEPTHS
    hidden: Tuple[int, ...] = BIT_HIDDEN
    embed: int = BIT_EMBED
    groups: int = 32

    @nn.compact
    def __call__(self, pixels: jax.Array):
        h = BitStem(self.embed, self.groups, name="stem")(pixels)
        feats = []
        for s, (depth, hidden) in enumerate(zip(self.depths, self.hidden)):
            out_ch = _make_div(hidden)
            stride = 1 if s == 0 else 2
            for l in range(depth):
                h = BitBottleneck(
                    out_ch, stride=(stride if l == 0 else 1), is_first=(l == 0),
                    groups=self.groups, name=f"stage{s}_layer{l}",
                )(h)
            feats.append(h)
        return feats


class DPTHybrid(nn.Module):
    """pixels [B,H,W,3] (normalized 0.5/0.5) → MiDaS disparity [B,h',w']."""

    patch_size: int = 16
    bit_depths: Tuple[int, ...] = BIT_DEPTHS
    bit_hidden: Tuple[int, ...] = BIT_HIDDEN
    bit_embed: int = BIT_EMBED
    bit_groups: int = 32
    vit_hidden: int = VIT_HIDDEN
    vit_layers: int = VIT_LAYERS
    vit_heads: int = VIT_HEADS
    vit_mlp: int = VIT_MLP
    vit_out: Tuple[int, ...] = VIT_OUT
    neck_channels: Tuple[int, ...] = NECK_CHANNELS
    fusion: int = FUSION
    pretrain_grid: int = PRETRAIN_GRID
    quant: bool = False  # int8 ViT-block matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "DPTHybrid":
        return cls(patch_size=spec.patch_size, quant=quant)

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        B, H, W, _ = pixels.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        D = self.vit_hidden

        f1, f2, f3 = BitBackbone(self.bit_depths, self.bit_hidden,
                                 self.bit_embed, self.bit_groups, name="bit")(pixels)

        # ViT embedding from the stride-16 map (1x1 projection)
        tokens = nn.Conv(D, (1, 1), name="projection", dtype=f3.dtype)(f3)
        tokens = tokens.reshape(B, gh * gw, D)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, self.pretrain_grid**2 + 1, D))
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            grid = patch_pos.reshape(self.pretrain_grid, self.pretrain_grid, D)
            grid = resize(grid.astype(jnp.float32), (gh, gw), mode="bilinear")
            patch_pos = grid.reshape(1, gh * gw, D)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(tokens.dtype), tokens],
            axis=1,
        ) + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(tokens.dtype)

        vit_feats = []
        want = set(self.vit_out)
        for i in range(self.vit_layers):
            x = ViTLayer(D, self.vit_heads, self.vit_mlp, quant=self.quant,
                         name=f"layer_{i}")(x)
            if i in want:
                vit_feats.append(x)

        # --- neck: stages 0,1 = conv maps straight through; 2,3 = readout
        # project + reassemble (factor 1, then stride-2 conv) ---
        stages = [f1, f2]
        factors = {2: 1, 3: -2}
        for si, f in zip((2, 3), vit_feats):
            cls_tok, tok = f[:, 0], f[:, 1:]
            readout = jnp.broadcast_to(cls_tok[:, None, :], tok.shape)
            merged = jnp.concatenate([tok, readout], axis=-1)
            proj = nn.Dense(D, name=f"readout_{si}", dtype=merged.dtype)(merged)
            proj = gelu(proj)
            grid = proj.reshape(B, gh, gw, D)
            grid = ReassembleLayer(self.neck_channels[si], factors[si],
                                   name=f"reassemble_{si}")(grid)
            stages.append(grid)

        rn = [
            nn.Conv(self.fusion, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name=f"conv_{i}", dtype=s.dtype)(s)
            for i, s in enumerate(stages)
        ]
        fused = None
        for j, s in enumerate(rn[::-1]):
            layer = FeatureFusionLayer(self.fusion, name=f"fusion_{j}")
            fused = layer(s, None, None) if fused is None else layer(fused, s, None)

        h = nn.Conv(self.fusion // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="head_conv1", dtype=fused.dtype)(fused)
        h = resize(h, (h.shape[1] * 2, h.shape[2] * 2), mode="bilinear",
                   align_corners=True)
        h = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="head_conv2", dtype=h.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3", dtype=h.dtype)(h)
        return nn.relu(h)[..., 0]


def build_dpt_hybrid(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
                     rng_seed: int = 0, init_size: Optional[int] = None,
                     quant: bool = False):
    model = DPTHybrid.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_dpt_hybrid

        params = {"params": convert_dpt_hybrid(ckpt, spec)}
    else:
        size = init_size or (spec.patch_size * 4)
        float_model = DPTHybrid.from_spec(spec) if quant else model
        params = jit_init(float_model, jnp.zeros((1, size, size, 3), jnp.float32),
                     rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        params = quantize_tree(
            params,
            scope=tuple(f"layer_{i}" for i in range(model.vit_layers)))

    def apply(p, pixels):
        return model.apply(p, pixels)

    return apply, params, spec
