"""InfiniDepth: DINOv3 backbone + fp32 conv stem + implicit MLP decoder.

Re-implements the math of the reference's InfiniDepth runtime path (reference
models/InfiniDepth/api.py:28-98, model/model.py:63-234,
model/block/implicit_decoder.py ImplicitHead, model/block/convolution.py
BasicEncoder, and the vendored DINOv3 torchhub ViT at
model/block/torchhub/dinov3/dinov3/{models/vision_transformer.py,
layers/*.py}).

The model takes RGB in [0,1] (it normalizes internally — reference
depth.py:1945) and returns relative depth at the INPUT resolution (the
implicit head decodes a dense query grid at full res).

TPU-first notes:
- DINOv3's axial RoPE sin/cos are eval-deterministic per (gh,gw): computed
  as trace-time numpy constants (the reference recomputes them per block per
  frame, vision_transformer.py:271-275).
- The masked-k-bias trick (LinearKMaskedBias) is folded into the converted
  qkv bias — one fused MXU matmul at runtime.
- The dense implicit decode is two weight-matrix resizes (ops/resize) times
  a static zero-padding border mask + one batched MLP over pixels — all
  matmul, no gather.
- InstanceNorm (affine-free) is a two-pass reduction XLA fuses with the
  surrounding convs.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu

from desktop2stereo_tpu.models.init_util import jit_init
import numpy as np

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.ops.attention import multi_head_attention
from desktop2stereo_tpu.ops.resize import resize

# encoder name → (embed_dim, depth, heads, ffn_hidden, swiglu)
# (reference torchhub dinov3/hub/backbones.py:201-360; ffn_ratio 4, except
# vits16plus ratio 6 + SwiGLU)
DINOV3_CONFIGS = {
    "vits16": (384, 12, 6, 1536, False),
    "vits16plus": (384, 12, 6, 2304, True),
    "vitb16": (768, 12, 12, 3072, False),
    "vitl16": (1024, 24, 16, 4096, False),
}
# registry model name → encoder (reference depth.py:911-914)
ENCODER_BY_NAME = {
    "InfiniDepth-Small": "vits16",
    "InfiniDepth-SmallPlus": "vits16plus",
    "InfiniDepth-Base": "vitb16",
    "InfiniDepth-Large": "vitl16",
}
N_STORAGE_TOKENS = 4
PATCH = 16
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# DINOv3 backbone
# ---------------------------------------------------------------------------

def _dinov3_rope_tables(head_dim: int, gh: int, gw: int, base: float = 100.0):
    """Axial RoPE sin/cos [gh·gw, head_dim] (reference
    dinov3/layers/rope_position_encoding.py:58-110, eval path: coords
    normalized 'separate' to [-1,1], no shift/jitter/rescale)."""
    quarter = head_dim // 4
    periods = base ** (2 * np.arange(quarter, dtype=np.float64) / (head_dim // 2))
    ys = (2.0 * (np.arange(gh, dtype=np.float64) + 0.5) / gh) - 1.0
    xs = (2.0 * (np.arange(gw, dtype=np.float64) + 0.5) / gw) - 1.0
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    coords = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=1)  # [HW, 2]
    angles = 2 * math.pi * coords[:, :, None] / periods[None, None, :]  # [HW,2,q]
    angles = angles.reshape(-1, 2 * quarter)
    angles = np.tile(angles, (1, 2))  # [HW, head_dim]
    return np.sin(angles).astype(np.float32), np.cos(angles).astype(np.float32)


def _rope_apply(t: jax.Array, sin: jax.Array, cos: jax.Array, n_prefix: int) -> jax.Array:
    """t [B, N, H, hd]; rotate patch tokens only (cls+storage pass through).
    rotate_half: [x1,x2] → [-x2,x1] over the full head dim (reference
    dinov3/layers/attention.py:16-27)."""
    prefix, patches = t[:, :n_prefix], t[:, n_prefix:]
    half = t.shape[-1] // 2
    x1, x2 = patches[..., :half], patches[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    s = sin[None, :, None, :].astype(t.dtype)
    c = cos[None, :, None, :].astype(t.dtype)
    return jnp.concatenate([prefix, patches * c + rotated * s], axis=1)


class Dinov3Block(nn.Module):
    hidden_size: int
    num_heads: int
    ffn_hidden: int
    use_swiglu: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, rope, n_prefix: int) -> jax.Array:
        from desktop2stereo_tpu.models.dinov2 import _dense

        D = self.hidden_size
        # "layernormbf16" = LayerNorm eps 1e-5 (reference
        # models/vision_transformer.py:29)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=x.dtype)(x)
        B, N, _ = h.shape
        hd = D // self.num_heads
        qkv = _dense(3 * D, "qkv", h.dtype, self.quant)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        if rope is not None:
            sin, cos = rope
            q = _rope_apply(q, sin, cos, n_prefix)
            k = _rope_apply(k, sin, cos, n_prefix)
        attn = multi_head_attention(q, k, v).reshape(B, N, D)
        attn = _dense(D, "proj", h.dtype, self.quant)(attn)
        ls1 = self.param("layer_scale1", nn.initializers.ones, (D,))
        x = x + attn * ls1.astype(x.dtype)

        h = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=x.dtype)(x)
        if self.use_swiglu:
            # dinov3 SwiGLUFFN: separate w1/w2 gates (reference
            # ffn_layers.py:52-77); hidden = align8(ffn_hidden·2/3)
            d = int(self.ffn_hidden * 2 / 3)
            sw = d + (-d % 8)
            x1 = _dense(sw, "w1", h.dtype, self.quant)(h)
            x2 = _dense(sw, "w2", h.dtype, self.quant)(h)
            h = _dense(D, "w3", h.dtype, self.quant)(jax.nn.silu(x1) * x2)
        else:
            h = _dense(self.ffn_hidden, "fc1", h.dtype, self.quant)(h)
            h = gelu(h)
            h = _dense(D, "fc2", h.dtype, self.quant)(h)
        ls2 = self.param("layer_scale2", nn.initializers.ones, (D,))
        return x + h * ls2.astype(x.dtype)


class Dinov3Backbone(nn.Module):
    """Returns the final-block patch tokens, normed ([B, gh·gw, D]) — the
    only features InfiniDepth consumes (reference model.py:132-140)."""

    embed_dim: int
    depth: int
    num_heads: int
    ffn_hidden: int
    use_swiglu: bool = False
    patch_size: int = PATCH
    quant: bool = False

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        B, H, W, C = pixels.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        D = self.embed_dim

        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(), (p * p * C, D))
        pbias = self.param("patch_bias", nn.initializers.zeros, (D,))
        x = pixels.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = jnp.einsum("bnd,de->bne", x, kernel.astype(x.dtype),
                       preferred_element_type=x.dtype) + pbias.astype(x.dtype)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        storage = self.param("storage_tokens", nn.initializers.zeros,
                             (1, N_STORAGE_TOKENS, D))
        prefix = jnp.concatenate([
            jnp.broadcast_to(cls, (B, 1, D)),
            jnp.broadcast_to(storage, (B, N_STORAGE_TOKENS, D)),
        ], axis=1).astype(x.dtype)
        x = jnp.concatenate([prefix, x], axis=1)

        hd = D // self.num_heads
        sin, cos = _dinov3_rope_tables(hd, gh, gw)
        rope = (jnp.asarray(sin), jnp.asarray(cos))
        n_prefix = 1 + N_STORAGE_TOKENS

        for i in range(self.depth):
            x = Dinov3Block(
                D, self.num_heads, self.ffn_hidden, self.use_swiglu,
                quant=self.quant, name=f"layer_{i}",
            )(x, rope, n_prefix)

        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=x.dtype)(x)
        return x[:, n_prefix:]


# ---------------------------------------------------------------------------
# BasicEncoder (instance-norm conv stem, fp32)
# ---------------------------------------------------------------------------

def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d(affine=False) on NHWC."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], name="conv1", dtype=x.dtype)(x)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2", dtype=y.dtype)(y)
        y = nn.relu(_instance_norm(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        name="downsample", dtype=x.dtype)(x)
            x = _instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """4-scale instance-norm ResNet stem → 128ch at stride 4 (reference
    convolution.py:151-232)."""

    output_dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        H, W = x.shape[1], x.shape[2]
        od = self.output_dim
        x = nn.Conv(od // 2, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    name="conv1", dtype=x.dtype)(x)
        x = nn.relu(_instance_norm(x))

        def layer(x, dim, stride, name):
            x = ResidualBlock(dim, stride, name=f"{name}_0")(x)
            return ResidualBlock(dim, 1, name=f"{name}_1")(x)

        a = layer(x, od // 2, 1, "layer1")
        b = layer(a, od // 4 * 3, 2, "layer2")
        c = layer(b, od, 2, "layer3")
        d = layer(c, od, 2, "layer4")

        target = (H // 4, W // 4)
        a = resize(a, target, mode="bilinear", align_corners=True)
        b = resize(b, target, mode="bilinear", align_corners=True)
        c = resize(c, target, mode="bilinear", align_corners=True)
        d = resize(d, target, mode="bilinear", align_corners=True)

        x = jnp.concatenate([a, b, c, d], axis=-1)
        x = nn.Conv(od * 2, (3, 3), padding=[(1, 1), (1, 1)], name="conv2", dtype=x.dtype)(x)
        x = nn.relu(_instance_norm(x))
        return nn.Conv(od, (1, 1), name="conv3", dtype=x.dtype)(x)


# ---------------------------------------------------------------------------
# Implicit head (dense path)
# ---------------------------------------------------------------------------

def _zero_padding_mask(in_h: int, in_w: int, out_h: int, out_w: int) -> np.ndarray:
    """Border mask making a clamp-to-edge bilinear upsample equal
    grid_sample's zeros padding (reference implicit_decoder.py:266-297)."""
    yy = (np.arange(out_h, dtype=np.float64) + 0.5) * (in_h / out_h) - 0.5
    xx = (np.arange(out_w, dtype=np.float64) + 0.5) * (in_w / out_w) - 0.5
    wy = np.clip(np.where(yy < 0, yy + 1.0, np.where(yy > in_h - 1, in_h - yy, 1.0)), 0.0, 1.0)
    wx = np.clip(np.where(xx < 0, xx + 1.0, np.where(xx > in_w - 1, in_w - xx, 1.0)), 0.0, 1.0)
    return (wy[:, None] * wx[None, :]).astype(np.float32)


class ImplicitHead(nn.Module):
    """Concat-fusion dense decoder: upsample dino+basic features to output
    res, concat, MLP [1024,256,32]→1, ELU (reference
    implicit_decoder.py:142-330, fusion_type='concat')."""

    hidden_list: Sequence[int] = (1024, 256, 32)

    @nn.compact
    def __call__(self, dino_feat: jax.Array, basic_feat: jax.Array,
                 out_hw: Tuple[int, int]) -> jax.Array:
        oh, ow = out_hw

        def dense_sample(f):
            up = resize(f, (oh, ow), mode="bilinear", align_corners=False)
            mask = _zero_padding_mask(f.shape[1], f.shape[2], oh, ow)
            return up * jnp.asarray(mask, dtype=up.dtype)[None, :, :, None]

        fused = jnp.concatenate([dense_sample(dino_feat), dense_sample(basic_feat)], axis=-1)
        h = fused
        for i, width in enumerate(self.hidden_list):
            h = nn.relu(nn.Dense(width, name=f"mlp_{i}", dtype=h.dtype)(h))
        h = nn.Dense(1, name="mlp_out", dtype=h.dtype)(h)
        return jax.nn.elu(h)[..., 0]  # output_act='elu'


class InfiniDepth(nn.Module):
    """pixels [B,H,W,3] RGB in [0,1] → relative depth [B,H,W] at input res."""

    encoder: str = "vitl16"
    quant: bool = False  # int8 encoder matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "InfiniDepth":
        return cls(encoder=ENCODER_BY_NAME.get(spec.name, "vitl16"),
                   quant=quant)

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        D, depth, heads, ffn, swiglu = DINOV3_CONFIGS[self.encoder]
        B, H, W, _ = pixels.shape

        mean = jnp.asarray(IMAGENET_MEAN, pixels.dtype)
        std = jnp.asarray(IMAGENET_STD, pixels.dtype)
        x_dino = (pixels - mean) / std
        tokens = Dinov3Backbone(
            embed_dim=D, depth=depth, num_heads=heads, ffn_hidden=ffn,
            use_swiglu=swiglu, quant=self.quant, name="backbone",
        )(x_dino)
        gh, gw = H // PATCH, W // PATCH
        dino_feat = tokens.reshape(B, gh, gw, D)

        # conv stem runs in fp32 regardless of compute dtype (reference
        # model.py:153 "InstanceNorm runs safely in fp32")
        x_basic = (2.0 * pixels - 1.0).astype(jnp.float32)
        basic_feat = BasicEncoder(name="basic_encoder")(x_basic)

        return ImplicitHead(name="head")(
            dino_feat, basic_feat.astype(dino_feat.dtype), (H, W)
        )


def build_infinidepth(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
                      rng_seed: int = 0, init_size: Optional[int] = None,
                      quant: bool = False):
    model = InfiniDepth.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_infinidepth

        params = {"params": convert_infinidepth(ckpt, spec)}
    else:
        size = init_size or (PATCH * 4)
        float_model = InfiniDepth.from_spec(spec) if quant else model
        params = jit_init(float_model, jnp.zeros((1, size, size, 3), jnp.float32),
                     rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        params = quantize_tree(params)

    def apply(p, pixels):
        return model.apply(p, pixels)

    return apply, params, spec
