"""BEiT backbone + classic DPT decoder: the MiDaS v3.1 dpt-beit family.

Math-parity reimplementation of HF `DPTForDepthEstimation` with a
`BeitBackbone` (Intel/dpt-beit-base-384, dpt-beit-large-512 — reference
registry utils.py:732-817; served via AutoModelForDepthEstimation,
reference depth.py:1645-1662).

BEiT specifics vs plain ViT:
- no absolute position embeddings; each layer adds a RELATIVE position bias
  to its attention logits, indexed from a (2W-1)²+3 table (3 extra entries
  for cls↔token/cls↔cls), bilinearly interpolated when the runtime grid
  differs from the pretraining window (MiDaS v3.1 arbitrary-window support);
- k projection has no bias; LayerScale lambda_1/lambda_2.

TPU-first: the relative-position index map is a trace-time numpy constant;
the bias materializes as one [H, N+1, N+1] gather per layer that XLA hoists
out of the batch; attention runs through ops/attention with the bias hook.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu

from desktop2stereo_tpu.models.init_util import jit_init
import numpy as np

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.dpt_vit import ClassicDPTDecoder
from desktop2stereo_tpu.ops.attention import multi_head_attention
from desktop2stereo_tpu.ops.resize import resize

# (hidden, layers, heads, mlp, out_indices, pretrain_window)
BEIT_PRESETS = {
    "dpt-beit-base-384": (768, 12, 12, 3072, (2, 5, 8, 11), 24),
    "dpt-beit-large-512": (1024, 24, 16, 4096, (5, 11, 17, 23), 32),
    # ZoeDepth models ride on beit-large-384 (window 24)
    "zoedepth": (1024, 24, 16, 4096, (5, 11, 17, 23), 24),
}


def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """[(wh·ww+1)², ] flat index map into the bias table (HF
    modeling_beit.py generate_relative_position_index)."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    yy, xx = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    coords = np.stack([yy.reshape(-1), xx.reshape(-1)])  # [2, N]
    rel = coords[:, :, None] - coords[:, None, :]        # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    index = np.zeros((area + 1, area + 1), dtype=np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, :] = num_rel - 3
    index[:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index.reshape(-1)


def build_rel_pos_bias(table: jax.Array, gh: int, gw: int, pretrain_window: int,
                       num_heads: int) -> jax.Array:
    """One layer's bias table → [heads, N+1, N+1] for the runtime window,
    interpolating the table when (gh,gw) ≠ pretrain window (HF
    modeling_beit.py BeitRelativePositionBias.forward).

    NOTE: the (N+1)²-row gather this does costs ~0.3 ms on a v5e — ×24
    layers that dwarfs the encoder itself.  The bias is input-independent,
    so the frame program computes all layers ONCE per capture shape
    (compute_rel_pos_biases) and carries them as model state; this builder
    runs per-frame only on the parity/init paths."""
    M = pretrain_window
    old_num = (2 * M - 1) ** 2 + 3
    new_h, new_w = 2 * gh - 1, 2 * gw - 1
    if (gh, gw) != (M, M):
        sub = table[: old_num - 3].reshape(2 * M - 1, 2 * M - 1, num_heads)
        sub = resize(sub.astype(jnp.float32), (new_h, new_w), mode="bilinear")
        table_new = jnp.concatenate(
            [sub.reshape(new_h * new_w, num_heads),
             table[old_num - 3:].astype(jnp.float32)], axis=0
        ).astype(table.dtype)
    else:
        table_new = table
    index = _relative_position_index(gh, gw)
    n = gh * gw + 1
    bias = jnp.take(table_new, jnp.asarray(index), axis=0)  # [(N+1)², H]
    return bias.reshape(n, n, num_heads).transpose(2, 0, 1)


def compute_rel_pos_biases(backbone_params, gh: int, gw: int,
                           pretrain_window: int, num_layers: int,
                           num_heads: int):
    """All layers' biases for one runtime grid — the once-per-shape
    precompute the streaming first() runs and step() reuses."""
    out = []
    for i in range(num_layers):
        table = backbone_params[f"layer_{i}"]["relative_position_bias"][
            "relative_position_bias_table"]
        out.append(build_rel_pos_bias(table, gh, gw, pretrain_window, num_heads))
    return out


class BeitRelativePositionBias(nn.Module):
    """Per-layer bias table module wrapper around build_rel_pos_bias."""

    num_heads: int
    pretrain_window: int

    @nn.compact
    def __call__(self, gh: int, gw: int) -> jax.Array:
        old_num = (2 * self.pretrain_window - 1) ** 2 + 3
        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            (old_num, self.num_heads),
        )
        return build_rel_pos_bias(table, gh, gw, self.pretrain_window,
                                  self.num_heads)


class BeitLayer(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_dim: int
    pretrain_window: int
    layer_norm_eps: float = 1e-12
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, gh: int, gw: int,
                 bias: Optional[jax.Array] = None) -> jax.Array:
        from desktop2stereo_tpu.models.dinov2 import _dense

        B, N, D = x.shape
        hd = D // self.num_heads
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm1", dtype=x.dtype)(x)
        q = _dense(D, "query", h.dtype, self.quant)(h)
        k = _dense(D, "key", h.dtype, self.quant, use_bias=False)(h)
        v = _dense(D, "value", h.dtype, self.quant)(h)
        if bias is None:  # parity/init path; the frame program precomputes
            bias = BeitRelativePositionBias(
                self.num_heads, self.pretrain_window, name="relative_position_bias",
            )(gh, gw)

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd)

        out = multi_head_attention(heads(q), heads(k), heads(v), bias=bias)
        out = _dense(D, "proj", x.dtype, self.quant)(out.reshape(B, N, D))
        lam1 = self.param("lambda_1", nn.initializers.ones, (D,))
        x = x + out * lam1.astype(x.dtype)

        h = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm2", dtype=x.dtype)(x)
        h = _dense(self.mlp_dim, "fc1", h.dtype, self.quant)(h)
        h = gelu(h)
        h = _dense(D, "fc2", h.dtype, self.quant)(h)
        lam2 = self.param("lambda_2", nn.initializers.ones, (D,))
        return x + h * lam2.astype(x.dtype)


class BeitEncoder(nn.Module):
    """Returns full token sequences [B, 1+N, D] at `out_indices` (raw,
    pre-final-norm — what BeitBackbone feeds the DPT neck)."""

    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    out_indices: Tuple[int, ...]
    pretrain_window: int
    patch_size: int = 16
    quant: bool = False

    @nn.compact
    def __call__(self, pixels: jax.Array, biases=None):
        B, H, W, C = pixels.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        D = self.hidden_size

        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(), (p * p * C, D))
        pbias = self.param("patch_bias", nn.initializers.zeros, (D,))
        x = pixels.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, p * p * C)
        x = jnp.einsum("bnd,de->bne", x, kernel.astype(x.dtype),
                       preferred_element_type=x.dtype) + pbias.astype(x.dtype)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(x.dtype), x], axis=1
        )

        feats = []
        want = set(self.out_indices)
        for i in range(self.num_layers):
            x = BeitLayer(D, self.num_heads, self.mlp_dim, self.pretrain_window,
                          quant=self.quant, name=f"layer_{i}")(
                x, gh, gw, None if biases is None else biases[i])
            if i in want:
                feats.append(x)
        return feats, gh, gw


class DPTBEiT(nn.Module):
    """pixels [B,H,W,3] (normalized) → MiDaS disparity [B,h',w']."""

    preset: str
    neck_channels: Sequence[int]
    fusion_channels: int
    patch_size: int = 16
    quant: bool = False  # int8 encoder matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "DPTBEiT":
        return cls(preset=spec.name, neck_channels=spec.neck_channels,
                   fusion_channels=spec.fusion_channels,
                   patch_size=spec.patch_size, quant=quant)

    @nn.compact
    def __call__(self, pixels: jax.Array, biases=None) -> jax.Array:
        hidden, layers, heads, mlp, out_idx, window = BEIT_PRESETS[self.preset]
        feats, gh, gw = BeitEncoder(
            hidden_size=hidden, num_layers=layers, num_heads=heads, mlp_dim=mlp,
            out_indices=out_idx, pretrain_window=window,
            patch_size=self.patch_size, quant=self.quant, name="backbone",
        )(pixels, biases=biases)
        return ClassicDPTDecoder(
            hidden_size=hidden, neck_channels=self.neck_channels,
            fusion_channels=self.fusion_channels, name="decoder",
        )(feats, gh, gw)


def build_dpt_beit(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
                   rng_seed: int = 0, init_size: Optional[int] = None,
                   quant: bool = False):
    model = DPTBEiT.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_dpt_beit

        params = {"params": convert_dpt_beit(ckpt, spec)}
    else:
        size = init_size or (spec.patch_size * 4)
        float_model = DPTBEiT.from_spec(spec) if quant else model
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


def make_beit_stream_fns(model, spec: ModelSpec, preset_key: str):
    """(first, step) carrying the per-shape rel-pos biases as model state —
    computed once per capture shape, reused every frame (the per-frame
    gather construction costs ~7 ms/frame on v5e for BEiT-L)."""
    hidden, layers, heads, mlp, out_idx, window = BEIT_PRESETS.get(
        preset_key, BEIT_PRESETS.get("zoedepth"))
    del hidden, mlp, out_idx
    ps = spec.patch_size

    def first(p, x):
        gh, gw = x.shape[1] // ps, x.shape[2] // ps
        biases = compute_rel_pos_biases(
            p["params"]["backbone"], gh, gw, window, layers, heads)
        return model.apply(p, x, biases=biases), tuple(biases)

    def step(p, x, s):
        return model.apply(p, x, biases=list(s)), s

    return first, step
