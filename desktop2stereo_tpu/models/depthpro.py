"""DepthPro (apple/DepthPro-hf): multi-scale patch ViT + fusion decoder.

Math-parity reimplementation of HF `DepthProForDepthEstimation` (the
reference serves it via AutoModelForDepthEstimation; registry
`DepthPro-Large`, square-only 1536 input — reference settings.yaml:312-314):

- the input is rendered at 3 scales (0.25/0.5/1), each scale cut into
  fixed-size overlapping patches (1 + 9 + 25 at the stock config), and every
  patch runs through ONE shared DINOv2 "patch encoder" as a single batch —
  a naturally MXU-friendly formulation (35-way batch of identical ViTs);
- patch features (plus two intermediate-layer hooks on the full-res scale)
  are re-assembled into image-aligned maps (overlap-trimmed grid merge +
  bilinear), a separate DINOv2 "image encoder" provides the global anchor;
- a deconv-pyramid neck projects everything to the fusion width and a
  DPT-style fusion chain with learned ConvT upsampling feeds the 3-conv
  depth head (canonical inverse depth).

The optional FOV branch is implemented too (use_fov=True) since the public
checkpoint carries it; the frame pipeline consumes only `depth`.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.models.init_util import jit_init

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.dinov2 import Dinov2Encoder
from desktop2stereo_tpu.models.dpt import (
    ConvTransposeSameStride,
    PreActResidual,
    apply_expand,
    compose_expand,
)
from desktop2stereo_tpu.ops.resize import resize

# apple/DepthPro-hf facts
SCALED_RATIOS = (0.25, 0.5, 1.0)
OVERLAP_RATIOS = (0.0, 0.5, 0.25)
SCALED_DIMS = (1024, 1024, 512)
HOOK_IDS = (11, 5)
HOOK_DIMS = (256, 256)
MERGE_PAD = 3


def split_to_patches(x: jax.Array, patch: int, overlap: float) -> jax.Array:
    """[B,H,W,C] → [N·B, patch, patch, C] overlapping tiles (HF
    split_to_patches; patch-position-major like torch.unfold→permute)."""
    B, H, W, C = x.shape
    if H == W == patch:
        return x
    stride = int(patch * (1 - overlap))
    tiles = []
    for i in range(0, H - patch + 1, stride):
        for j in range(0, W - patch + 1, stride):
            tiles.append(x[:, i:i + patch, j:j + patch])
    return jnp.concatenate(tiles, axis=0)


def merge_patches(patches: jax.Array, batch: int, padding: int) -> jax.Array:
    """[N·B, h, w, C] grid-merge with overlap trim (HF merge_patches)."""
    nb, h, w, C = patches.shape
    n = nb // batch
    sqrt_n = int(math.isqrt(n))
    if nb == batch:
        return patches
    if n < 4:
        padding = 0
    padding = min(h // 4, padding)
    rows = []
    idx = 0
    for r in range(sqrt_n):
        cols = []
        for c in range(sqrt_n):
            box = patches[batch * idx: batch * (idx + 1)]
            top = padding if r != 0 else 0
            bottom = padding if r != sqrt_n - 1 else 0
            left = padding if c != 0 else 0
            right = padding if c != sqrt_n - 1 else 0
            box = box[:, top: h - bottom, left: w - right]
            cols.append(box)
            idx += 1
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


class _ConvParams(nn.Module):
    """Declares a conv/deconv's parameters (identical names and layouts to
    the real module, so converters are untouched) without computing it —
    the parent folds the weights instead."""

    kernel_shape: Tuple[int, ...]
    bias_shape: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       self.kernel_shape)
        b = (self.param("bias", nn.initializers.zeros, self.bias_shape)
             if self.bias_shape is not None else None)
        return k, b


class FeatureUpsampleBlock(nn.Module):
    """(optional 1x1 proj) + n× ConvT(k2,s2) (HF DepthProFeatureUpsampleBlock).

    The whole chain is a per-pixel affine expansion (1×1 conv and k=s=2
    ConvT are both pointwise in the input grid), so it folds into ONE
    matmul + depth-to-space via compose_expand — exact math, ~14× fewer
    FLOPs than materializing each 2× stage at DepthPro's 1536² scales."""

    intermediate: int
    out: int
    n_upsample: int
    use_proj: bool = True
    bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        li = 0
        if self.use_proj:
            k, b = _ConvParams((1, 1, C, self.intermediate),
                               (self.intermediate,) if self.bias else None,
                               name=f"layers_{li}")()
            kernel = k.reshape(C, 1, 1, self.intermediate)   # [C,P,P,O], P=1
            bias = None if b is None else jnp.broadcast_to(
                b, (1, 1, self.intermediate))
            li += 1
        else:
            kernel = jnp.eye(C, dtype=x.dtype).reshape(C, 1, 1, C)
            bias = None
        for i in range(self.n_upsample):
            cin = kernel.shape[-1]
            dk, db = _ConvParams((cin, self.out, 2, 2),
                                 (self.out,) if self.bias else None,
                                 name=f"layers_{li}")()
            kernel, bias = compose_expand(kernel, bias, dk, db)
            li += 1
        return apply_expand(x, kernel, bias)


class DepthProFusionLayer(nn.Module):
    """Fusion with learned ConvT upsample (HF DepthProFeatureFusionLayer)."""

    channels: int
    use_deconv: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, residual: Optional[jax.Array]) -> jax.Array:
        if residual is not None:
            x = x + PreActResidual(self.channels, name="res1")(residual)
        x = PreActResidual(self.channels, name="res2")(x)
        if self.use_deconv:
            # deconv(k2,s2) then 1×1 projection: both pointwise in the input
            # grid, so fold into one matmul + depth-to-space (exact) instead
            # of materializing the intermediate 2×-res tensor in HBM.
            C = x.shape[-1]
            dk, _ = _ConvParams((C, self.channels, 2, 2), None,
                                name="deconv")()
            pk, pb = _ConvParams((1, 1, self.channels, self.channels),
                                 (self.channels,), name="projection")()
            kernel = jnp.einsum("cogk,oy->cgky", dk,
                                pk.reshape(self.channels, self.channels))
            return apply_expand(x, kernel, pb)
        return nn.Conv(self.channels, (1, 1), name="projection", dtype=x.dtype)(x)


class DepthPro(nn.Module):
    """pixels [B,S,S,3] (normalized 0.5/0.5, S = image_size) → inverse depth
    [B,S',S'] at roughly half input resolution (HF head output scale)."""

    patch_px: int = 384       # encoder tile size in pixels
    vit_hidden: int = 1024
    vit_layers: int = 24
    vit_heads: int = 16
    vit_mlp: int = 4096
    vit_patch: int = 14       # dinov2 patch
    fusion: int = 256
    scaled_dims: Tuple[int, ...] = SCALED_DIMS
    hook_ids: Tuple[int, ...] = HOOK_IDS
    hook_dims: Tuple[int, ...] = HOOK_DIMS
    use_fov: bool = False
    quant: bool = False  # int8 encoder matmuls (ops/quant.py), opt-in
    debug_features: bool = False  # return the encoder feature list instead
    debug_stage: int = 99         # 1 = stop after the neck upsample blocks
    debug_fusion_only: int = 99   # N = stop after fusion layer N

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "DepthPro":
        return cls(quant=quant)

    def _encoder(self, name: str, out_layers, final_norm_indices=None):
        return Dinov2Encoder(
            hidden_size=self.vit_hidden, num_layers=self.vit_layers,
            num_heads=self.vit_heads, mlp_dim=self.vit_mlp,
            out_layers=tuple(out_layers), patch_size=self.vit_patch,
            pretrain_grid=self.patch_px // self.vit_patch,
            final_norm_indices=final_norm_indices, quant=self.quant,
            name=name,
        )

    @nn.compact
    def __call__(self, pixels: jax.Array):
        B, H, W, _ = pixels.shape
        out_size = self.patch_px // self.vit_patch  # ViT grid per tile
        last = self.vit_layers - 1

        # --- multi-scale patch encoder (one shared ViT over all tiles) ----
        scaled = [
            pixels if r == 1.0 else resize(pixels, (int(H * r), int(W * r)),
                                           mode="bilinear")
            for r in SCALED_RATIOS
        ]
        tiles = [split_to_patches(s, self.patch_px, o)
                 for s, o in zip(scaled, OVERLAP_RATIOS)]
        n_tiles = [t.shape[0] for t in tiles]
        batch_tiles = jnp.concatenate(tiles[::-1], axis=0)  # high-res first

        patch_enc = self._encoder(
            "patch_encoder", sorted(set((*self.hook_ids, last))),
            final_norm_indices=(last,),
        )
        feats = patch_enc(batch_tiles)
        ordered = sorted(set((*self.hook_ids, last)))
        by_layer = dict(zip(ordered, feats))

        def to_grid(tokens):
            n = tokens.shape[0]
            return tokens[:, 1:].reshape(n, out_size, out_size, self.vit_hidden)

        # split last-hidden-state back per scale (reverse of the concat)
        last_h = to_grid(by_layer[last])
        splits = []
        start = 0
        for cnt in n_tiles[::-1]:
            splits.append(last_h[start:start + cnt])
            start += cnt
        splits = splits[::-1]  # low-res scale first

        exponent = int(math.log2(W / out_size))
        base = H // (2 ** exponent)

        features: List[jax.Array] = []
        for i, (tile_feats, ratio) in enumerate(zip(splits, SCALED_RATIOS)):
            pad = int(MERGE_PAD * (1 / ratio))
            merged = merge_patches(tile_feats, B, pad)
            features.append(resize(merged, (base * 2 ** i, base * 2 ** i),
                                   mode="bilinear"))
        for hid in self.hook_ids:
            pad = int(MERGE_PAD * (1 / SCALED_RATIOS[-1]))
            # the full-res tiles are FIRST in the concatenated batch;
            # n_tiles entries already include the batch factor
            merged = merge_patches(to_grid(by_layer[hid])[:n_tiles[-1]], B, pad)
            size = base * 2 ** (len(SCALED_RATIOS) - 1)
            features.append(resize(merged, (size, size), mode="bilinear"))

        # --- image encoder (global anchor at tile resolution) --------------
        img_small = resize(pixels, (self.patch_px, self.patch_px), mode="bilinear")
        image_enc = self._encoder("image_encoder", (last,))
        img_tokens = image_enc(img_small)[0]
        image_features = resize(to_grid(img_tokens), (base, base), mode="bilinear")

        # --- neck: upsample pyramid + image/low-res fuse + projections -----
        img_up = FeatureUpsampleBlock(
            self.vit_hidden, self.scaled_dims[0], 1, use_proj=False, bias=True,
            name="image_block",
        )(image_features)
        ups = [img_up]
        for i, dims in enumerate(self.scaled_dims):
            ups.append(FeatureUpsampleBlock(
                dims, dims, 1, name=f"scaled_{i}")(features[i]))
        for i, dims in enumerate(self.hook_dims):
            inter = self.fusion if i == 0 else dims
            ups.append(FeatureUpsampleBlock(
                inter, dims, 2 + i, name=f"intermediate_{i}",
            )(features[len(self.scaled_dims) + i]))

        if self.debug_features:
            return [image_features, *features], ups
        if self.debug_stage == 1:
            return ups
        glob = jnp.concatenate([ups[1], ups[0]], axis=-1)
        glob = nn.Conv(self.scaled_dims[0], (1, 1), name="fuse_image_low_res",
                       dtype=glob.dtype)(glob)
        necked = [glob, *ups[2:]]
        combined_dims = (*self.scaled_dims, *self.hook_dims)
        projected = []
        for i, f in enumerate(necked):
            if i == len(necked) - 1 and combined_dims[i] == self.fusion:
                projected.append(f)
            else:
                projected.append(nn.Conv(
                    self.fusion, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name=f"projection_{i}", dtype=f.dtype)(f))

        # --- fusion chain (the neck's list is already coarsest-first) ------
        hidden = projected
        fused = None
        for j, h in enumerate(hidden[:-1]):
            layer = DepthProFusionLayer(self.fusion, name=f"fusion_{j}")
            fused = layer(h, None) if fused is None else layer(fused, h)
            if j == self.debug_fusion_only:
                return fused
        fused = DepthProFusionLayer(self.fusion, use_deconv=False,
                                    name="fusion_final")(fused, hidden[-1])
        if self.debug_fusion_only == 98:
            return fused

        # --- head -----------------------------------------------------------
        x = nn.Conv(self.fusion // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="head_conv1", dtype=fused.dtype)(fused)
        x = ConvTransposeSameStride(self.fusion // 2, 2, name="head_deconv")(x)
        x = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="head_conv2",
                    dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_conv3", dtype=x.dtype)(x)
        return nn.relu(x)[..., 0]


def build_depthpro(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
                   rng_seed: int = 0, init_size: Optional[int] = None,
                   quant: bool = False):
    model = DepthPro.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_depthpro

        params = {"params": convert_depthpro(ckpt, spec)}
    else:
        # smallest valid input: the 0.25× scale must still cover one tile,
        # so clamp any requested init size up to 4×patch_px (1536)
        size = max(init_size or 0, 4 * model.patch_px)
        float_model = DepthPro.from_spec(spec) if quant else model
        params = jit_init(float_model, jnp.zeros((1, size, size, 3), jnp.float32),
                     rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        # both ViT towers quantize; the fusion decoder stays float
        params = quantize_tree(params,
                               scope=("patch_encoder", "image_encoder"))

    def apply(p, pixels):
        return model.apply(p, pixels)

    return apply, params, spec
