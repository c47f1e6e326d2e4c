"""Depth-Anything V1/V2 / Distill-Any-Depth / DPT-DINOv2: DINOv2 + DPT.

Covers every MODEL_REGISTRY entry with family "depth_anything" or
"dpt_dinov2" — the models the reference serves through HF
AutoModelForDepthEstimation (reference depth.py:1645-1662).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.dinov2 import Dinov2Encoder
from desktop2stereo_tpu.models.dpt import DPTHead, DPTNeck


class DepthAnything(nn.Module):
    """pixels [B,H,W,3] (normalized) → raw depth [B,H,W] (relative disparity
    or metric depth, per spec)."""

    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    out_layers: Tuple[int, ...]
    neck_channels: Tuple[int, ...]
    fusion_channels: int
    head_channels: int = 32
    patch_size: int = 14
    use_swiglu: bool = False
    metric: bool = False
    max_depth: float = 1.0
    quant: bool = False  # int8 encoder matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec, quant: bool = False) -> "DepthAnything":
        hidden, layers, heads, mlp = spec.dims
        return cls(
            hidden_size=hidden,
            num_layers=layers,
            num_heads=heads,
            mlp_dim=mlp,
            out_layers=spec.dpt_layers,
            neck_channels=spec.neck_channels,
            fusion_channels=spec.fusion_channels,
            patch_size=spec.patch_size,
            use_swiglu=(spec.variant == "vitg"),
            metric=spec.metric,
            max_depth=spec.max_depth,
            quant=quant,
        )

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        B, H, W, _ = pixels.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        feats = Dinov2Encoder(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            out_layers=self.out_layers,
            patch_size=self.patch_size,
            use_swiglu=self.use_swiglu,
            quant=self.quant,
            name="backbone",
        )(pixels)

        grids = [f[:, 1:].reshape(B, gh, gw, self.hidden_size) for f in feats]
        fused = DPTNeck(
            neck_channels=self.neck_channels,
            fusion_channels=self.fusion_channels,
            name="neck",
        )(grids)
        return DPTHead(
            fusion_channels=self.fusion_channels,
            head_channels=self.head_channels,
            patch_size=self.patch_size,
            metric=self.metric,
            max_depth=self.max_depth,
            name="head",
        )(fused[-1], (gh, gw))
