"""DPT neck + depth head (flax.linen, NHWC) — the decoder of the
Depth-Anything family.

Math-parity reimplementation of HF's DepthAnythingNeck / DepthAnything
DepthEstimationHead (the decoder the reference runs via
AutoModelForDepthEstimation, reference depth.py:1645-1662):
reassemble (1x1 proj + {convT×4, convT×2, id, conv/2}) → 3x3 scratch convs →
feature-fusion pyramid with pre-activation residual units and
align_corners=True bilinear upsampling → 3-conv head.

TPU-first notes: conv-transpose with kernel==stride is expressed as an
einsum + pixel-shuffle reshape (one MXU matmul, exactly torch's result);
all interpolations are the dense-matmul resizes from ops/resize.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.resize import resize


class ConvTransposeSameStride(nn.Module):
    """ConvTranspose2d(C, C, k=f, s=f): each input pixel expands to an f×f
    block — an einsum + reshape (torch-equivalent, MXU-friendly)."""

    channels: int
    factor: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        f = self.factor
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (C, self.channels, f, f)
        )
        y = jnp.einsum(
            "bhwc,cogk->bhgwko", x, kernel.astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        y = y.reshape(B, H * f, W * f, self.channels)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.channels,))
            y = y + bias.astype(x.dtype)
        return y


class ReassembleLayer(nn.Module):
    """1x1 projection + spatial re-scale (HF DepthAnythingReassembleLayer)."""

    channels: int
    factor: int  # 4, 2, 1, or -2 (meaning stride-2 conv down)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.channels, (1, 1), name="projection", dtype=x.dtype)(x)
        if self.factor > 1:
            x = ConvTransposeSameStride(self.channels, self.factor, name="resize")(x)
        elif self.factor < 0:
            x = nn.Conv(
                self.channels, (3, 3), strides=(-self.factor, -self.factor),
                padding=[(1, 1), (1, 1)], name="resize", dtype=x.dtype,
            )(x)
        return x


class PreActResidual(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r = x
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv1", dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv2", dtype=x.dtype)(x)
        return x + r


class FeatureFusionLayer(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, residual=None, size=None) -> jax.Array:
        if residual is not None:
            if residual.shape != x.shape:
                residual = resize(residual, (x.shape[1], x.shape[2]), mode="bilinear")
            x = x + PreActResidual(self.channels, name="res1")(residual)
        x = PreActResidual(self.channels, name="res2")(x)
        target = size if size is not None else (x.shape[1] * 2, x.shape[2] * 2)
        x = resize(x, target, mode="bilinear", align_corners=True)
        return nn.Conv(self.channels, (1, 1), name="projection", dtype=x.dtype)(x)


class DPTNeck(nn.Module):
    neck_channels: Sequence[int]   # per-stage reassemble channels
    fusion_channels: int
    factors: Sequence[int] = (4, 2, 1, -2)

    @nn.compact
    def __call__(self, grids: Sequence[jax.Array]) -> Sequence[jax.Array]:
        """grids: 4 feature maps [B,gh,gw,D] (patch tokens reshaped)."""
        feats = []
        for i, g in enumerate(grids):
            r = ReassembleLayer(self.neck_channels[i], self.factors[i], name=f"reassemble_{i}")(g)
            r = nn.Conv(
                self.fusion_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, name=f"conv_{i}", dtype=r.dtype,
            )(r)
            feats.append(r)

        # fusion runs coarsest-first (HF reverses the list)
        fused = None
        out = []
        rev = feats[::-1]
        for idx, f in enumerate(rev):
            size = (rev[idx + 1].shape[1], rev[idx + 1].shape[2]) if idx + 1 < len(rev) else None
            layer = FeatureFusionLayer(self.fusion_channels, name=f"fusion_{idx}")
            fused = layer(f, None, size) if fused is None else layer(fused, f, size)
            out.append(fused)
        return out


class DPTHead(nn.Module):
    fusion_channels: int
    head_channels: int
    patch_size: int = 14
    metric: bool = False
    max_depth: float = 1.0

    @nn.compact
    def __call__(self, fused: jax.Array, grid_hw: Tuple[int, int]) -> jax.Array:
        gh, gw = grid_hw
        x = nn.Conv(self.fusion_channels // 2, (3, 3), padding=[(1, 1), (1, 1)], name="conv1", dtype=fused.dtype)(fused)
        x = resize(x, (gh * self.patch_size, gw * self.patch_size), mode="bilinear", align_corners=True)
        x = nn.Conv(self.head_channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv2", dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="conv3", dtype=x.dtype)(x)
        if self.metric:
            x = jax.nn.sigmoid(x) * self.max_depth
        else:
            x = nn.relu(x)
        return x[..., 0]  # [B, H, W]
