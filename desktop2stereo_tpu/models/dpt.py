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


def apply_expand(x: jax.Array, kernel: jax.Array,
                 bias: "jax.Array | None" = None) -> jax.Array:
    """Pixel-expansion as ONE matmul + depth-to-space.

    kernel [C, f, f, O] (offset-major), optional bias [f, f, O] or [O].
    out[b, f·i+p, f·j+q, o] = Σ_c x[b,i,j,c]·kernel[c,p,q,o] + bias[p,q,o].

    A k=s=f ConvTranspose is exactly this (each output pixel depends on one
    input pixel); phrasing it as a dense matmul keeps the MXU busy (measured
    65% MFU vs 13% for the strided-einsum form on v5e) and the shuffle is a
    fusable layout op.
    """
    B, H, W, C = x.shape
    _, f, f2, O = kernel.shape
    y = x.reshape(-1, C) @ kernel.astype(x.dtype).reshape(C, f * f2 * O)
    if bias is not None:
        if bias.ndim == 1:                      # per-channel, offset-invariant
            bias = jnp.broadcast_to(bias, (f, f2, O))
        y = y + bias.astype(x.dtype).reshape(-1)[None, :]
    y = y.reshape(B, H, W, f, f2, O)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * f, W * f2, O)


def compose_expand(kernel: jax.Array, bias: "jax.Array | None",
                   deconv_kernel: jax.Array,
                   deconv_bias: "jax.Array | None"):
    """Fold a k=s=2 ConvTranspose AFTER an existing expansion.

    kernel [C,P,P,O] ∘ deconv [O,O2,2,2] → [C,2P,2P,O2]; biases compose
    affinely.  Exact (pure linear maps), so stacked deconv chains and
    1×1-proj+deconv pairs collapse to one matmul — the DepthPro decoder's
    upsample pyramids drop ~14× in FLOPs this way.
    """
    f2 = jnp.einsum("cpqo,oygk->cpgqky", kernel, deconv_kernel)
    C, P, _, O = kernel.shape
    O2 = deconv_kernel.shape[1]
    f2 = f2.reshape(C, 2 * P, 2 * P, O2)
    b2 = None
    if bias is not None:
        b2 = jnp.einsum("pqo,oygk->pgqky", bias, deconv_kernel)
        b2 = b2.reshape(2 * P, 2 * P, O2)
    if deconv_bias is not None:
        b2 = deconv_bias if b2 is None else b2 + deconv_bias
        b2 = jnp.broadcast_to(b2, (2 * P, 2 * P, O2))
    return f2, b2


class ConvTransposeSameStride(nn.Module):
    """ConvTranspose2d(C, C, k=f, s=f): each input pixel expands to an f×f
    block — one matmul + depth-to-space (torch-equivalent, MXU-friendly)."""

    channels: int
    factor: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        f = self.factor
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (C, self.channels, f, f)
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.channels,))
                if self.use_bias else None)
        return apply_expand(x, kernel.transpose(0, 2, 3, 1), bias)


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


class LanePaddedConv(nn.Module):
    """nn.Conv with the OUTPUT channel dim zero-padded to a full 128-lane
    tile at apply time (param shapes/names identical to nn.Conv, so weight
    converters are untouched).

    XLA's TPU conv path runs poorly when C_out < 128 (the head's 3×3
    128→32 conv at 294×518 measures ~15% faster through the padded form
    in-graph); the padded output channels are exact zeros (zero kernel
    columns + zero bias), so downstream relu/slice see identical values —
    measured bit-exact on chip (other backends may reorder the reduction
    for last-ulp f32 drift).  `keep` slices the output back; leave
    padded (keep=None) when the consumer is another LanePaddedConv that
    eats the zeros for free."""

    features: int
    kernel: Tuple[int, int]
    keep: "int | None" = None  # None → return all 128 lanes (padded)
    LANES = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad_o = (-self.features) % self.LANES
        wp = jnp.pad(w.astype(x.dtype), ((0, 0), (0, 0), (0, 0), (0, pad_o)))
        bp = jnp.pad(b.astype(x.dtype), (0, pad_o))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, wp, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=dn) + bp
        return y if self.keep is None else y[..., : self.keep]


class _PaddedInputConv(nn.Module):
    """1×1 conv whose param shapes are the NARROW [1,1,cin,features] form
    but whose apply consumes a lane-PADDED input (cin real channels + zero
    lanes from an upstream LanePaddedConv): kernel rows for the pad lanes
    are zero, output lane-padded too, first `features` lanes returned."""

    cin: int
    features: int
    LANES = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad_i = x.shape[-1] - self.cin
        pad_o = (-self.features) % self.LANES
        wp = jnp.pad(w.astype(x.dtype),
                     ((0, 0), (0, 0), (0, pad_i), (0, pad_o)))
        bp = jnp.pad(b.astype(x.dtype), (0, pad_o))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, wp, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn) + bp
        return y[..., : self.features]


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
        # the two sub-lane-width convs run lane-padded (C_out 32 then 1
        # would leave 75-99% of the MXU idle); conv3 consumes conv2's
        # padded zeros directly — relu(0)=0 and the extra kernel rows are
        # zero, so the chain is bit-exact vs the narrow form
        x = LanePaddedConv(self.head_channels, (3, 3), name="conv2")(x)
        x = nn.relu(x)
        x = _PaddedInputConv(self.head_channels, 1, name="conv3")(x)
        if self.metric:
            x = jax.nn.sigmoid(x) * self.max_depth
        else:
            x = nn.relu(x)
        return x[..., 0]  # [B, H, W]
