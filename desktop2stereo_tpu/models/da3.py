"""Depth-Anything-3: multi-view DINOv2 (+QK-norm, 2D-RoPE, alternating
intra/cross-view attention, camera token) with DualDPT / DPT+sky heads.

Re-implements the math of the reference's DA3 runtime path (reference
models/depth_anything_3/api_n.py:43-121, model/da3.py:49-317,
model/dinov2/vision_transformer.py:83-409, model/dualdpt.py:46-383,
model/dpt.py:47-300, model/cam_dec.py): the app drives it single-view
(S=1), but the module keeps the view axis S first-class so multi-view
inference is the same program with S>1.

TPU-first notes:
- Local(intra-view)/global(cross-view) attention alternation is pure
  reshaping: [B,S,N,C] → [B·S,N,C] or [B,S·N,C]; the MXU sees one batched
  attention either way (no reference-view reordering, which only engages at
  ≥10 views and is a host-side permutation).
- 2D RoPE tables and the DualDPT's UV sin/cos positional fields are
  trace-time numpy constants per static shape — zero runtime index math.
- The full output dict (depth, conf, sky, ray, pose encoding) is one traced
  graph; when the frame program consumes only `depth`, XLA dead-code
  eliminates the camera/ray branches automatically (no manual flags, unlike
  the reference's autocast-wrapped sub-calls).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu

from desktop2stereo_tpu.models.init_util import jit_init
import numpy as np

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.dpt import (
    ConvTransposeSameStride,
    FeatureFusionLayer,
)
from desktop2stereo_tpu.ops.attention import multi_head_attention
from desktop2stereo_tpu.ops.resize import resize

# Per-variant DA3 presets (reference models/depth_anything_3/configs/*.yaml)
DA3_PRESETS = {
    # variant: (out_layers, alt_start, neck_channels, fusion_channels)
    "vits": ((5, 7, 9, 11), 4, (48, 96, 192, 384), 64),
    "vitb": ((5, 7, 9, 11), 4, (96, 192, 384, 768), 128),
    "vitl": ((11, 15, 19, 23), 8, (256, 512, 1024, 1024), 256),
    "vitg": ((19, 27, 33, 39), 13, (256, 512, 1024, 1024), 256),
}
# Mono/metric single-branch presets (da3mono-large.yaml / da3metric-large.yaml)
DA3_MONO_OUT_LAYERS = (4, 11, 17, 23)

ROPE_FREQ = 100.0
POS_EMBED_OMEGA = 100.0


# ---------------------------------------------------------------------------
# Static positional helpers (trace-time numpy)
# ---------------------------------------------------------------------------

def _rope_tables(head_dim: int, positions: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin [N, head_dim] for 2D RoPE (reference rope.py:65-207).

    positions: [N, 2] integer (y, x).  Feature dim splits in half: first half
    rotated by y, second by x; within each half the rotation pairs are
    (i, i + quarter).
    """
    half = head_dim // 2
    quarter = half // 2
    inv_freq = 1.0 / (ROPE_FREQ ** (np.arange(0, half, 2, dtype=np.float64) / half))

    def table(pos_1d: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        angles = np.einsum("n,f->nf", pos_1d.astype(np.float64), inv_freq)
        angles = np.concatenate([angles, angles], axis=-1)  # [N, half]
        return np.cos(angles), np.sin(angles)

    cy, sy = table(positions[:, 0])
    cx, sx = table(positions[:, 1])
    cos = np.concatenate([cy, cx], axis=-1).astype(np.float32)
    sin = np.concatenate([sy, sx], axis=-1).astype(np.float32)
    return cos, sin


def _apply_rope(t: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """t [B, N, H, hd]; cos/sin [N, hd] built by _rope_tables."""
    hd = t.shape[-1]
    half, quarter = hd // 2, hd // 4
    ty, tx = t[..., :half], t[..., half:]

    def rot(u):
        u1, u2 = u[..., :quarter], u[..., quarter:]
        return jnp.concatenate([-u2, u1], axis=-1)

    cos = cos[None, :, None, :].astype(t.dtype)
    sin = sin[None, :, None, :].astype(t.dtype)
    y = ty * cos[..., :half] + rot(ty) * sin[..., :half]
    x = tx * cos[..., half:] + rot(tx) * sin[..., half:]
    return jnp.concatenate([y, x], axis=-1)


def _grid_positions(gh: int, gw: int, n_special: int = 1) -> np.ndarray:
    """Token positions [(special… at 0,0), (y+1, x+1)…] (reference
    vision_transformer.py:282-298 _prepare_rope)."""
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    patch = np.stack([yy.reshape(-1) + 1, xx.reshape(-1) + 1], axis=1)
    special = np.zeros((n_special, 2), dtype=patch.dtype)
    return np.concatenate([special, patch], axis=0)


def _uv_pos_embed(h: int, w: int, channels: int, aspect: float) -> np.ndarray:
    """UV sinusoidal field [h, w, channels]·0.1 (reference dualdpt.py:332-338,
    head_utils.py create_uv_grid/position_grid_to_embed)."""
    diag = math.sqrt(aspect * aspect + 1.0)
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = np.linspace(-span_x * (w - 1) / w, span_x * (w - 1) / w, w)
    ys = np.linspace(-span_y * (h - 1) / h, span_y * (h - 1) / h, h)
    uu, vv = np.meshgrid(xs, ys)  # [h, w]

    def embed(pos: np.ndarray, dim: int) -> np.ndarray:
        omega = 1.0 / (POS_EMBED_OMEGA ** (np.arange(dim // 2, dtype=np.float64) / (dim // 2)))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    half = channels // 2
    emb = np.concatenate([embed(uu, half), embed(vv, half)], axis=-1)
    return (emb.reshape(h, w, channels) * 0.1).astype(np.float32)


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------

class DA3Attention(nn.Module):
    """DINOv2 attention + optional per-head QK LayerNorm and 2D RoPE
    (reference dinov2/layers/attention.py:29-95)."""

    hidden_size: int
    num_heads: int
    qk_norm: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, rope: Optional[Tuple[jax.Array, jax.Array]] = None):
        from desktop2stereo_tpu.models.dinov2 import _dense

        B, N, D = x.shape
        hd = D // self.num_heads
        qkv = _dense(3 * D, "qkv", x.dtype, self.quant)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd)

        q, k, v = heads(q), heads(k), heads(v)
        if self.qk_norm:
            # torch LayerNorm(head_dim) default eps 1e-5
            q = nn.LayerNorm(epsilon=1e-5, name="q_norm", dtype=q.dtype)(q)
            k = nn.LayerNorm(epsilon=1e-5, name="k_norm", dtype=k.dtype)(k)
        if rope is not None:
            cos, sin = rope
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)
        out = multi_head_attention(q, k, v).reshape(B, N, D)
        return _dense(D, "proj", x.dtype, self.quant)(out)


class DA3Mlp(nn.Module):
    hidden_size: int
    mlp_dim: int
    use_swiglu: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from desktop2stereo_tpu.models.dinov2 import _dense

        if self.use_swiglu:
            # SwiGLUFFNFused naming w12/w3 (reference swiglu_ffn.py)
            hidden = (int(self.mlp_dim * 2 / 3) + 7) // 8 * 8
            h = _dense(2 * hidden, "w12", x.dtype, self.quant)(x)
            x1, x2 = jnp.split(h, 2, axis=-1)
            return _dense(self.hidden_size, "w3", x.dtype, self.quant)(
                jax.nn.silu(x1) * x2)
        h = _dense(self.mlp_dim, "fc1", x.dtype, self.quant)(x)
        h = gelu(h)
        return _dense(self.hidden_size, "fc2", x.dtype, self.quant)(h)


class DA3Block(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_dim: int
    qk_norm: bool = False
    use_swiglu: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, rope=None) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=x.dtype)(x)
        h = DA3Attention(self.hidden_size, self.num_heads, self.qk_norm,
                         quant=self.quant, name="attention")(h, rope)
        ls1 = self.param("layer_scale1", nn.initializers.ones, (self.hidden_size,))
        x = x + h * ls1.astype(x.dtype)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=x.dtype)(x)
        h = DA3Mlp(self.hidden_size, self.mlp_dim, self.use_swiglu,
                   quant=self.quant, name="mlp")(h)
        ls2 = self.param("layer_scale2", nn.initializers.ones, (self.hidden_size,))
        return x + h * ls2.astype(x.dtype)


class DA3Backbone(nn.Module):
    """DinoVisionTransformer with alt/qknorm/rope starts (reference
    vision_transformer.py:83-409).

    __call__(pixels [B,S,H,W,3]) → (feats, cam_tokens):
      feats: tuple over out_layers of tokens [B,S,N_patch,C_out]
      cam_tokens: tuple of [B,S,C_out] camera/cls tokens
    C_out = 2·hidden if cat_token (local ‖ current features) else hidden.
    """

    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    out_layers: Tuple[int, ...]
    alt_start: int = -1          # -1 disables alternation / camera token
    qknorm_start: int = -1
    rope_start: int = -1
    cat_token: bool = True
    patch_size: int = 14
    pretrain_grid: int = 37
    use_swiglu: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self, pixels: jax.Array):
        B, S, H, W, _ = pixels.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        N = gh * gw + 1
        D = self.hidden_size

        # --- embeddings (patch conv as one matmul; DA3 keeps dinov2's
        # offset-0.1 bicubic pos interpolation) ---
        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(), (p * p * 3, D))
        pbias = self.param("patch_bias", nn.initializers.zeros, (D,))
        x = pixels.reshape(B * S, gh, p, gw, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * S, gh * gw, p * p * 3)
        x = jnp.einsum("bnd,de->bne", x, kernel.astype(x.dtype),
                       preferred_element_type=x.dtype) + pbias.astype(x.dtype)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pretrain_grid**2 + 1, D))
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            M = self.pretrain_grid
            grid = patch_pos.reshape(M, M, D).astype(jnp.float32)
            grid = resize(grid, (gh, gw), mode="bicubic",
                          scale_override=((gh + 0.1) / M, (gw + 0.1) / M))
            patch_pos = grid.reshape(1, gh * gw, D)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B * S, 1, D)).astype(x.dtype), x], axis=1
        ) + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(x.dtype)
        x = x.reshape(B, S, N, D)

        # --- camera token replaces the cls token at alt_start (reference
        # vision_transformer.py:323-342; ref alone for S==1, mean(ref,src)
        # broadcast to all views for S>1) ---
        if self.alt_start != -1:
            camera_token = self.param(
                "camera_token", nn.initializers.normal(1.0), (1, 2, D)
            )

        # --- static RoPE tables ---
        rope_local = rope_global = None
        if self.rope_start != -1:
            hd = D // self.num_heads
            pos_l = _grid_positions(gh, gw)            # real 2D coords
            pos_g = np.concatenate(                     # all patches at (1,1)
                [np.zeros((1, 2), np.int64), np.ones((gh * gw, 2), np.int64)], axis=0
            )
            cos_l, sin_l = _rope_tables(hd, pos_l)
            rope_local = (jnp.asarray(cos_l), jnp.asarray(sin_l))
            cos_g, sin_g = _rope_tables(hd, pos_g)
            # global attention runs over S·N tokens: tile per view
            rope_global = (
                jnp.asarray(np.tile(cos_g, (S, 1))),
                jnp.asarray(np.tile(sin_g, (S, 1))),
            )

        feats, cams = [], []
        last_local = x
        for i in range(self.num_layers):
            use_qk = self.qknorm_start != -1 and i >= self.qknorm_start
            block = DA3Block(
                D, self.num_heads, self.mlp_dim, qk_norm=use_qk,
                use_swiglu=self.use_swiglu, quant=self.quant,
                name=f"layer_{i}",
            )
            if self.alt_start != -1 and i == self.alt_start:
                # Reference vision_transformer.py:324-342: S==1 uses the ref
                # token alone; S>1 broadcasts mean(ref, src) to EVERY view's
                # slot 0 (torch assigns a [B,1,D] cam_token into x[:, :, 0]).
                if S > 1:
                    cam = (camera_token[:, :1] + camera_token[:, 1:2]) / 2.0
                else:
                    cam = camera_token[:, :1]
                cam = jnp.broadcast_to(cam, (B, S, D))
                x = x.at[:, :, 0, :].set(cam.astype(x.dtype))

            use_rope = self.rope_start != -1 and i >= self.rope_start
            is_global = (
                self.alt_start != -1 and i >= self.alt_start and i % 2 == 1
            )
            if is_global:
                h = block(
                    x.reshape(B, S * N, D), rope_global if use_rope else None
                )
                x = h.reshape(B, S, N, D)
            else:
                h = block(
                    x.reshape(B * S, N, D), rope_local if use_rope else None
                )
                x = h.reshape(B, S, N, D)
                last_local = x

            if i in self.out_layers:
                out_x = (
                    jnp.concatenate([last_local, x], axis=-1)
                    if self.cat_token else x
                )
                feats.append(out_x)

        # final norm: on the second (current-feature) half only when
        # concatenated (reference vision_transformer.py:394-405)
        ln = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=x.dtype)
        outs, cam_tokens = [], []
        for f in feats:
            # camera token is extracted PRE-norm (reference
            # vision_transformer.py:393 collects it before self.norm)
            cam_tokens.append(f[:, :, 0])
            if self.cat_token:
                f = jnp.concatenate([f[..., :D], ln(f[..., D:])], axis=-1)
            else:
                f = ln(f)
            outs.append(f[:, :, 1:])
        return tuple(outs), tuple(cam_tokens)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def _activate(x: jax.Array, kind: str) -> jax.Array:
    """(reference dualdpt.py:360-383 _apply_activation_single)"""
    if kind == "exp":
        return jnp.exp(x)
    if kind == "expp1":
        return jnp.exp(x) + 1.0
    if kind == "relu":
        return nn.relu(x)
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind == "linear":
        return x
    raise ValueError(kind)


class _DA3Reassemble(nn.Module):
    """Shared stage pipeline: token norm → 1x1 project (+uv pos) → resize."""

    neck_channels: Sequence[int]
    use_norm: bool        # DualDPT: LayerNorm; DPT(mono): identity
    pos_embed: bool
    patch_size: int

    @nn.compact
    def __call__(self, feats, gh, gw, aspect):
        out = []
        ln = nn.LayerNorm(epsilon=1e-5, name="norm") if self.use_norm else None
        for i, f in enumerate(feats):
            BS, Np, C = f.shape
            if ln is not None:
                f = ln(f)
            g = f.reshape(BS, gh, gw, C)
            g = nn.Conv(self.neck_channels[i], (1, 1), name=f"project_{i}", dtype=g.dtype)(g)
            if self.pos_embed:
                pe = _uv_pos_embed(gh, gw, self.neck_channels[i], aspect)
                g = g + jnp.asarray(pe, dtype=g.dtype)
            if i == 0:
                g = ConvTransposeSameStride(self.neck_channels[0], 4, name="resize_0")(g)
            elif i == 1:
                g = ConvTransposeSameStride(self.neck_channels[1], 2, name="resize_1")(g)
            elif i == 3:
                g = nn.Conv(self.neck_channels[3], (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], name="resize_3", dtype=g.dtype)(g)
            out.append(g)
        return out


class _FusionChain(nn.Module):
    """refinenet4→1 chain over rn features (reference dualdpt.py:289-330)."""

    fusion_channels: int
    suffix: str = ""

    @nn.compact
    def __call__(self, rn, collect_all: bool = False):
        l1, l2, l3, l4 = rn
        sizes = [
            (l3.shape[1], l3.shape[2]),
            (l2.shape[1], l2.shape[2]),
            (l1.shape[1], l1.shape[2]),
            (l1.shape[1] * 2, l1.shape[2] * 2),
        ]
        laterals = [None, l3, l2, l1]
        outs = []
        fused = None
        for j in range(4):
            layer = FeatureFusionLayer(
                self.fusion_channels, name=f"fusion{self.suffix}_{j}"
            )
            fused = (
                layer(l4, None, sizes[j]) if j == 0
                else layer(fused, laterals[j], sizes[j])
            )
            outs.append(fused)
        return outs if collect_all else fused


class DA3DualDPT(nn.Module):
    """DualDPT: main depth(+conf) head and aux ray(+conf) head with separate
    fusion chains (reference dualdpt.py:46-338)."""

    dim_in: int
    neck_channels: Sequence[int]
    fusion_channels: int
    patch_size: int = 14
    output_dim: int = 2
    aux_dim: int = 7
    activation: str = "exp"
    conf_activation: str = "expp1"

    @nn.compact
    def __call__(self, feats, H: int, W: int):
        # feats: list of 4 token tensors [B,S,N,C]; fold views into batch
        B, S, Np, C = feats[0].shape
        flat = [f.reshape(B * S, Np, C) for f in feats]
        gh, gw = H // self.patch_size, W // self.patch_size
        aspect = W / H

        stages = _DA3Reassemble(
            self.neck_channels, use_norm=True, pos_embed=True,
            patch_size=self.patch_size, name="reassemble",
        )(flat, gh, gw, aspect)

        rn = [
            nn.Conv(self.fusion_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name=f"conv_{i}", dtype=s.dtype)(s)
            for i, s in enumerate(stages)
        ]

        # main chain → output_conv1 → upsample → +uv pos → head convs
        fused = _FusionChain(self.fusion_channels, name="main")(rn)
        fused = nn.Conv(self.fusion_channels // 2, (3, 3), padding=[(1, 1), (1, 1)],
                        name="head_conv1", dtype=fused.dtype)(fused)
        fused = resize(fused, (gh * self.patch_size, gw * self.patch_size),
                       mode="bilinear", align_corners=True)
        # full-output-res table (up to ~tens of MB at the top DA3 menu
        # resolutions): hoist_const routes it in as a runtime argument
        # when the caller is hjit (programs.py model program) instead of
        # an inline HLO constant (~70x slower device landing, bloated
        # persistent cache — CLAUDE.md rule); plain-jit callers fall back
        # to jnp.asarray unchanged
        from desktop2stereo_tpu.ops.hoist import hoist_const

        pe = _uv_pos_embed(fused.shape[1], fused.shape[2], self.fusion_channels // 2, aspect)
        fused = fused + hoist_const(pe).astype(fused.dtype)
        h = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="head_conv2", dtype=fused.dtype)(fused)
        h = nn.relu(h)
        logits = nn.Conv(self.output_dim, (1, 1), name="head_conv3", dtype=h.dtype)(h)
        main = _activate(logits[..., :-1], self.activation)
        conf = _activate(logits[..., -1], self.conf_activation)

        # aux chain (only the finest level is consumed; reference
        # dualdpt.py:269-277)
        aux_all = _FusionChain(self.fusion_channels, suffix="_aux", name="aux")(
            rn, collect_all=True
        )
        # aux stays at its native (2·l1) scale — the reference never
        # upsamples the ray branch to image resolution (dualdpt.py:269-277)
        a = aux_all[-1]
        fc = self.fusion_channels
        widths = (fc // 2, fc, fc // 2, fc, fc // 2)
        for k, wdt in enumerate(widths):
            a = nn.Conv(wdt, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"aux_conv1_{k}", dtype=a.dtype)(a)
        pe_a = _uv_pos_embed(a.shape[1], a.shape[2], fc // 2, aspect)
        a = a + hoist_const(pe_a).astype(a.dtype)
        a = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="aux_conv2", dtype=a.dtype)(a)
        a = nn.LayerNorm(epsilon=1e-5, name="aux_ln", dtype=a.dtype)(a)
        a = nn.relu(a)
        aux_logits = nn.Conv(self.aux_dim, (1, 1), name="aux_conv3", dtype=a.dtype)(a)
        ray = aux_logits[..., :-1]
        ray_conf = _activate(aux_logits[..., -1], self.conf_activation)

        def unfold(t):
            return t.reshape(B, S, *t.shape[1:])

        return {
            "depth": unfold(main[..., 0]),
            "depth_conf": unfold(conf),
            "ray": unfold(ray),
            "ray_conf": unfold(ray_conf),
        }


class DA3DPT(nn.Module):
    """Single-branch DPT with sky head (reference dpt.py:47-300; used by
    DA3MONO / DA3METRIC: identity token norm, no uv pos embed)."""

    dim_in: int
    neck_channels: Sequence[int]
    fusion_channels: int
    patch_size: int = 14
    activation: str = "exp"
    use_sky_head: bool = True

    @nn.compact
    def __call__(self, feats, H: int, W: int):
        B, S, Np, C = feats[0].shape
        flat = [f.reshape(B * S, Np, C) for f in feats]
        gh, gw = H // self.patch_size, W // self.patch_size

        stages = _DA3Reassemble(
            self.neck_channels, use_norm=False, pos_embed=False,
            patch_size=self.patch_size, name="reassemble",
        )(flat, gh, gw, W / H)
        rn = [
            nn.Conv(self.fusion_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name=f"conv_{i}", dtype=s.dtype)(s)
            for i, s in enumerate(stages)
        ]
        fused = _FusionChain(self.fusion_channels, name="main")(rn)
        # NOTE: single DPT applies output_conv1 then upsamples (reference
        # dpt.py:253-255 — opposite order to DualDPT)
        fused = nn.Conv(self.fusion_channels // 2, (3, 3), padding=[(1, 1), (1, 1)],
                        name="head_conv1", dtype=fused.dtype)(fused)
        fused = resize(fused, (gh * self.patch_size, gw * self.patch_size),
                       mode="bilinear", align_corners=True)
        h = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="head_conv2", dtype=fused.dtype)(fused)
        h = nn.relu(h)
        logits = nn.Conv(1, (1, 1), name="head_conv3", dtype=h.dtype)(h)
        out = {"depth": _activate(logits[..., 0], self.activation).reshape(B, S, *logits.shape[1:3])}
        if self.use_sky_head:
            sk = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="sky_conv2", dtype=fused.dtype)(fused)
            sk = nn.relu(sk)
            sk_logits = nn.Conv(1, (1, 1), name="sky_conv3", dtype=sk.dtype)(sk)
            out["sky"] = nn.relu(sk_logits[..., 0]).reshape(B, S, *sk_logits.shape[1:3])
        return out


class DA3CameraDec(nn.Module):
    """Pose decoder: camera token → (t[3], quat[4], fov[2]) encoding
    (reference cam_dec.py:19-45)."""

    dim_in: int

    @nn.compact
    def __call__(self, cam_token: jax.Array) -> jax.Array:
        B, S, C = cam_token.shape
        h = cam_token.reshape(B * S, C)
        h = nn.relu(nn.Dense(C, name="fc0", dtype=h.dtype)(h))
        h = nn.relu(nn.Dense(C, name="fc1", dtype=h.dtype)(h))
        t = nn.Dense(3, name="fc_t", dtype=h.dtype)(h)
        qvec = nn.Dense(4, name="fc_qvec", dtype=h.dtype)(h)
        fov = nn.relu(nn.Dense(2, name="fc_fov", dtype=h.dtype)(h))
        return jnp.concatenate([t, qvec, fov], axis=-1).reshape(B, S, 9)


# ---------------------------------------------------------------------------
# Full nets
# ---------------------------------------------------------------------------

class DepthAnything3(nn.Module):
    """DA3 net: backbone + head (+ camera decoder for anyview presets).

    __call__(pixels [B,S,H,W,3]) → dict with depth [B,S,H,W] (+conf/ray/sky/
    pose_enc per preset).  Mirrors reference model/da3.py:109-162 minus the
    GS branch (3DGS export is out of scope for the stereo pipeline; see
    SURVEY §2.2 — the gs/ subpackage is unused by the app loop).
    """

    variant: str
    mode: str = "anyview"   # "anyview" (DualDPT+cam) | "mono" | "metric"
    hidden_size: int = 0
    num_layers: int = 0
    num_heads: int = 0
    mlp_dim: int = 0
    quant: bool = False  # int8 encoder matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec,
                  quant: bool = False) -> "DepthAnything3":
        hidden, layers, heads, mlp = spec.dims
        mode = "anyview"
        if "MONO" in spec.name.upper():
            mode = "mono"
        elif "METRIC" in spec.name.upper() and "NESTED" not in spec.name.upper():
            mode = "metric"
        return cls(variant=spec.variant, mode=mode, hidden_size=hidden,
                   num_layers=layers, num_heads=heads, mlp_dim=mlp,
                   quant=quant)

    @nn.compact
    def __call__(self, pixels: jax.Array) -> Dict[str, jax.Array]:
        if pixels.ndim == 4:
            pixels = pixels[:, None]  # single view (reference api_n.py:81)
        B, S, H, W, _ = pixels.shape
        anyview = self.mode == "anyview"
        out_layers, alt_start, neck, fusion = DA3_PRESETS[self.variant]
        if not anyview:
            out_layers, alt_start = DA3_MONO_OUT_LAYERS, -1

        feats, cam_tokens = DA3Backbone(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            out_layers=tuple(out_layers),
            alt_start=alt_start if anyview else -1,
            qknorm_start=alt_start if anyview else -1,
            rope_start=alt_start if anyview else -1,
            cat_token=anyview,
            use_swiglu=(self.variant == "vitg"),
            quant=self.quant,
            name="backbone",
        )(pixels)

        dim_in = self.hidden_size * (2 if anyview else 1)
        if anyview:
            out = DA3DualDPT(
                dim_in=dim_in, neck_channels=neck, fusion_channels=fusion,
                name="head",
            )(list(feats), H, W)
            out["pose_enc"] = DA3CameraDec(dim_in, name="cam_dec")(cam_tokens[-1])
        else:
            out = DA3DPT(
                dim_in=dim_in, neck_channels=neck, fusion_channels=fusion,
                name="head",
            )(list(feats), H, W)
        return out


def sky_to_max_depth(
    depth: jax.Array, sky: jax.Array, threshold: float = 0.3,
    quantile: float = 0.99, min_pixels: int = 10,
) -> jax.Array:
    """Mono sky post-processing (reference da3.py:164-190): set sky pixels to
    the 99th percentile of non-sky depth.  Static-shape formulation: masked
    sort instead of boolean indexing.  Statistics are per batch element —
    under device-batched multi-stream serving each row is an independent
    stream and must not see another stream's depth distribution."""
    B = depth.shape[0]
    non_sky = sky < threshold
    flat = depth.reshape(B, -1)
    mask = non_sky.reshape(B, -1)
    n_valid = jnp.sum(mask, axis=1)                              # [B]
    ranked = jnp.sort(jnp.where(mask, flat, jnp.inf), axis=1)
    q_idx = jnp.clip(
        (quantile * (n_valid.astype(jnp.float32) - 1.0)).astype(jnp.int32),
        0, flat.shape[1] - 1,
    )
    non_sky_max = jnp.take_along_axis(ranked, q_idx[:, None], axis=1)[:, 0]
    enough = (n_valid > min_pixels) & ((flat.shape[1] - n_valid) > min_pixels)
    bshape = (B,) + (1,) * (depth.ndim - 1)
    filled = jnp.where(non_sky, depth, non_sky_max.reshape(bshape))
    return jnp.where(enough.reshape(bshape), filled, depth)


def da3_depth_apply(model: DepthAnything3, apply_sky_post: bool = True):
    """pixels [B,H,W,3] → depth [B,H,W] closure for the frame program."""

    def apply(params, pixels: jax.Array) -> jax.Array:
        out = model.apply(params, pixels)
        depth = out["depth"][:, 0]  # single view
        if apply_sky_post and "sky" in out:
            depth = sky_to_max_depth(depth, out["sky"][:, 0])
        return depth

    return apply


def quat_to_mat(q: jax.Array) -> jax.Array:
    """XYZW quaternion → rotation matrix (reference transform.py:68-97)."""
    i, j, k, r = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=-1), 1e-12)
    o = jnp.stack([
        1 - two_s * (j * j + k * k), two_s * (i * j - k * r), two_s * (i * k + j * r),
        two_s * (i * j + k * r), 1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
        two_s * (i * k - j * r), two_s * (j * k + i * r), 1 - two_s * (i * i + j * j),
    ], axis=-1)
    return o.reshape(q.shape[:-1] + (3, 3))


def pose_encoding_to_extri_intri(pose_enc: jax.Array, image_hw: Tuple[int, int]):
    """(t, quat, fov) encoding → (extrinsics [..,3,4], intrinsics [..,3,3])
    (reference transform.py:41-65)."""
    T = pose_enc[..., :3]
    quat = pose_enc[..., 3:7]
    fov_h, fov_w = pose_enc[..., 7], pose_enc[..., 8]
    R = quat_to_mat(quat)
    extr = jnp.concatenate([R, T[..., None]], axis=-1)
    H, W = image_hw
    fy = (H / 2.0) / jnp.maximum(jnp.tan(fov_h / 2.0), 1e-6)
    fx = (W / 2.0) / jnp.maximum(jnp.tan(fov_w / 2.0), 1e-6)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    intr = jnp.stack([
        fx, zeros, ones * (W / 2.0),
        zeros, fy, ones * (H / 2.0),
        zeros, zeros, ones,
    ], axis=-1).reshape(pose_enc.shape[:-1] + (3, 3))
    return extr, intr


def _masked_quantile(values: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """Per-batch-element quantile over masked values, static-shape
    (inf-ranked sort).  Reduces every axis but the first; returns [B]."""
    B = values.shape[0]
    flat = values.reshape(B, -1)
    m = mask.reshape(B, -1)
    n_valid = jnp.sum(m, axis=1)
    ranked = jnp.sort(jnp.where(m, flat, jnp.inf), axis=1)
    idx = jnp.clip((q * (n_valid.astype(jnp.float32) - 1.0)).astype(jnp.int32),
                   0, flat.shape[1] - 1)
    return jnp.take_along_axis(ranked, idx[:, None], axis=1)[:, 0]


def nested_align(
    out: Dict[str, jax.Array],
    metric_out: Dict[str, jax.Array],
    image_hw: Tuple[int, int],
    sky_depth_cap: float = 200.0,
) -> jax.Array:
    """NestedDepthAnything3Net alignment (reference da3.py:319-453):
    scale the anyview depth onto the metric branch by least squares over
    confident non-sky pixels, then push sky to the q99 depth."""
    depth = out["depth"]            # [B,S,H,W]
    conf = out["depth_conf"]
    sky = metric_out["sky"]
    m_depth = metric_out["depth"]

    # metric branch scaling by focal (reference alignment.py apply_metric_scaling)
    _, intr = pose_encoding_to_extri_intri(out["pose_enc"], image_hw)
    focal = (intr[..., 0, 0] + intr[..., 1, 1]) / 2.0
    m_depth = m_depth * (focal[..., None, None] / 300.0)

    # All statistics reduce per batch element (axis 0 = independent samples /
    # streams): one stream's confidence median or least-squares scale must
    # never touch another's metric depth.
    B = depth.shape[0]
    bshape = (B,) + (1,) * (depth.ndim - 1)
    non_sky = sky < 0.3
    median_conf = _masked_quantile(conf, non_sky, 0.5).reshape(bshape)
    align = (
        (conf >= median_conf) & non_sky & (m_depth > 1e-2) & (depth > 1e-3)
    )
    a = jnp.where(align, m_depth, 0.0).reshape(B, -1)
    b = jnp.where(align, depth, 0.0).reshape(B, -1)
    scale = jnp.sum(a * b, axis=1) / jnp.maximum(jnp.sum(b * b, axis=1), 1e-12)
    depth = depth * scale.reshape(bshape)

    non_sky_max = jnp.minimum(_masked_quantile(depth, non_sky, 0.99), sky_depth_cap)
    return jnp.where(non_sky, depth, non_sky_max.reshape(bshape))


def build_da3(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
              rng_seed: int = 0, init_size: Optional[int] = None,
              quant: bool = False):
    model = DepthAnything3.from_spec(spec, quant=quant)
    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_da3

        params = {"params": convert_da3(ckpt, spec)}
    else:
        size = init_size or (spec.patch_size * 4)
        # init with the FLOAT model — quantize_tree produces the int8
        # kernel_q/scale structure the quant model consumes
        float_model = DepthAnything3.from_spec(spec) if quant else model
        params = jit_init(float_model, jnp.zeros((1, size, size, 3), jnp.float32),
                     rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        params = quantize_tree(params)
    return da3_depth_apply(model), params, spec


def build_da3_nested(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32,
                     rng_seed: int = 0, init_size: Optional[int] = None):
    """DA3NESTED-GIANT-LARGE: anyview giant + metric large branches with
    least-squares metric alignment (reference da3.py:319-453; config
    da3nested-giant-large.yaml)."""
    import dataclasses as _dc

    anyview = DepthAnything3(variant=spec.variant, mode="anyview",
                             hidden_size=spec.dims[0], num_layers=spec.dims[1],
                             num_heads=spec.dims[2], mlp_dim=spec.dims[3])
    from desktop2stereo_tpu.core.registry import VIT_VARIANTS

    lh, ll, lhd, lm = VIT_VARIANTS["vitl"]
    metric = DepthAnything3(variant="vitl", mode="metric", hidden_size=lh,
                            num_layers=ll, num_heads=lhd, mlp_dim=lm)

    from desktop2stereo_tpu.models.factory import find_checkpoint

    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_da3, to_numpy_state_dict

        sd = to_numpy_state_dict(ckpt)
        # nested checkpoints nest branches as model.da3.* / model.da3_metric.*
        def branch(prefix, branch_spec):
            # (mode — anyview vs metric — is derived from branch_spec.name
            # inside convert_da3; no separate flag)
            bsd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            return convert_da3(bsd, branch_spec)

        metric_spec = _dc.replace(spec, name="DA3METRIC-LARGE", variant="vitl")
        params = {"params": {
            "da3": branch("model.da3.model.", spec)
            if any(k.startswith("model.da3.model.") for k in sd)
            else branch("model.da3.", spec),
            "da3_metric": branch("model.da3_metric.model.", metric_spec)
            if any(k.startswith("model.da3_metric.model.") for k in sd)
            else branch("model.da3_metric.", metric_spec),
        }}
    else:
        size = init_size or (spec.patch_size * 4)
        x0 = jnp.zeros((1, size, size, 3), jnp.float32)
        params = {"params": {
            "da3": jit_init(anyview, x0, rng_seed=rng_seed)["params"],
            "da3_metric": jit_init(metric, x0, rng_seed=rng_seed + 1)["params"],
        }}
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)

    def apply(all_params, pixels: jax.Array) -> jax.Array:
        H, W = pixels.shape[-3], pixels.shape[-2]
        out = anyview.apply({"params": all_params["params"]["da3"]}, pixels)
        m_out = metric.apply({"params": all_params["params"]["da3_metric"]}, pixels)
        return nested_align(out, m_out, (H, W))[:, 0]

    return apply, params, spec
