"""Video-Depth-Anything: DINOv2 + temporal DPT head with streaming KV window.

Re-implements the math of the reference's VDA family (reference
models/video_depth_anything/vda2_s.py:40-224, dpt_temporal.py:31-138,
motion_module/motion_module.py:32-321): a DINOv2 encoder feeding a DPT
decoder with four AnimateDiff-style temporal modules (on the two coarse
reassembled feature maps and the two coarse fusion paths).  Each temporal
module runs per-pixel attention across the time axis over a 32-frame window;
in streaming mode the window is a rolling cache of the previous 31 frames'
hidden states (reference vda2_s.py:177-224 `update_cache`).

TPU-first design (not a torch translation):
- Time-axis attention is a batched matmul over [B·H·W, T≤32, C] — thousands
  of tiny sequences, which XLA maps straight onto the MXU; no xformers-style
  kernel needed at T=32.
- The rolling cache is EXPLICIT carried state (`VDAState`), donated into the
  jitted step so steady-state streaming allocates nothing; the shift-left +
  append is a static-shape slice+concat that XLA turns into an in-place
  copy on the donated buffer.
- The whole step (encoder + head + cache update) compiles into one program.

Cache layout per attention site: [B, P, T_cache=31, C] where P is the number
of pixels at that site's feature scale.  Sites in order:
  0,1: temporal module 0 (reassembled layer-3 features, full patch grid)
  2,3: temporal module 1 (reassembled layer-4 features, half patch grid)
  4,5: temporal module 2 (fusion path-4, full patch grid)
  6,7: temporal module 3 (fusion path-3, double patch grid)
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.activations import gelu
import numpy as np

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.dinov2 import Dinov2Encoder
from desktop2stereo_tpu.models.dpt import FeatureFusionLayer, ReassembleLayer
from desktop2stereo_tpu.ops.resize import resize

INFER_LEN = 32          # temporal window (reference vda2_s.py:29)
CACHE_LEN = INFER_LEN - 1
NUM_HEADS = 8
NUM_ATTN_BLOCKS = 2     # attention blocks per temporal module
NUM_SITES = 4 * NUM_ATTN_BLOCKS


def _ape_table(d_model: int, max_len: int = INFER_LEN) -> np.ndarray:
    """Sin/cos absolute positional encoding (reference
    motion_module.py:192-210 PositionalEncoding)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


class TemporalAttention(nn.Module):
    """Per-pixel attention across time (reference motion_module.py:212-321).

    Input x: [R, f, C] where R = B·pixels and f is the frame count this step.
    With `cache` [R, n, C], keys/values span cache+current (window n+f) and
    queries span only the current f frames; APE positions are absolute within
    the window.  Returns (out [R, f, C], cache_entry [R, f, C]) where
    cache_entry is the pre-APE input (what the reference caches,
    motion_module.py:251-256).
    """

    channels: int
    heads: int = NUM_HEADS

    @nn.compact
    def __call__(self, x: jax.Array, cache: Optional[jax.Array] = None):
        R, f, C = x.shape
        cache_entry = x
        if cache is not None:
            full = jnp.concatenate([cache, x], axis=1)
        else:
            full = x
        n_total = full.shape[1]

        ape = jnp.asarray(_ape_table(C)[:n_total], dtype=x.dtype)
        full = full + ape[None, :, :]

        q_in = full[:, n_total - f:]
        # q/k/v have no bias (reference attention.py:81-83, bias=False)
        q = nn.Dense(C, use_bias=False, name="to_q", dtype=x.dtype)(q_in)
        k = nn.Dense(C, use_bias=False, name="to_k", dtype=x.dtype)(full)
        v = nn.Dense(C, use_bias=False, name="to_v", dtype=x.dtype)(full)

        hd = C // self.heads
        q = q.reshape(R, f, self.heads, hd)
        k = k.reshape(R, n_total, self.heads, hd)
        v = v.reshape(R, n_total, self.heads, hd)

        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum(
            "rfhd,rnhd->rhfn", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("rhfn,rnhd->rfhd", probs, v, preferred_element_type=x.dtype)
        out = out.reshape(R, f, C)
        out = nn.Dense(C, name="to_out", dtype=x.dtype)(out)
        return out, cache_entry


class TemporalTransformer(nn.Module):
    """One temporal module (reference motion_module.py:32-134): GroupNorm →
    proj_in → [2× (LayerNorm → TemporalAttention → residual)] → GEGLU FF →
    proj_out (zero-init) → residual.

    Input x: [B, T, H, W, C].  caches: None or (c0, c1) each [B, H·W, n, C].
    Returns (y, (entry0, entry1)) with entries [B, H·W, T, C].
    """

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array, caches=None):
        B, T, H, W, C = x.shape
        residual = x
        # GroupNorm is per-frame (torch sees (B·T, C, H, W)): fold T into the
        # batch so flax reduces over H,W,group only.
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm", dtype=x.dtype)(
            x.reshape(B * T, H, W, C)
        ).reshape(B, T, H, W, C)
        h = nn.Dense(C, name="proj_in", dtype=x.dtype)(h)

        # [B,T,H,W,C] → [B·HW, T, C]: each pixel is one time sequence.
        def to_seq(t):
            return t.transpose(0, 2, 3, 1, 4).reshape(B * H * W, T, C)

        def from_seq(t):
            return t.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)

        h = to_seq(h)
        entries = []
        for i in range(NUM_ATTN_BLOCKS):
            normed = nn.LayerNorm(name=f"norm_{i}", dtype=h.dtype)(h)
            c = None if caches is None else caches[i].reshape(B * H * W, -1, C)
            attn_out, entry = TemporalAttention(C, name=f"attn_{i}")(normed, c)
            h = h + attn_out
            entries.append(entry.reshape(B, H * W, T, C))

        # GEGLU feed-forward (reference attention.py FeedForward/GEGLU).
        ff_in = nn.LayerNorm(name="ff_norm", dtype=h.dtype)(h)
        proj = nn.Dense(8 * C, name="ff_proj", dtype=h.dtype)(ff_in)
        val, gate = jnp.split(proj, 2, axis=-1)
        ff = nn.Dense(C, name="ff_out", dtype=h.dtype)(
            val * gelu(gate)
        )
        h = h + ff

        h = nn.Dense(C, name="proj_out", kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, dtype=h.dtype)(h)
        y = from_seq(h) + residual
        return y, tuple(entries)


class VDAHead(nn.Module):
    """Temporal DPT head (reference dpt_temporal.py:31-138).

    Features in: 4 token grids [BT, gh, gw, D].  Time is folded into batch
    everywhere except inside the temporal modules.
    """

    neck_channels: Sequence[int]       # out_channels per reassemble stage
    fusion_channels: int               # `features`
    patch_size: int = 14

    @nn.compact
    def __call__(self, grids, frames: int, caches=None):
        factors = (4, 2, 1, -2)
        feats = []
        for i, g in enumerate(grids):
            feats.append(
                ReassembleLayer(self.neck_channels[i], factors[i], name=f"reassemble_{i}")(g)
            )
        layer1, layer2, layer3, layer4 = feats

        def temporal(idx: int, x: jax.Array):
            """Run temporal module idx on time-folded feature map [BT,h,w,C]."""
            BT, h, w, C = x.shape
            B = BT // frames
            xt = x.reshape(B, frames, h, w, C)
            site = None if caches is None else caches[2 * idx: 2 * idx + 2]
            yt, entries = TemporalTransformer(C, name=f"temporal_{idx}")(xt, site)
            return yt.reshape(BT, h, w, C), entries

        layer3, e0 = temporal(0, layer3)
        layer4, e1 = temporal(1, layer4)

        rn = []
        for i, f in enumerate((layer1, layer2, layer3, layer4)):
            rn.append(nn.Conv(
                self.fusion_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, name=f"conv_{i}", dtype=f.dtype,
            )(f))
        l1rn, l2rn, l3rn, l4rn = rn

        fuse0 = FeatureFusionLayer(self.fusion_channels, name="fusion_0")
        path4 = fuse0(l4rn, None, (l3rn.shape[1], l3rn.shape[2]))
        path4, e2 = temporal(2, path4)
        fuse1 = FeatureFusionLayer(self.fusion_channels, name="fusion_1")
        path3 = fuse1(path4, l3rn, (l2rn.shape[1], l2rn.shape[2]))
        path3, e3 = temporal(3, path3)
        fuse2 = FeatureFusionLayer(self.fusion_channels, name="fusion_2")
        path2 = fuse2(path3, l2rn, (l1rn.shape[1], l1rn.shape[2]))
        fuse3 = FeatureFusionLayer(self.fusion_channels, name="fusion_3")
        path1 = fuse3(path2, l1rn, (l1rn.shape[1] * 2, l1rn.shape[2] * 2))

        gh, gw = grids[0].shape[1], grids[0].shape[2]
        x = nn.Conv(self.fusion_channels // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="head_conv1", dtype=path1.dtype)(path1)
        x = resize(x, (gh * self.patch_size, gw * self.patch_size),
                   mode="bilinear", align_corners=True)
        x = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="head_conv2", dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="head_conv3", dtype=x.dtype)(x)
        x = nn.relu(x)
        depth = x[..., 0]
        return depth, e0 + e1 + e2 + e3


class VideoDepthAnything(nn.Module):
    """Full VDA: encoder + temporal head.

    __call__(pixels [BT,H,W,3], frames, caches) → (depth [BT,H,W], entries).
    Batch mode: frames=T, caches=None — full self-attention over the clip.
    Streaming: frames=1, caches=the 8 rolling buffers.
    """

    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    out_layers: Tuple[int, ...]
    neck_channels: Tuple[int, ...]
    fusion_channels: int
    patch_size: int = 14
    quant: bool = False  # int8 encoder matmuls (ops/quant.py), opt-in

    @classmethod
    def from_spec(cls, spec: ModelSpec,
                  quant: bool = False) -> "VideoDepthAnything":
        hidden, layers, heads, mlp = spec.dims
        return cls(
            hidden_size=hidden, num_layers=layers, num_heads=heads, mlp_dim=mlp,
            out_layers=spec.dpt_layers, neck_channels=spec.neck_channels,
            fusion_channels=spec.fusion_channels, patch_size=spec.patch_size,
            quant=quant,
        )

    @nn.compact
    def __call__(self, pixels: jax.Array, frames: int = 1, caches=None):
        BT, H, W, _ = pixels.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        feats = Dinov2Encoder(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            out_layers=self.out_layers, patch_size=self.patch_size,
            # VDA ships original-dinov2 weights: offset-0.1 pos interp
            # (reference video_depth_anything/dinov2.py:66-67)
            interpolate_offset=0.1,
            quant=self.quant,
            name="backbone",
        )(pixels)
        grids = [f[:, 1:].reshape(BT, gh, gw, self.hidden_size) for f in feats]
        depth, entries = VDAHead(
            neck_channels=self.neck_channels, fusion_channels=self.fusion_channels,
            patch_size=self.patch_size, name="head",
        )(grids, frames, caches)
        # back to input resolution (reference vda2_s.py:88 bilinear
        # align_corners=True + relu)
        depth = resize(depth[..., None], (H, W), mode="bilinear", align_corners=True)[..., 0]
        return nn.relu(depth), entries


class VDAState(NamedTuple):
    """Rolling temporal caches: 8 arrays [B, P_site, CACHE_LEN, C_site]."""

    caches: Tuple[jax.Array, ...]


def update_state(state: VDAState, entries: Sequence[jax.Array]) -> VDAState:
    """Shift-left + append this frame's entries (reference vda2_s.py:177-187).

    entries: [B, P, 1, C] per site (streaming step, frames=1).
    """
    new = tuple(
        jnp.concatenate([c[:, :, 1:], e], axis=2)
        for c, e in zip(state.caches, entries)
    )
    return VDAState(caches=new)


def init_state_from_entries(entries: Sequence[jax.Array]) -> VDAState:
    """First frame: replicate its entries ×31 (reference vda2_s.py:200-206)."""
    return VDAState(caches=tuple(
        jnp.repeat(e, CACHE_LEN, axis=2) for e in entries
    ))


def make_vda_fns(model: VideoDepthAnything):
    """Pure functions over a VDA module.

    apply(params, clip [T,H,W,3]) → depth [T,H,W] — batch mode: the leading
    dim is TIME and the whole clip self-attends (reference video_depth.py
    batch inference; also the single-frame stateless view at T=1).  Clips
    are capped at INFER_LEN=32 frames — the reference's APE table and
    temporal window end there too (motion_module.py:190-208); longer videos
    go through the streaming first/step path.
    first(params, frame [1,H,W,3]) → (depth, VDAState) — reference
    vda2_s.py:195-207 first-frame path (cache replicated ×31).
    step(params, frame, state) → (depth, state') — streaming step with
    rolling window (reference vda2_s.py:210-223).
    """

    def apply(params, pixels: jax.Array) -> jax.Array:
        if pixels.shape[0] > INFER_LEN:
            raise ValueError(
                f"VDA batch mode takes clips of ≤{INFER_LEN} frames (the "
                f"temporal window / APE table length); got {pixels.shape[0]}. "
                "Use the streaming first/step path for longer videos."
            )
        depth, _ = model.apply(params, pixels, pixels.shape[0], None)
        return depth

    def first(params, pixels: jax.Array):
        depth, entries = model.apply(params, pixels, 1, None)
        return depth, init_state_from_entries(entries)

    def step(params, pixels: jax.Array, state: VDAState):
        depth, entries = model.apply(params, pixels, 1, state.caches)
        return depth, update_state(state, entries)

    return apply, first, step


def build_vda(spec: ModelSpec, checkpoint=None, param_dtype=jnp.float32, rng_seed: int = 0,
              init_size: Optional[int] = None, quant: bool = False):
    """Factory entry: returns (apply_fn, params, spec); apply_fn is the
    clip-mode view.  Streaming first/step come from make_vda_fns."""
    from desktop2stereo_tpu.models.factory import find_checkpoint

    model = VideoDepthAnything.from_spec(spec, quant=quant)
    ckpt = checkpoint or find_checkpoint(spec)
    if ckpt is not None:
        from desktop2stereo_tpu.models.convert_hf import convert_vda

        params = {"params": convert_vda(ckpt, spec)}
    else:
        from desktop2stereo_tpu.models.init_util import jit_init

        size = init_size or (spec.patch_size * 4)
        # init with the FLOAT model — quantize_tree produces the int8
        # kernel_q/scale structure the quant model consumes
        float_model = VideoDepthAnything.from_spec(spec) if quant else model
        params = jit_init(float_model, jnp.zeros((1, size, size, 3), jnp.float32),
                          1, None, rng_seed=rng_seed)
        print(f"[models] no checkpoint found for {spec.name}; using random init")
    params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
    if quant:
        from desktop2stereo_tpu.ops.quant import quantize_tree

        params = quantize_tree(params)
    apply, _, _ = make_vda_fns(model)
    return apply, params, spec


class StreamingVDA:
    """Stateful host-side wrapper giving VDA the same `apply(params, pixels)
    -> depth` surface as the single-frame models (for standalone/debug use;
    the frame engine threads VDAState through the jitted program instead).

    Shape changes reset the stream (like the reference's first-frame path).
    """

    def __init__(self, model: VideoDepthAnything):
        self.model = model
        self._state: Optional[VDAState] = None
        self._shape: Optional[Tuple[int, ...]] = None
        _, first, step = make_vda_fns(model)
        self._first = jax.jit(first)
        self._step = jax.jit(step, donate_argnums=(2,))

    def reset(self) -> None:
        self._state = None
        self._shape = None

    def apply(self, params, pixels: jax.Array) -> jax.Array:
        if self._state is None or pixels.shape != self._shape:
            depth, self._state = self._first(params, pixels)
            self._shape = pixels.shape
        else:
            depth, self._state = self._step(params, pixels, self._state)
        return depth
