"""Jitted end-to-end frame programs.

The reference splits the frame path into eager torch stages with seams
(process → predict_depth → post → make_sbs/viewer shader, reference
main.py:232-262).  Here the entire frame→depth→stereo path compiles into ONE
XLA program per (input-shape, settings) pair: preprocessing, ViT+DPT
inference, depth post-processing, EMA and the DIBR stereo composite all fuse,
and the EMA carry is a donated buffer so steady state allocates nothing.

Shape specialization replaces the reference's lazily-built fixed-shape
engines (reference depth.py:1841-1862): each distinct capture resolution
compiles once (persistent-cache backed) and is then O(1) to look up.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.config import Settings
from desktop2stereo_tpu.core.registry import ModelSpec, get_spec
from desktop2stereo_tpu.ops import (
    bgra_to_rgb,
    normalize_for_model,
    post_process_depth,
    stereo_compose,
)
from desktop2stereo_tpu.ops.depth_post import ema as ema_op
from desktop2stereo_tpu.ops.normalize import process_frame_size
from desktop2stereo_tpu.ops.resize import patch_aligned_size, resize


class FrameState(NamedTuple):
    """Carried state across frames (donated into each step)."""

    ema_depth: jax.Array  # [H, W] float32; NaN-filled before first frame
    model: Any = ()       # model-specific carry (e.g. VDA rolling caches)


def init_state(height: int, width: int, model: Any = ()) -> FrameState:
    return FrameState(
        ema_depth=jnp.full((height, width), jnp.nan, jnp.float32), model=model
    )


class StatefulModel(NamedTuple):
    """Streaming model surface for the frame program.

    first(pixels) → (raw_depth, model_state): builds the initial carry
    (e.g. VDA replicates frame 0's hidden states ×31, reference
    vda2_s.py:195-207).
    step(pixels, model_state) → (raw_depth, model_state').
    """

    first: Callable[[jax.Array], Tuple[jax.Array, Any]]
    step: Callable[[jax.Array, Any], Tuple[jax.Array, Any]]


def _as_stateful(model_apply) -> Tuple[StatefulModel, bool]:
    """Adapt a plain `pixels→depth` callable or a StatefulModel-like object
    (anything with .first/.step) to the streaming surface."""
    if hasattr(model_apply, "first") and hasattr(model_apply, "step"):
        return StatefulModel(model_apply.first, model_apply.step), True

    def first(x):
        return model_apply(x), ()

    def step(x, s):
        return model_apply(x), s

    return StatefulModel(first, step), False


@dataclasses.dataclass(frozen=True)
class ProgramConfig:
    """Static facts baked into one compiled specialization."""

    model_name: str
    depth_resolution: int
    output_height: int
    display_mode: str
    ipd: float
    depth_strength: float
    convergence: float
    foreground_scale: float
    aa_strength: float
    ema_alpha: float
    temporal_smooth: bool
    quality: str  # "high" (DIBR+inpaint) | "fast" (grid-shift compositor)

    @classmethod
    def from_settings(cls, s: Settings, quality: str = "high") -> "ProgramConfig":
        return cls(
            model_name=s.model,
            depth_resolution=s.depth_resolution,
            output_height=s.output_resolution,
            display_mode=s.display_mode,
            ipd=s.ipd,
            depth_strength=s.depth_strength,
            convergence=s.convergence,
            foreground_scale=s.foreground_scale,
            aa_strength=s.aa_strength,
            ema_alpha=s.ema_alpha,
            temporal_smooth=s.temporal_smooth,
            quality=quality,
        )


def build_frame_step(
    cfg: ProgramConfig,
    model_apply,
    spec: Optional[ModelSpec] = None,
    compute_dtype=jnp.bfloat16,
    jit: bool = True,
) -> Callable:
    """Returns jitted `step(frame_u8, state) -> (sbs_u8, depth, state)`.

    frame_u8: [H,W,3|4] uint8 BGRA/BGR capture frame (device array).
    sbs_u8:   [H',W',3] uint8 composed stereo frame.
    `model_apply` maps normalized NHWC pixels → raw depth [B,h,w]; it may
    also be a StatefulModel(-like) object, in which case `build_frame_step`
    returns the *streaming* step and `build_first_step` builds the carry.
    """
    stateful, _ = _as_stateful(model_apply)
    return _build_step(cfg, stateful.step, spec, compute_dtype, jit, first=False)


def build_first_step(
    cfg: ProgramConfig,
    model_apply,
    spec: Optional[ModelSpec] = None,
    compute_dtype=jnp.bfloat16,
    jit: bool = True,
) -> Callable:
    """First-frame variant: same signature, but the model carry in the input
    state is ignored and a fresh one is built (reference vda2_s.py:195-207)."""
    stateful, _ = _as_stateful(model_apply)

    def first_call(pixels, _model_state):
        return stateful.first(pixels)

    return _build_step(cfg, first_call, spec, compute_dtype, jit, first=True)


def _build_step(
    cfg: ProgramConfig,
    model_call,   # (pixels, model_state) -> (raw_depth, model_state')
    spec: Optional[ModelSpec],
    compute_dtype,
    jit: bool,
    first: bool,
) -> Callable:
    spec = spec or get_spec(cfg.model_name)

    def step(frame_u8: jax.Array, state: FrameState):
        # --- preprocess: BGRA→RGB + output-height downscale (one resize) ---
        rgb_full = bgra_to_rgb(frame_u8).astype(compute_dtype)
        h0, w0 = rgb_full.shape[0], rgb_full.shape[1]
        oh, ow = process_frame_size(h0, w0, cfg.output_height)
        if (oh, ow) != (h0, w0):
            rgb = resize(rgb_full, (oh, ow), mode="bilinear", antialias=oh < h0)
        else:
            rgb = rgb_full

        # --- model input: patch-aligned resize + normalize ----------------
        if spec.square_only:
            mh = mw = cfg.depth_resolution
            model_in = resize(rgb[None], (mh, mw), mode="bilinear") / 255.0
        else:
            mh, mw = patch_aligned_size(oh, ow, cfg.depth_resolution, spec.patch_size)
            model_in = (
                resize(rgb[None], (mh, mw), mode="bicubic", antialias=True) / 255.0
            )
        model_in = normalize_for_model(model_in, spec.norm_family)

        # --- depth inference (ViT + DPT, bf16 on MXU) ----------------------
        raw_depth_b, new_model_state = model_call(
            model_in.astype(compute_dtype), state.model
        )
        raw_depth = raw_depth_b[0]

        # --- post-process in f32 (percentiles need the range) --------------
        depth = post_process_depth(
            raw_depth.astype(jnp.float32),
            metric=spec.metric,
            foreground_scale=cfg.foreground_scale,
            aa_strength=cfg.aa_strength,
        )
        # resize depth to output res (reference depth.py:1999-2004)
        depth = resize(depth[..., None], (oh, ow), mode="bilinear")[..., 0]

        # --- temporal EMA with NaN-reset semantics --------------------------
        if cfg.temporal_smooth:
            prev = state.ema_depth
            smoothed = ema_op(prev, depth, cfg.ema_alpha)
            depth = jnp.where(jnp.isnan(prev), depth, smoothed)
        new_state = FrameState(ema_depth=depth, model=new_model_state)

        # --- stereo composite ----------------------------------------------
        sbs = stereo_compose(
            rgb.astype(jnp.float32),
            depth,
            ipd=cfg.ipd,
            depth_strength=cfg.depth_strength,
            convergence=cfg.convergence,
            display_mode=cfg.display_mode,
            quality=cfg.quality,
        )
        sbs_u8 = jnp.clip(sbs + 0.5, 0.0, 255.0).astype(jnp.uint8)
        return sbs_u8, depth, new_state

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(1,))


class ProgramCache:
    """Shape-specialized compiled programs, keyed like the reference's
    engine files (reference depth.py:1851-1859) but held by XLA's cache."""

    def __init__(self, cfg: ProgramConfig, model_apply, spec=None, compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self._stateful = hasattr(model_apply, "first") and hasattr(model_apply, "step")
        self._step = build_frame_step(cfg, model_apply, spec, compute_dtype)
        # Stateless models share one program; stateful ones need a distinct
        # first-frame program that builds the model carry.
        self._first = (
            build_first_step(cfg, model_apply, spec, compute_dtype)
            if self._stateful else self._step
        )
        self._states: Dict[Tuple[int, int], FrameState] = {}

    def __call__(self, frame_u8: jax.Array):
        h, w = frame_u8.shape[0], frame_u8.shape[1]
        oh, ow = process_frame_size(h, w, self.cfg.output_height)
        key = (oh, ow)
        state = self._states.get(key)
        if state is None:
            sbs, depth, new_state = self._first(frame_u8, init_state(oh, ow))
        else:
            sbs, depth, new_state = self._step(frame_u8, state)
        self._states[key] = new_state
        return sbs, depth

    def reset(self) -> None:
        self._states.clear()

    def warmup(self, frame_shape: Tuple[int, ...], steps: int = 2) -> None:
        """Pre-compile + prime for a capture shape (reference depth.py:
        1587-1631 warmup_model): run `steps` dummy frames and discard state."""
        dummy = jnp.zeros(frame_shape, jnp.uint8)
        for _ in range(max(1, steps)):
            sbs, _ = self(dummy)
        jax.block_until_ready(sbs)
        self.reset()
