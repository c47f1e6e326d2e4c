"""Jitted end-to-end frame programs.

The reference splits the frame path into eager torch stages with seams
(process → predict_depth → post → make_sbs/viewer shader, reference
main.py:232-262).  Here the same path runs as a chain of four jitted XLA
programs per (input-shape, settings) pair — preprocess, model, depth post,
stereo — launched back-to-back on the device stream.  See _build_step for
why four programs instead of one fused jit (XLA compile-time blowup at 4K).

Shape specialization replaces the reference's lazily-built fixed-shape
engines (reference depth.py:1841-1862): each distinct capture resolution
compiles once (persistent-cache backed) and is then O(1) to look up.
"""

from __future__ import annotations

import dataclasses
import threading
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
from desktop2stereo_tpu.ops.hoist import hjit
from desktop2stereo_tpu.ops.normalize import process_frame_size
from desktop2stereo_tpu.ops.resize import patch_aligned_size, resize
from desktop2stereo_tpu.ops.stereo import _on_tpu as _stereo_on_tpu


class FrameState(NamedTuple):
    """Carried state across frames (donated into each step)."""

    # EMA carry at MODEL resolution — the reference stabilizes depth BEFORE
    # the resize back to frame res (reference depth.py:1981-2004), so the
    # carry is the post-processed model-res depth, not the upsampled frame.
    ema_depth: jax.Array  # [mh, mw] float32; NaN-filled before first frame
    model: Any = ()       # model-specific carry (e.g. VDA rolling caches)


def init_state(height: int, width: int, model: Any = ()) -> FrameState:
    """Fresh carry.  (height, width) should be the MODEL-res depth shape
    (see `ema_shape`); a mismatched shape is tolerated — the step resets the
    EMA on shape change exactly like the reference's DepthStabilizer
    (reference depth.py:1865-1894) and carries the right shape from the
    next frame on."""
    return FrameState(
        ema_depth=jnp.full((height, width), jnp.nan, jnp.float32), model=model
    )


def ema_shape(cfg: "ProgramConfig", spec: Optional[ModelSpec],
              frame_h: int, frame_w: int) -> Tuple[int, int]:
    """Model-res depth shape (== the EMA carry shape) for a capture shape."""
    spec = spec or get_spec(cfg.model_name)
    if spec.square_only:
        return cfg.depth_resolution, cfg.depth_resolution
    oh, ow = process_frame_size(frame_h, frame_w, cfg.output_height)
    return patch_aligned_size(oh, ow, cfg.depth_resolution, spec.patch_size)


class StatefulModel(NamedTuple):
    """Streaming model surface for the frame program.

    first(pixels) → (raw_depth, model_state): builds the initial carry
    (e.g. VDA replicates frame 0's hidden states ×31, reference
    vda2_s.py:195-207).
    step(pixels, model_state) → (raw_depth, model_state').
    """

    first: Callable[[jax.Array], Tuple[jax.Array, Any]]
    step: Callable[[jax.Array, Any], Tuple[jax.Array, Any]]


class BoundModel(NamedTuple):
    """Model with params carried EXPLICITLY so the frame program can pass
    them as jit ARGUMENTS.  Closing params over the jit (a plain lambda)
    embeds hundreds of MB of weights as HLO constants, which blows XLA
    compile time from ~15 s to >10 min for ViT-L (measured on v5e).

    first/step are pure: first(params, pixels) → (raw_depth, mstate);
    step(params, pixels, mstate) → (raw_depth, mstate').
    """

    params: Any
    first: Callable
    step: Callable
    stateful: bool = True  # False → first==step semantically (one program)

    @classmethod
    def stateless(cls, apply_fn: Callable, params: Any) -> "BoundModel":
        def first(p, x):
            return apply_fn(p, x), ()

        def step(p, x, s):
            return apply_fn(p, x), s

        return cls(params=params, first=first, step=step, stateful=False)


def _as_bound(model_apply) -> BoundModel:
    """Adapt any supported model surface to BoundModel:
    - BoundModel: as is (the fast path — params as jit args);
    - object with .first/.step (closure-bound stateful): wrapped;
    - plain callable pixels→depth: wrapped (fine for cheap test models;
      real models should use BoundModel)."""
    if isinstance(model_apply, BoundModel):
        return model_apply
    if hasattr(model_apply, "first") and hasattr(model_apply, "step"):
        return BoundModel(
            params=(),
            first=lambda _p, x: model_apply.first(x),
            step=lambda _p, x, s: model_apply.step(x, s),
        )

    def first(_p, x):
        return model_apply(x), ()

    def step(_p, x, s):
        return model_apply(x), s

    return BoundModel(params=(), first=first, step=step, stateful=False)


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
    # per-eye viewport edge feathering (reference viewer.py:586-613,
    # KEY_B toggle, default off, width 2% of view — viewer.py:1342-1343)
    edge_feather: bool = False
    # pad each eye to 16:9 before arrangement (the reference Streamer
    # path's FILL_16_9, depth.py:2175-2177 / main.py:1340)
    fill_16_9: bool = False
    # which depth the step RETURNS to the host: "full" = upsampled to
    # output res (the reference's resize-back, depth.py:1999-2004);
    # "model" = the model-res post-processed depth (what sinks that merely
    # forward depth — e.g. the XR frame server, whose client samples the
    # depth texture bilinearly anyway — actually need; ~30x less d2h).
    # Sinks advertise `wants_depth` and the CLI negotiates (sinks/).
    emit_depth: str = "full"

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
            fill_16_9=s.fill_16_9,
        )


def build_frame_step(
    cfg: ProgramConfig,
    model_apply,
    spec: Optional[ModelSpec] = None,
    compute_dtype=jnp.bfloat16,
    jit: bool = True,
    batch: int = 0,
    shared_model_j=None,
) -> Callable:
    """Returns jitted `step(frame_u8, state) -> (sbs_u8, depth, state)`.

    frame_u8: [H,W,3|4] uint8 BGRA/BGR capture frame (device array).
    sbs_u8:   [H',W',3] uint8 composed stereo frame.
    `model_apply` maps normalized NHWC pixels → raw depth [B,h,w]; it may
    also be a StatefulModel(-like) object, in which case `build_frame_step`
    returns the *streaming* step and `build_first_step` builds the carry.
    """
    bound = _as_bound(model_apply)
    return _build_step(cfg, bound, bound.step, spec, compute_dtype, jit,
                       first=False, batch=batch, shared_model_j=shared_model_j)


def build_first_step(
    cfg: ProgramConfig,
    model_apply,
    spec: Optional[ModelSpec] = None,
    compute_dtype=jnp.bfloat16,
    jit: bool = True,
    shared_stages=None,
    shared_model_j=None,
    batch: int = 0,
) -> Callable:
    """First-frame variant: same signature, but the model carry in the input
    state is ignored and a fresh one is built (reference vda2_s.py:195-207)."""
    bound = _as_bound(model_apply)

    def first_call(params, pixels, _model_state):
        return bound.first(params, pixels)

    return _build_step(cfg, bound, first_call, spec, compute_dtype, jit, first=True,
                       shared_stages=shared_stages, shared_model_j=shared_model_j,
                       batch=batch)


def _build_step(
    cfg: ProgramConfig,
    bound: "BoundModel",
    model_call,   # (params, pixels, model_state) -> (raw_depth, model_state')
    spec: Optional[ModelSpec],
    compute_dtype,
    jit: bool,
    first: bool,
    shared_stages=None,
    batch: int = 0,
    shared_model_j=None,
    allow_fused: bool = True,
) -> Callable:
    """Builds the frame step as FOUR chained device programs.

    One monolithic jit is the obvious design, but XLA's compile time grows
    superlinearly with graph size at 4K: the pieces compile in 3-50 s each
    while the fused whole exceeds 10 minutes (measured on v5e).  Chaining
    separately-jitted stages keeps compilation additive (~80 s total for
    ViT-L at 4K); inter-stage dispatch is ~50 µs — noise at 60 Hz — and the
    stage boundaries (frame→model-input, depth→stereo) have no profitable
    cross-stage fusion anyway, since each side reshapes the whole image.
    """
    spec = spec or get_spec(cfg.model_name)

    # Half-SBS / Half-TAB on TPU run the fully-fused stereo tail:
    # preprocess hands the DIBR pair kernel its native planar f32 layout
    # (no HWC→planar glue in the hot loop), and depth-post + pair-mean
    # squeeze + DIBR at OUTPUT resolution + u8 quantize run as ONE program
    # (the kernel emits finished u8 eye buffers).
    fused_stereo = (jit and allow_fused and cfg.quality == "high"
                    and cfg.display_mode in ("Half-SBS", "Half-TAB")
                    and not cfg.fill_16_9  # per-eye pad → generic tail
                    and _stereo_on_tpu())

    def _shared_preprocess(frame_u8: jax.Array):
        # BGRA→RGB + output-height downscale + model-input resize/normalize
        rgb_full = bgra_to_rgb(frame_u8).astype(compute_dtype)
        h0, w0 = rgb_full.shape[0], rgb_full.shape[1]
        oh, ow = process_frame_size(h0, w0, cfg.output_height)
        if (oh, ow) != (h0, w0):
            rgb = resize(rgb_full, (oh, ow), mode="bilinear", antialias=oh < h0)
        else:
            rgb = rgb_full
        if spec.square_only:
            mh = mw = cfg.depth_resolution
            model_in = resize(rgb[None], (mh, mw), mode="bilinear") / 255.0
        else:
            mh, mw = patch_aligned_size(oh, ow, cfg.depth_resolution, spec.patch_size)
            model_in = (
                resize(rgb[None], (mh, mw), mode="bicubic", antialias=True) / 255.0
            )
        model_in = normalize_for_model(model_in, spec.norm_family)
        return rgb, model_in.astype(compute_dtype)

    def preprocess(frame_u8: jax.Array):
        h0, w0 = frame_u8.shape[0], frame_u8.shape[1]
        oh, ow = process_frame_size(h0, w0, cfg.output_height)
        sbs_mode = cfg.display_mode == "Half-SBS"
        even = ow % 2 == 0 if sbs_mode else oh % 2 == 0
        # an eye width of 3 would make the squeezed planar buffer
        # [3, eh, 3] — indistinguishable from an HWC [3, ew, 3] frame
        # downstream (the tail's shape sniff); degenerate widths take the
        # generic path
        ew_probe = ow // 2 if sbs_mode else ow
        if not (fused_stereo and even and ew_probe != 3):
            return _shared_preprocess(frame_u8)

        # Fused-stereo layout: go PLANAR [3,H,W] f32 straight from the u8
        # capture frame (one relayout, fused with the BGRA swizzle+cast)
        # instead of materializing an HWC float frame and re-transposing it
        # for the kernel — the HWC→CHW relayout of a 4K f32 frame alone
        # costs ~1.3 ms on v5e.
        planar = bgra_to_rgb(frame_u8).transpose(2, 0, 1).astype(jnp.float32)
        if (oh, ow) != (h0, w0):
            planar = resize(planar[..., None], (oh, ow), mode="bilinear",
                            antialias=oh < h0)[..., 0]
        small = planar.astype(compute_dtype)[..., None]
        if spec.square_only:
            mh = mw = cfg.depth_resolution
            mi = resize(small, (mh, mw), mode="bilinear")[..., 0]
        else:
            mh, mw = patch_aligned_size(oh, ow, cfg.depth_resolution, spec.patch_size)
            mi = resize(small, (mh, mw), mode="bicubic", antialias=True)[..., 0]
        model_in = mi.transpose(1, 2, 0)[None] / 255.0  # tiny HWC relayout
        model_in = normalize_for_model(model_in, spec.norm_family)

        # Squeeze to the EYE size here, not in the tail: the DIBR kernel
        # reads its rgb tiles 3× (row halos), so handing it the half-size
        # buffer halves that traffic AND the full-size f32 planar frame
        # never reaches HBM at all (the model-resize input above
        # materializes at bf16 only).  Pair-mean via reduce_window: 0.14 ms
        # at 4K on v5e vs 1.10 ms for reshape(-1,2).mean (lane-shuffle
        # bound) — and pair-mean IS the reference's sampling: its half-size
        # viewports sample the full-res texture at texel-pair midpoints,
        # where GL bilinear weighting is exactly (a+b)/2
        # (reference viewer.py:1520-1544).
        tab = cfg.display_mode == "Half-TAB"
        rwin = (1, 2, 1) if tab else (1, 1, 2)
        rgb_h = jax.lax.reduce_window(
            planar, 0.0, jax.lax.add, rwin, rwin, "VALID") * 0.5
        # unpadded: the tail pads to its own pair_tiling (usually a no-op —
        # pair_tiling prefers a tile height that divides the frame)
        return rgb_h, model_in.astype(compute_dtype)

    def model_stage(params, model_in: jax.Array, model_state):
        raw_depth_b, new_model_state = model_call(params, model_in, model_state)
        return raw_depth_b[0], new_model_state

    def post_stage(raw_depth: jax.Array, ema_prev: jax.Array):
        """Depth post + temporal EMA at MODEL resolution (the reference's
        order: post_process_depth → DepthStabilizer → resize-back,
        reference depth.py:1981-2004).  Returns the model-res depth — the
        next frame's EMA carry; the upsample to output res lives in the
        stereo/fused stage (it knows the output dims from rgb)."""
        depth = post_process_depth(
            raw_depth.astype(jnp.float32),
            metric=spec.metric,
            foreground_scale=cfg.foreground_scale,
            aa_strength=cfg.aa_strength,
        )
        if cfg.temporal_smooth and ema_prev.shape == depth.shape:
            smoothed = ema_op(ema_prev, depth, cfg.ema_alpha)
            depth = jnp.where(jnp.isnan(ema_prev), depth, smoothed)
        # shape mismatch (carry from another capture shape) → passthrough:
        # the reference resets its stabilizer on shape change (depth.py:
        # 1865-1894); the returned depth re-seeds the carry either way
        return depth

    def upsample_depth(depth_small: jax.Array, oh: int, ow: int) -> jax.Array:
        """Model-res → output-res (reference depth.py:1999-2004)."""
        if depth_small.shape == (oh, ow):
            return depth_small
        return resize(depth_small[..., None], (oh, ow), mode="bilinear")[..., 0]

    def stereo_stage(rgb: jax.Array, depth_small: jax.Array):
        """Generic tail: upsample depth to output res, compose the display.
        Returns (sbs_u8, depth_full) — the full-res depth rides along for
        sinks that want it (emit_depth == "full")."""
        depth = upsample_depth(depth_small, rgb.shape[0], rgb.shape[1])
        sbs = stereo_compose(
            rgb.astype(jnp.float32),
            depth,
            ipd=cfg.ipd,
            depth_strength=cfg.depth_strength,
            convergence=cfg.convergence,
            display_mode=cfg.display_mode,
            quality=cfg.quality,
            feather=cfg.edge_feather,
            fill_16_9=cfg.fill_16_9,
        )
        return jnp.clip(sbs + 0.5, 0.0, 255.0).astype(jnp.uint8), depth

    def post_stereo_stage(raw_depth: jax.Array, ema_prev: jax.Array,
                          rgb_pre: jax.Array):
        """Fused tail: depth post → output-res DIBR pair → Half-SBS/TAB u8.

        Each eye renders at its OUTPUT size (ow/2 wide for Half-SBS, oh/2
        tall for Half-TAB) from a pair-mean-squeezed source — the
        reference viewer's own semantics: per-eye viewports are half the
        window and the fragment shader samples a mip-biased texture per
        OUTPUT pixel (reference viewer.py:1520-1544, LOD bias
        frame.py:28-60).  Halves the DIBR kernel's per-frame work vs
        warping full-size and squeezing after (the disparity in output
        pixels is identical: for Half-SBS, shift·(W/2) here equals the
        squeezed shift·W of the full-width path; Half-TAB keeps full
        width, so disparity is untouched).

        Returns (sbs_u8, depth_out, depth_small): depth_small is the next
        EMA carry; depth_out is full-res or model-res per cfg.emit_depth.

        `rgb_pre` is either the PRE-SQUEEZED planar eye buffer [3, eh, ew]
        (the fused preprocess squeezes at the source so the full-size f32
        frame never reaches HBM) or a full-size HWC frame (generic path)."""
        depth_small = post_stage(raw_depth, ema_prev)
        planar = rgb_pre.shape[0] == 3 and rgb_pre.shape[-1] != 3
        tab = cfg.display_mode == "Half-TAB"
        if planar:
            from desktop2stereo_tpu.ops.pallas.dibr import (
                dibr_render_pair_planar, pair_tiling)

            eh, ew = rgb_pre.shape[1], rgb_pre.shape[2]
            oh, ow = (2 * eh, ew) if tab else (eh, 2 * ew)
            rgb_h = rgb_pre
            if cfg.emit_depth == "full":
                # the full-res depth is an output anyway — squeeze it
                # (pair-mean IS the reference's sampling: its half-size
                # viewport samples the full-res texture at texel-pair
                # midpoints, where GL bilinear weighting is exactly
                # (a+b)/2, reference viewer.py:1520-1544)
                depth = upsample_depth(depth_small, oh, ow)
                dwin = (2, 1) if tab else (1, 2)
                dep_h = jax.lax.reduce_window(
                    depth, 0.0, jax.lax.add, dwin, dwin, "VALID") * 0.5
            else:
                # nobody consumes the full map: fold upsample + pair-mean
                # into ONE composed weight matrix (same values, half the
                # FLOPs, no [oh, ow] f32 intermediate — ops/resize.py)
                from desktop2stereo_tpu.ops.resize import resize_halved

                depth = depth_small
                dep_h = resize_halved(
                    depth_small[..., None], (oh, ow),
                    halve_axis=0 if tab else 1)[..., 0]
            hp2, wp2, _ = pair_tiling(eh, ew)
            rgb_h = jnp.pad(rgb_h, ((0, 0), (0, hp2 - eh), (0, wp2 - ew)),
                            mode="edge")
            dep_h = jnp.pad(dep_h, ((0, hp2 - eh), (0, wp2 - ew)),
                            mode="edge")[None]
            from desktop2stereo_tpu.ops.stereo import FEATHER_WIDTH

            kw = dict(ipd=cfg.ipd, depth_strength=cfg.depth_strength,
                      convergence=cfg.convergence,
                      feather=FEATHER_WIDTH if cfg.edge_feather else 0.0,
                      height=eh)
            # eyes_u8 + XLA relayout, NOT the kernel's in-kernel HWC
            # interleave: the interleave's per-lane-group gathers cost
            # ~0.6 ms of VPU shuffles while XLA's u8 transpose+concat of
            # the quantized eyes costs ~0.3 ms (benchmarks/dibr.py r04:
            # 2.51 vs 2.78 ms at the 4K eye shape) — the r03 measurement
            # that motivated the fused interleave compared against an f32
            # relayout, not the u8 one.  Bit-exact either way (quantize
            # commutes with the permutation; bench.py kernel_parity pins
            # the hwc modes against eyes_u8 at 0 LSB).
            left, right = dibr_render_pair_planar(
                rgb_h, dep_h, ew, out_mode="eyes_u8", **kw)
            sbs = jnp.concatenate(
                [left[:, :eh, :ew], right[:, :eh, :ew]],
                axis=1 if tab else 2,
            ).transpose(1, 2, 0)
        else:  # odd halved axis etc. — generic path on HWC
            sbs, depth = stereo_stage(rgb_pre, depth_small)
        depth_out = depth if cfg.emit_depth == "full" else depth_small
        return sbs, depth_out, depth_small

    if not jit:
        def step_eager(frame_u8: jax.Array, state: FrameState):
            rgb, model_in = preprocess(frame_u8)
            raw, mstate = model_stage(bound.params, model_in, state.model)
            depth_small = post_stage(raw, state.ema_depth)
            sbs, depth = stereo_stage(rgb, depth_small)
            depth_out = depth if cfg.emit_depth == "full" else depth_small
            return sbs, depth_out, FrameState(ema_depth=depth_small,
                                              model=mstate)

        return step_eager

    if batch:
        # Batched-stream mode (BASELINE configs[4]): every stage is vmapped
        # over a leading stream axis BEFORE its jit, so S concurrent feeds
        # run as ONE device program per stage (filling the MXU that a
        # batch-1 frame leaves idle) while keeping the staged-compile
        # property.  The model already takes a batch dim; stack streams
        # into it instead of double-vmapping.
        # Streaming models batch too: the VDA module's leading dim is B·T,
        # so S streams at frames=1 are batch B=S and the rolling caches
        # stack on their leading dim ([S, P, CACHE_LEN, C]) — each stream's
        # temporal attention only sees its own cache rows.
        preprocess = jax.vmap(preprocess)
        stateful = getattr(bound, "stateful", False)

        def batched_model(params, model_in, model_state, fresh):
            # model_in [S,1,h,w,3] → [S,h,w,3] through the model's own batch
            raw_b, new_state = model_call(params, model_in[:, 0], model_state)
            if stateful and not first and fresh is not None:
                # a stream with no fresh frame re-submits its previous frame
                # (keeps the batch full), but its TEMPORAL carry must not
                # absorb the duplicate — a slow stream would otherwise fill
                # its rolling window with copies.  Mask the update per row.
                def sel(new, old):
                    m = fresh.reshape((fresh.shape[0],) + (1,) * (new.ndim - 1))
                    return jnp.where(m, new, old)

                new_state = jax.tree.map(sel, new_state, model_state)
            return raw_b, new_state

        if shared_stages is not None:
            stages = shared_stages
        elif fused_stereo:
            stages = (hjit(preprocess), hjit(jax.vmap(post_stereo_stage)))
        else:
            stages = (hjit(preprocess), hjit(jax.vmap(post_stage)),
                      hjit(jax.vmap(stereo_stage)))
        model_j = jax.jit(batched_model) if first else jax.jit(
            batched_model, donate_argnums=(2,))
        if len(stages) == 2:
            pre_j, tail_j = stages

            def step(frame_u8: jax.Array, state: FrameState, fresh=None):
                rgb_pre, model_in = pre_j(frame_u8)
                raw, mstate = model_j(bound.params, model_in, state.model, fresh)
                sbs, depth, small = tail_j(raw, state.ema_depth, rgb_pre)
                return sbs, depth, FrameState(ema_depth=small, model=mstate)
        else:
            pre_j, post_j, stereo_j = stages

            def step(frame_u8: jax.Array, state: FrameState, fresh=None):
                rgb, model_in = pre_j(frame_u8)
                raw, mstate = model_j(bound.params, model_in, state.model, fresh)
                small = post_j(raw, state.ema_depth)
                sbs, depth = stereo_j(rgb, small)
                out = depth if cfg.emit_depth == "full" else small
                return sbs, out, FrameState(ema_depth=small, model=mstate)
        step.stages = stages  # share between first/step builds
        step.model_j = model_j  # introspection (stage timing tools)
        return step

    if shared_stages is not None:
        stages = shared_stages
    elif fused_stereo:
        # NOTE: the EMA carry is NOT donated — the returned depth array IS
        # the next carry and is also handed to the sink thread, which may
        # still be reading it when the next step runs.
        stages = (hjit(preprocess), hjit(post_stereo_stage))
    else:
        stages = (hjit(preprocess), hjit(post_stage), hjit(stereo_stage))
    # the model carry is donated so streaming state updates in place;
    # params ride as jit ARGUMENTS (see BoundModel docstring).  The model
    # program is display-mode-independent, so mode variants share it
    # (shared_model_j) instead of re-tracing a ViT per hot-key press.
    if shared_model_j is not None:
        model_j = shared_model_j
    elif bound.stateful:
        # donated temporal carry needs jax.jit (HoistedJit has no
        # donation); stateful models carry no multi-MB host tables anyway
        model_j = (jax.jit(model_stage) if first
                   else jax.jit(model_stage, donate_argnums=(2,)))
    else:
        # hjit: models that build big host tables at trace time (DA3's
        # full-res UV pos embeds) hand them in as runtime args via
        # hoist_const instead of inline HLO constants (CLAUDE.md rule)
        model_j = hjit(model_stage)

    if len(stages) == 2:
        pre_j, post_stereo_j = stages

        # Runtime fallback (the reference's engine→PyTorch downgrade,
        # reference depth.py:1620-1630): a Pallas lowering/VMEM failure at
        # an untested resolution swaps in a generic jnp tail instead of
        # killing the stream.  Tail-only so the (donated-carry) model step
        # never re-runs for the same frame.
        def _generic_tail(raw_depth, ema_prev, frame_u8):
            # the fused preprocess hands the tail a pre-squeezed eye buffer,
            # which the generic compositor can't use — rebuild the full HWC
            # frame from the capture (the model resize inside
            # _shared_preprocess is dead code here and DCE'd by XLA)
            rgb, _unused_model_in = _shared_preprocess(frame_u8)
            small = post_stage(raw_depth, ema_prev)
            sbs, depth = stereo_stage(rgb, small)
            out = depth if cfg.emit_depth == "full" else small
            return sbs, out, small

        fallback = {}

        def step(frame_u8: jax.Array, state: FrameState):
            rgb_pre, model_in = pre_j(frame_u8)
            raw, mstate = model_j(bound.params, model_in, state.model)
            tail = fallback.get("tail")
            if tail is None:
                try:
                    sbs, depth, small = post_stereo_j(raw, state.ema_depth,
                                                      rgb_pre)
                    return sbs, depth, FrameState(ema_depth=small,
                                                  model=mstate)
                except Exception as e:
                    print(f"[programs] fused stereo tail failed "
                          f"({type(e).__name__}); falling back to jnp tail")
                    tail = fallback["tail"] = hjit(_generic_tail)
            sbs, depth, small = tail(raw, state.ema_depth, frame_u8)
            return sbs, depth, FrameState(ema_depth=small, model=mstate)
    else:
        pre_j, post_j, stereo_j = stages

        def step(frame_u8: jax.Array, state: FrameState):
            rgb, model_in = pre_j(frame_u8)
            raw, mstate = model_j(bound.params, model_in, state.model)
            small = post_j(raw, state.ema_depth)
            sbs, depth = stereo_j(rgb, small)
            out = depth if cfg.emit_depth == "full" else small
            return sbs, out, FrameState(ema_depth=small, model=mstate)

    step.stages = stages  # share across first/stream builds
    step.model_j = model_j  # share across display-mode variants
    return step


class BatchedProgramCache:
    """S concurrent streams through ONE vmapped program chain.

    The sequential MultiStreamEngine round-robins batch-1 programs; this
    variant stacks the streams into a device batch so the MXU sees S frames
    per launch (BASELINE configs[4] "2-stream batched stereo").  Streaming
    models (VDA) batch too: their rolling caches stack on the leading dim,
    one cache row-block per stream, built by the first-frame program.

    __call__(frames [S,H,W,C] u8) → (sbs [S,...] u8, depth [S,...])."""

    def __init__(self, cfg: ProgramConfig, model_apply, spec=None,
                 compute_dtype=jnp.bfloat16, num_streams: int = 2):
        self.cfg = cfg
        self._spec = spec
        self.num_streams = num_streams
        self._step = build_frame_step(cfg, model_apply, spec, compute_dtype,
                                      batch=num_streams)
        bound = _as_bound(model_apply)
        # the first-frame program (stacked-carry builder) shares the
        # pre/post/stereo stage programs with the step — only the model
        # program differs (first vs step semantics)
        self._first = (build_first_step(cfg, model_apply, spec, compute_dtype,
                                        batch=num_streams,
                                        shared_stages=self._step.stages)
                       if bound.stateful else None)
        self._states: Dict[Tuple[int, int, int], FrameState] = {}

    def __call__(self, frames: jax.Array, fresh=None):
        """frames [S,H,W,C] u8; fresh: optional [S] bool — rows that carry a
        NEW frame this launch.  Stale rows still compute (the batch shape
        is fixed) but a streaming model's temporal carry ignores them."""
        s, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        oh, ow = process_frame_size(h, w, self.cfg.output_height)
        key = (s, oh, ow)
        state = self._states.get(key)
        if state is None:
            mh, mw = ema_shape(self.cfg, self._spec, h, w)
            singles = [init_state(mh, mw) for _ in range(s)]
            state = jax.tree.map(lambda *xs: jnp.stack(xs), *singles)
            if self._first is not None:
                # first-frame program builds the stacked model carry
                sbs, depth, new_state = self._first(frames, state)
                self._states[key] = new_state
                return sbs, depth
        if fresh is not None:
            fresh = jnp.asarray(fresh, bool)
        sbs, depth, new_state = self._step(frames, state, fresh)
        self._states[key] = new_state
        return sbs, depth

    def reset(self) -> None:
        self._states.clear()

    def warmup(self, frame_shape: Tuple[int, ...], steps: int = 2) -> None:
        dummy = jnp.zeros((self.num_streams,) + tuple(frame_shape), jnp.uint8)
        for _ in range(max(1, steps)):
            sbs, _ = self(dummy)
        jax.block_until_ready(sbs)
        self.reset()


class ProgramCache:
    """Shape-specialized compiled programs, keyed like the reference's
    engine files (reference depth.py:1851-1859) but held by XLA's cache."""

    def __init__(self, cfg: ProgramConfig, model_apply, spec=None, compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self._model_apply = model_apply
        self._spec = spec
        self._compute_dtype = compute_dtype
        if isinstance(model_apply, BoundModel):
            self._stateful = model_apply.stateful
        else:
            self._stateful = hasattr(model_apply, "first") and hasattr(model_apply, "step")
        self._step, self._first = self._build_steps(cfg)
        # live display-mode + depth-strength switching (the reference's
        # viewer hot-keys: TAB cycles modes, UP/DOWN/0 step the depth ratio,
        # reference viewer.py:2304-2333): step variants per (mode, strength),
        # lazily compiled and kept (the persistent XLA cache makes revisits
        # ~instant); the carried state (EMA, temporal caches) is
        # variant-independent and survives every switch
        self._variants: Dict[Tuple[str, float], Tuple[Callable, Callable]] = {
            self._variant_key(cfg): (self._step, self._first)
        }
        self._pending_variant: Optional[Tuple[str, float]] = None
        # guards the pending-variant read-modify-write: setters run on sink
        # key-handler / HTTP threads while _apply_pending runs on the frame
        # thread (RLock: adjust_* call set_* internally)
        self._variant_lock = threading.RLock()
        self._strength_default = float(cfg.depth_strength)
        self._states: Dict[Tuple[int, int, int], FrameState] = {}

    def _build_steps(self, cfg: ProgramConfig, share_from=None):
        # the MODEL program is display-mode-independent: variants reuse it
        # (share_from = (step, first) of an existing variant) so a hot-key
        # mode switch never re-traces the ViT
        model_step = model_first = None
        if share_from is not None:
            model_step = getattr(share_from[0], "model_j", None)
            model_first = getattr(share_from[1], "model_j", None)
        step = build_frame_step(cfg, self._model_apply, self._spec,
                                self._compute_dtype,
                                shared_model_j=model_step)
        # Stateless models share one program; stateful ones need a distinct
        # first-frame program that builds the model carry.
        first = (
            build_first_step(cfg, self._model_apply, self._spec,
                             self._compute_dtype,
                             shared_stages=getattr(step, "stages", None),
                             shared_model_j=model_first)
            if self._stateful else step
        )
        return step, first

    MAX_DEPTH_STRENGTH = 10.0  # reference viewer.py:2321-2326 clamp

    @staticmethod
    def _variant_key(cfg: ProgramConfig) -> Tuple[str, float, bool]:
        return (cfg.display_mode, float(cfg.depth_strength),
                bool(cfg.edge_feather))

    def _pending_key(self) -> Tuple[str, float, bool]:
        return self._pending_variant or self._variant_key(self.cfg)

    def set_display_mode(self, mode: str) -> None:
        """Request a display-mode switch; applied atomically at the next
        frame (safe to call from any thread, e.g. a sink's key handler)."""
        from desktop2stereo_tpu.core.config import DISPLAY_MODES

        if mode not in DISPLAY_MODES:
            raise ValueError(f"unknown display mode {mode!r}")
        with self._variant_lock:
            self._pending_variant = (mode,) + self._pending_key()[1:]

    def cycle_display_mode(self, delta: int = 1) -> str:
        """Step through DISPLAY_MODES (viewer hot-key behavior); returns the
        newly requested mode."""
        from desktop2stereo_tpu.core.config import DISPLAY_MODES

        with self._variant_lock:
            idx = (DISPLAY_MODES.index(self._pending_key()[0]) + delta) % len(
                DISPLAY_MODES)
            self.set_display_mode(DISPLAY_MODES[idx])
        return DISPLAY_MODES[idx]

    def set_depth_strength(self, value: float) -> float:
        """Request a live depth-strength change (the reference viewer's
        UP/DOWN-key `depth_ratio` adjustment, reference viewer.py:2321-2329),
        clamped to [0, 10] and applied atomically at the next frame."""
        value = min(self.MAX_DEPTH_STRENGTH, max(0.0, float(value)))
        with self._variant_lock:
            key = self._pending_key()
            self._pending_variant = (key[0], value, key[2])
        return value

    def adjust_depth_strength(self, delta: float = 0.5) -> float:
        """Step depth strength by ±delta (reference steps 0.5)."""
        with self._variant_lock:
            return self.set_depth_strength(self._pending_key()[1] + delta)

    def reset_depth_strength(self) -> float:
        """Back to the configured value (reference KEY_0 → original)."""
        return self.set_depth_strength(self._strength_default)

    @property
    def depth_strength(self) -> float:
        return self._pending_key()[1]

    def toggle_feather(self) -> bool:
        """Toggle per-eye edge feathering (the reference viewer's KEY_B,
        reference viewer.py:2338-2339); returns the new state."""
        with self._variant_lock:
            key = self._pending_key()
            self._pending_variant = (key[0], key[1], not key[2])
        return not key[2]

    @property
    def edge_feather(self) -> bool:
        return self._pending_key()[2]

    @property
    def display_mode(self) -> str:
        return self._pending_key()[0]

    def _apply_pending(self) -> None:
        # the lock covers clear-pending → rebuild → cfg/step swap as one
        # unit: a setter racing the swap must see either the old pending or
        # the NEW cfg, never the stale cfg with pending already cleared
        with self._variant_lock:
            self._apply_pending_locked()

    def _apply_pending_locked(self) -> None:
        key = self._pending_variant
        self._pending_variant = None
        if key is None or key == self._variant_key(self.cfg):
            return
        if key not in self._variants:
            cfg = dataclasses.replace(self.cfg, display_mode=key[0],
                                      depth_strength=key[1],
                                      edge_feather=key[2])
            self._variants[key] = self._build_steps(
                cfg, share_from=(self._step, self._first))
        self.cfg = dataclasses.replace(self.cfg, display_mode=key[0],
                                       depth_strength=key[1],
                                       edge_feather=key[2])
        self._step, self._first = self._variants[key]

    def __call__(self, frame_u8: jax.Array, stream: int = 0):
        """`stream` keys the carried state (EMA depth, temporal caches) so
        several concurrent feeds — dual-display capture, multi-client
        serving — share the compiled programs without sharing state."""
        if self._pending_variant is not None:
            self._apply_pending()
        h, w = frame_u8.shape[0], frame_u8.shape[1]
        oh, ow = process_frame_size(h, w, self.cfg.output_height)
        key = (stream, oh, ow)
        state = self._states.get(key)
        if state is None:
            fresh = init_state(*ema_shape(self.cfg, self._spec, h, w))
            sbs, depth, new_state = self._first(frame_u8, fresh)
        else:
            sbs, depth, new_state = self._step(frame_u8, state)
        self._states[key] = new_state
        return sbs, depth

    def reset(self) -> None:
        self._states.clear()

    def warmup(self, frame_shape: Tuple[int, ...], steps: int = 2) -> dict:
        """Pre-compile + prime for a capture shape (reference depth.py:
        1587-1631 warmup_model): run `steps` dummy frames and discard state.

        Returns (and stores as `self.compile_report`) per-program first-call
        seconds — jit compile is synchronous on the first call, so wall
        time around it IS the compile cost.  Cold-compile budget is a
        user-visible regression axis; this is where it's accounted."""
        import time as _time

        dummy = jnp.zeros(frame_shape, jnp.uint8)
        report: Dict[str, float] = {}
        step = self._first
        stages = getattr(step, "stages", None)
        model_j = getattr(step, "model_j", None)
        if stages is not None and model_j is not None and not self._stateful:
            # time each chained program's first call individually
            state = init_state(*ema_shape(self.cfg, self._spec,
                                          frame_shape[0], frame_shape[1]))
            params = getattr(self._model_apply, "params", ())
            t0 = _time.time()
            rgb_pre, model_in = stages[0](dummy)
            report["pre_s"] = round(_time.time() - t0, 2)
            t0 = _time.time()
            raw, _ms = model_j(params, model_in, state.model)
            report["model_s"] = round(_time.time() - t0, 2)
            t0 = _time.time()
            if len(stages) == 2:
                try:
                    stages[1](raw, state.ema_depth, rgb_pre)
                    report["fused_tail_s"] = round(_time.time() - t0, 2)
                except Exception:
                    # a Pallas lowering/VMEM failure at this resolution must
                    # degrade to step()'s jnp fallback tail, not kill startup
                    # — the priming loop below runs through step(), whose
                    # try/except installs _generic_tail (see _build_step)
                    report["fused_tail_s"] = round(_time.time() - t0, 2)
                    report["fused_tail_error"] = True
            else:
                small = stages[1](raw, state.ema_depth)
                report["post_s"] = round(_time.time() - t0, 2)
                t0 = _time.time()
                stages[2](rgb_pre, small)
                report["stereo_s"] = round(_time.time() - t0, 2)
        else:
            t0 = _time.time()
            sbs, _ = self(dummy)
            report["first_step_s"] = round(_time.time() - t0, 2)
        for _ in range(max(1, steps)):
            sbs, _ = self(dummy)
        jax.block_until_ready(sbs)
        self.reset()
        self.compile_report = report
        return report
