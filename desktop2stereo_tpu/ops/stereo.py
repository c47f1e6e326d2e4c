"""Stereo DIBR compositing: parallax warp, hole handling, display modes.

Two quality tiers, both pure-jnp reference implementations (the fused Pallas
kernel in ops/pallas/stereo_warp.py accelerates the hot path):

1. `make_sbs` — parity with the reference's torch compositor
   (reference depth.py:2122-2184): disparity shift from destination depth,
   horizontal grid_sample with reflection padding (align_corners=True),
   SBS/TAB arrangement, area-downsample for Half modes, 16:9 padding.

2. `dibr_render` — parity with the reference's GLSL DIBR fragment shader
   (reference viewer.py:386-631): 3-tap asymmetric depth pre-smooth
   (Fehn 2004), nonlinear near-boost, edge falloff, soft disocclusion
   confidence, directional push-pull background inpaint with opposite-sweep
   fallback and vertical blur.

Conventions: rgb is [H,W,3] float in [0,255]; depth is [H,W] float in [0,1]
with near≈1 / far≈0 (post-processed).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.resize import resize

DEPTH_STRENGTH_SBS = 0.05  # reference depth.py:2141


# --------------------------------------------------------------------------
# Shared sampling helpers
# --------------------------------------------------------------------------

def _reflect_coords(px: jax.Array, size: int) -> jax.Array:
    """Reflect continuous pixel coords into [0, size-1] (grid_sample
    padding_mode='reflection' with align_corners=True semantics)."""
    if size == 1:
        return jnp.zeros_like(px)
    period = 2.0 * (size - 1)
    p = jnp.abs(px) % period
    return jnp.where(p > (size - 1), period - p, p)


def _sample_rows_bilinear(img: jax.Array, px: jax.Array) -> jax.Array:
    """Bilinear sample along the W axis at continuous coords `px` [H,W];
    img [H,W,C].  Row structure is preserved (horizontal-only warp)."""
    x0 = jnp.floor(px)
    frac = (px - x0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, img.shape[1] - 1)
    x1i = jnp.clip(x0i + 1, 0, img.shape[1] - 1)
    g0 = jnp.take_along_axis(img, x0i[..., None], axis=1)
    g1 = jnp.take_along_axis(img, x1i[..., None], axis=1)
    return g0 * (1.0 - frac) + g1 * frac


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _hsample(img: jax.Array, px: jax.Array, max_disp: int) -> jax.Array:
    """Horizontal bilinear sample dispatch: Pallas dynamic-gather kernel on
    TPU (XLA's gather scalarizes to ~100+ ms at 4K), jnp reference elsewhere.
    px must already be clamped/reflected into [0, W-1]."""
    if _on_tpu():
        try:
            from desktop2stereo_tpu.ops.pallas.warp import horizontal_sample

            squeeze = img.ndim == 2
            im = img[..., None] if squeeze else img
            out = horizontal_sample(im, px, max_disp=max_disp)
            return out[..., 0] if squeeze else out
        except Exception:
            pass
    if img.ndim == 2:
        return _sample_rows_bilinear(img[..., None], px)[..., 0]
    return _sample_rows_bilinear(img, px)


def _sample_const_offset(x: jax.Array, offset: float) -> jax.Array:
    """Sample [H,W] at j+offset (clamp-to-edge) for a STATIC offset — a
    two-tap lerp of static column shifts, no gather needed (replaces the
    GLSL texture taps at fixed parallax offsets, reference viewer.py:540)."""
    import math as _math

    i0 = _math.floor(offset)
    f = offset - i0
    a = _shift_cols(x[..., None], i0)[..., 0]
    if f == 0.0:
        return a
    b = _shift_cols(x[..., None], i0 + 1)[..., 0]
    return a * (1.0 - f) + b * f


def _is_rolled(roll: float) -> bool:
    """True unless the parallax direction (cosθ, sinθ) is ≈ (1, 0).  Both
    terms matter: roll≈π has sin≈0 but a flipped direction, and must NOT be
    routed to the horizontal-only fast paths (Pallas pair kernel, const-
    offset taps) whose sweep/fill directions assume cosθ=+1."""
    import math as _math

    return abs(_math.sin(roll)) > 1e-6 or (1.0 - _math.cos(roll)) > 1e-6


def _shift_2d(x: jax.Array, dx: float, dy: float) -> jax.Array:
    """Sample x ([H,W] or [H,W,C]) at (j+dx, i+dy) for STATIC fractional
    offsets (clamp-to-edge): a bilinear lerp of up to four static shifts —
    the roll≠0 generalization of `_sample_const_offset` (the GLSL texture
    taps along the rotated parallax direction, reference viewer.py:544)."""
    import math as _math

    ix, iy = _math.floor(dx), _math.floor(dy)
    fx, fy = dx - ix, dy - iy
    squeeze = x.ndim == 2
    v = x[..., None] if squeeze else x

    def at(jx: int, jy: int) -> jax.Array:
        return _shift_rows(_shift_cols(v, jx), jy)

    top = at(ix, iy)
    if fx:
        top = top * (1.0 - fx) + at(ix + 1, iy) * fx
    if fy:
        bot = at(ix, iy + 1)
        if fx:
            bot = bot * (1.0 - fx) + at(ix + 1, iy + 1) * fx
        top = top * (1.0 - fy) + bot * fy
    return top[..., 0] if squeeze else top


def _sample_2d_bilinear(img: jax.Array, px: jax.Array, py: jax.Array) -> jax.Array:
    """Full 2D clamp-to-edge bilinear gather at per-pixel continuous coords
    (the roll≠0 warp: GLSL texture(shifted_uv), reference viewer.py:556).
    Four flat gathers — fine for the jnp/XR path; the Pallas pair kernel
    stays gated to roll≈0 where the warp is horizontal-only."""
    H, W = img.shape[0], img.shape[1]
    pxc = jnp.clip(px, 0.0, W - 1.0)
    pyc = jnp.clip(py, 0.0, H - 1.0)
    x0 = jnp.floor(pxc)
    y0 = jnp.floor(pyc)
    fx = (pxc - x0)[..., None]
    fy = (pyc - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    flat = img.reshape(H * W, -1)

    def g(yi, xi):
        return jnp.take(flat, (yi * W + xi).reshape(-1), axis=0).reshape(
            H, W, -1)

    top = g(y0i, x0i) * (1.0 - fx) + g(y0i, x1i) * fx
    bot = g(y1i, x0i) * (1.0 - fx) + g(y1i, x1i) * fx
    return top * (1.0 - fy) + bot * fy


# --------------------------------------------------------------------------
# 1. Legacy torch-compositor parity path
# --------------------------------------------------------------------------

def warp_eye_grid_sample(
    rgb: jax.Array, shifts: jax.Array, sign: float, max_disp: int = 512
) -> jax.Array:
    """One eye of make_sbs_core's grid_sample path (reference
    depth.py:2149-2160): sample rgb at x + sign*shifts with reflection."""
    H, W = shifts.shape
    base = jnp.arange(W, dtype=shifts.dtype)[None, :]
    px = _reflect_coords(base + sign * shifts, W)
    return _hsample(rgb, px, max_disp)


def pad_to_aspect(img: jax.Array, target_ratio: Tuple[int, int] = (16, 9)) -> jax.Array:
    """Zero-pad to the target aspect (reference depth.py:2106-2120)."""
    H, W = img.shape[0], img.shape[1]
    t_w, t_h = target_ratio
    r_img, r_t = W / H, t_w / t_h
    if abs(r_img - r_t) < 1e-3:
        return img
    if r_img > r_t:
        new_h = int(round(W / r_t))
        pad_top = (new_h - H) // 2
        return jnp.pad(img, ((pad_top, new_h - H - pad_top), (0, 0), (0, 0)))
    new_w = int(round(H * r_t))
    pad_left = (new_w - W) // 2
    return jnp.pad(img, ((0, 0), (pad_left, new_w - W - pad_left), (0, 0)))


def make_sbs(
    rgb: jax.Array,
    depth: jax.Array,
    ipd_uv: float = 0.064,
    depth_ratio: float = 2.0,
    convergence: float = 0.0,
    display_mode: str = "Half-SBS",
    fill_16_9: bool = False,
) -> jax.Array:
    """Reference-parity stereo compositor (reference depth.py:2122-2184).

    rgb [H,W,3] in [0,255]; depth [H,W] in [0,1].  Returns the composed
    frame [H',W',3] float in [0,255].
    """
    H, W = depth.shape
    img = jnp.clip(rgb, 0.0, 255.0)
    shifts = -(depth - convergence) * depth_ratio * (ipd_uv * W) * DEPTH_STRENGTH_SBS
    # static disparity bound (reflection can at most double the reach)
    max_shift = max(abs(convergence), abs(1.0 - convergence)) * depth_ratio \
        * ipd_uv * W * DEPTH_STRENGTH_SBS
    max_disp = int(2 * max_shift) + 2

    left = warp_eye_grid_sample(img, shifts, +1.0, max_disp)
    right = warp_eye_grid_sample(img, shifts, -1.0, max_disp)

    if fill_16_9:
        left = pad_to_aspect(left)
        right = pad_to_aspect(right)

    if display_mode in ("Half-TAB", "Full-TAB"):
        out = jnp.concatenate([left, right], axis=0)
    else:
        out = jnp.concatenate([left, right], axis=1)
    if display_mode not in ("Full-SBS", "Full-TAB"):
        out = resize(out, (left.shape[0], left.shape[1]), mode="area")
    return jnp.clip(out, 0.0, 255.0)


# --------------------------------------------------------------------------
# 2. Viewer-quality DIBR path (GLSL shader parity)
# --------------------------------------------------------------------------

def _shift_cols(x: jax.Array, offset: int) -> jax.Array:
    """x[:, j+offset] with edge-clamp, static offset (texture clamp-to-edge)."""
    if offset == 0:
        return x
    W = x.shape[1]
    if abs(offset) >= W:  # fully saturated: every column reads the edge
        edge = x[:, -1:] if offset > 0 else x[:, :1]
        return jnp.broadcast_to(edge, x.shape)
    if offset > 0:
        pad = jnp.repeat(x[:, -1:], offset, axis=1)
        return jnp.concatenate([x[:, offset:], pad], axis=1)
    pad = jnp.repeat(x[:, :1], -offset, axis=1)
    return jnp.concatenate([pad, x[:, :offset]], axis=1)


def _shift_rows(x: jax.Array, offset: int) -> jax.Array:
    if offset == 0:
        return x
    H = x.shape[0]
    if abs(offset) >= H:
        edge = x[-1:] if offset > 0 else x[:1]
        return jnp.broadcast_to(edge, x.shape)
    if offset > 0:
        pad = jnp.repeat(x[-1:], offset, axis=0)
        return jnp.concatenate([x[offset:], pad], axis=0)
    pad = jnp.repeat(x[:1], -offset, axis=0)
    return jnp.concatenate([pad, x[:offset]], axis=0)


def _sample_uv_bilinear(img: jax.Array, px: jax.Array) -> jax.Array:
    """Clamp-to-edge bilinear sample along W at continuous coords (GLSL
    texture() with CLAMP_TO_EDGE)."""
    pxc = jnp.clip(px, 0.0, img.shape[1] - 1.0)
    return _sample_rows_bilinear(img, pxc)


def push_pull_inpaint(
    rgb: jax.Array,
    depth: jax.Array,
    center_depth_inv: jax.Array,
    sweep_sign: float,
    search_radius: int = 12,
    depth_tolerance: float = 0.012,
    blur_radius: float = 2.5,
    par_dir: Tuple[float, float] = (1.0, 0.0),
) -> jax.Array:
    """Directional background inpaint (reference viewer.py:437-506),
    vectorized over all pixels; the GLSL early-exit (weight>5) and the
    opposite-sweep fallback (weight<2) are reproduced with cumulative-weight
    masks instead of control flow.

    `par_dir` = (cosθ, sinθ) of the parallax direction (screen roll).  The
    GLSL sweep steps `g_par_dir * pixel_size.x * i` — both components scale
    by the X pixel size (reference viewer.py:442), so the vertical pixel
    offset of tap i is i·sinθ·(H/W); taps are rounded to integer pixel
    shifts (same precedent as the vertical blur's 2.5→2 px rounding)."""
    H, W, _ = rgb.shape
    cos_t, sin_t = par_dir

    def tap(img: jax.Array, direction: float, i: int) -> jax.Array:
        offx = int(round(direction * i * cos_t))
        offy = int(round(direction * i * sin_t * (H / W)))
        out = _shift_cols(img, offx)
        if offy:
            out = _shift_rows(out, offy)
        return out

    def sweep(direction: float, decay: float, use_depth_weight: bool):
        colors = jnp.zeros_like(rgb)
        weights = jnp.zeros_like(depth)
        cum = jnp.zeros_like(depth)
        # static unroll: search_radius taps of pure shifts — XLA fuses these
        for i in range(1, search_radius + 1):
            s_depth_inv = 1.0 - tap(depth[..., None], direction, i)[..., 0]
            s_color = tap(rgb, direction, i)
            is_bg = s_depth_inv > center_depth_inv + depth_tolerance
            dist_w = jnp.exp(-float(i) * decay)
            if use_depth_weight:
                w = dist_w * (1.0 + (s_depth_inv - center_depth_inv) * 10.0)
            else:
                w = jnp.full_like(depth, dist_w)
            # GLSL adds the tap then breaks when weight exceeds 5: a tap
            # participates iff the running weight before it was <= 5.
            active = is_bg & (cum <= 5.0)
            w = jnp.where(active, w, 0.0)
            colors = colors + s_color * w[..., None]
            weights = weights + w
            cum = cum + w
        return colors, weights

    fwd_c, fwd_w = sweep(sweep_sign, 0.15, True)
    # Phase 2: opposite sweep only where phase 1 found weight < 2.
    bwd_c, bwd_w = sweep(-sweep_sign, 0.2, False)
    need_bwd = fwd_w < 2.0
    best_c = fwd_c + jnp.where(need_bwd, 1.0, 0.0)[..., None] * bwd_c
    best_w = fwd_w + jnp.where(need_bwd, bwd_w, 0.0)

    # Phase 3: small vertical blur (3 taps at ±blur_radius px).
    found = best_w > 0.01
    blurred = best_c / jnp.maximum(best_w, 1e-12)[..., None]
    vert_c = blurred * 0.5
    vert_w = jnp.full_like(depth, 0.5)
    dy_px = blur_radius
    for dy in (-1, 1):
        off = int(round(dy * dy_px))
        # GLSL samples at uv + dy*pixel*blur_radius with bilinear; at 2.5 px
        # offset, approximate with nearest integer shift (2 or -2 px visual
        # difference is below the seam-blend threshold).
        v_depth_inv = 1.0 - _shift_rows(depth, off)
        ok = v_depth_inv > center_depth_inv + depth_tolerance * 0.5
        w = jnp.where(ok, 0.25, 0.0)
        vert_c = vert_c + _shift_rows(rgb, off) * w[..., None]
        vert_w = vert_w + w
    filled = vert_c / vert_w[..., None]
    return jnp.where(found[..., None], filled, rgb)


def dibr_render(
    rgb: jax.Array,
    depth: jax.Array,
    eye_offset: float,
    depth_strength: float = 1.0,
    convergence: float = 0.0,
    search_radius: int = 12,
    depth_tolerance: float = 0.012,
    edge_margin: float = 0.05,
    roll: float = 0.0,
) -> jax.Array:
    """Render one eye via the viewer's DIBR shader math (reference
    viewer.py:528-631).  `eye_offset` is ±ipd/2 in UV units (reference
    viewer.py:2701-2746).  `roll` is the screen roll in radians: it rotates
    the parallax direction (reference u_roll, viewer.py:399,544-556 —
    shift applied as (px·cosθ, px·sinθ), pre-smooth/confidence taps along
    the rotated direction).  roll≈0 keeps the horizontal-only fast path
    (and the Pallas pair kernel); roll≠0 runs the 2D-gather jnp path."""
    import math as _math

    H, W, _ = rgb.shape
    dt = rgb.dtype
    depth = depth.astype(dt)

    cos_t, sin_t = _math.cos(roll), _math.sin(roll)
    rolled = _is_rolled(roll)

    # 3-tap asymmetric Gaussian pre-smooth along the parallax direction at
    # ±1.5px (bilinear at half-texel → average of 1- and 2-px neighbours).
    # Constant offsets → static-shift lerps, no gather (the shader's fixed
    # texture taps, reference viewer.py:540-544).
    par_sign = 1.0 if eye_offset > 0 else -1.0

    def sample_depth_at(offset_px: float) -> jax.Array:
        if rolled:
            # ds_dir = g_par_dir * pixel_size * k: per-axis pixel sizes, so
            # the offset is k·cosθ px horizontally and k·sinθ px vertically
            return _shift_2d(depth, offset_px * cos_t, offset_px * sin_t)
        return _sample_const_offset(depth, offset_px)

    d0 = depth
    dm = sample_depth_at(-par_sign * 1.5)
    dp = sample_depth_at(+par_sign * 1.5)
    d = d0 * 0.7 + dm * 0.15 + dp * 0.15

    depth_inv = -d
    depth_shaped = depth_inv * (1.0 + 0.35 * (1.0 - d))

    # Parallax shift in UV with border falloff.
    u = (jnp.arange(W, dtype=dt) + 0.5)[None, :] / W
    edge_falloff = jnp.clip(u / edge_margin, 0.0, 1.0)
    edge_falloff = edge_falloff * edge_falloff * (3.0 - 2.0 * edge_falloff)
    ef2 = jnp.clip((1.0 - u) / edge_margin, 0.0, 1.0)
    ef2 = ef2 * ef2 * (3.0 - 2.0 * ef2)
    edge_falloff = edge_falloff * ef2

    shift_uv = eye_offset * (depth_shaped + convergence) * depth_strength * edge_falloff
    # shifted_uv = uv - (shift·cosθ, shift·sinθ) (reference viewer.py:556)
    px = jnp.arange(W, dtype=dt)[None, :] - shift_uv * cos_t * W

    # static disparity bound for the kernel warp
    max_disp = int(abs(eye_offset) * (1.35 + abs(convergence))
                   * depth_strength * W) + 2

    # Soft disocclusion confidence: 2-tap depth jump along parallax dir.
    d_l = sample_depth_at(-par_sign * 2.0)
    d_r = sample_depth_at(+par_sign * 2.0)
    jump = jnp.abs(d_l - d_r)
    t = jnp.clip((jump - 0.04) / (0.10 - 0.04), 0.0, 1.0)
    conf = t * t * (3.0 - 2.0 * t)
    oob = (px < 0.0) | (px > W - 1.0)
    if rolled:
        py = jnp.arange(H, dtype=dt)[:, None] - shift_uv * sin_t * H
        oob = oob | (py < 0.0) | (py > H - 1.0)
    conf = jnp.where(oob, 1.0, conf)

    # The reference's sweep direction is EYE-INDEPENDENT: g_par_dir folds in
    # sign(eye_offset) and g_sweep_sign is -sign(eye_offset), so their
    # product is always -(cosθ, sinθ) (reference viewer.py:442,540-543) —
    # both eyes inpaint from the same side of the disocclusion.
    sweep_sign = -1.0
    px_clamped = jnp.clip(px, 0.0, W - 1.0)

    if not rolled and _on_tpu():
        try:
            from desktop2stereo_tpu.ops.pallas.dibr import dibr_warp_fill_blend

            return dibr_warp_fill_blend(
                rgb.astype(jnp.float32), depth.astype(jnp.float32),
                conf.astype(jnp.float32), px_clamped.astype(jnp.float32),
                max_disp=max_disp, search_radius=search_radius,
                depth_tolerance=depth_tolerance, sweep_sign=sweep_sign,
            ).astype(dt)
        except Exception:
            pass  # fall back to the jnp reference path

    if rolled:
        color = _sample_2d_bilinear(rgb, px, py).astype(dt)
    else:
        color = _hsample(rgb, px_clamped, max_disp)
    # neighbor taps sample the RAW depth: the reference's inpaint reads
    # 1-texture(tex_depth) (viewer.py:448,473,492) while only the center/
    # shift path uses the 3-tap smooth — r05 fix; the GL backend
    # (gl_theater.DIBR_FRAG) always did it the reference's way
    filled = push_pull_inpaint(
        rgb, depth, depth_inv, sweep_sign, search_radius, depth_tolerance,
        par_dir=(cos_t, sin_t),
    )
    return color + conf[..., None] * (filled - color)


# --------------------------------------------------------------------------
# Display-mode composition (viewer aux shaders: reference viewer.py:633-1197)
# --------------------------------------------------------------------------

FEATHER_WIDTH = 0.02  # 2% of the view (reference viewer.py:1343)


def edge_feather(eye: jax.Array, width: float = FEATHER_WIDTH) -> jax.Array:
    """Per-eye viewport edge feathering (reference viewer.py:586-613, the
    viewer's KEY_B toggle): rgb × (fadeL·fadeR·fadeT·fadeB)^0.7, each fade a
    smoothstep of pixel-center distance to its edge over `width` of the
    view.  pow distributes over the product, so the mask is SEPARABLE —
    two rank-1 vectors instead of a [H,W] field."""
    H, W = eye.shape[0], eye.shape[1]

    def smoothstep(x: jax.Array) -> jax.Array:
        t = jnp.clip(x / width, 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    def fade(n: int) -> jax.Array:
        uv = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
        return (smoothstep(uv) * smoothstep(1.0 - uv)) ** 0.7

    mask = fade(H)[:, None] * fade(W)[None, :]
    return eye * mask[..., None].astype(eye.dtype)


def compose_display(
    left: jax.Array,
    right: jax.Array,
    display_mode: str = "Half-SBS",
) -> jax.Array:
    """Arrange per-eye images into the final output frame."""
    H, W = left.shape[0], left.shape[1]
    if display_mode == "Mono":
        return left
    if display_mode in ("Half-SBS", "Full-SBS"):
        out = jnp.concatenate([left, right], axis=1)
        if display_mode == "Half-SBS":
            out = resize(out, (H, W), mode="area")
        return out
    if display_mode in ("Half-TAB", "Full-TAB"):
        out = jnp.concatenate([left, right], axis=0)
        if display_mode == "Half-TAB":
            out = resize(out, (H, W), mode="area")
        return out
    if display_mode == "Anaglyph":
        # red-cyan (reference viewer.py:678-833)
        return jnp.stack([left[..., 0], right[..., 1], right[..., 2]], axis=-1)
    if display_mode == "Row-Interleaved":
        rows = (jnp.arange(H) % 2 == 0)[:, None, None]
        return jnp.where(rows, left, right)
    if display_mode == "Column-Interleaved":
        cols = (jnp.arange(W) % 2 == 0)[None, :, None]
        return jnp.where(cols, left, right)
    raise ValueError(f"unknown display mode {display_mode!r}")


def depth_colormap_spectral(depth: jax.Array) -> jax.Array:
    """Spectral_r-style depth colormap (blue=far → green → yellow → red=near)
    exactly matching the reference's branch-free weighted-key formulation
    (reference viewer.py:639-663).  depth [H,W] in [0,1] → [H,W,3] 0..255."""
    t = jnp.clip(depth, 0.0, 1.0)
    keys = jnp.array(
        [[0.0, 0.298, 0.651],   # blue
         [0.0, 0.5, 0.0],       # green
         [1.0, 0.851, 0.0],     # yellow
         [0.988, 0.0, 0.0]],    # red
        t.dtype)
    centers = jnp.array([0.125, 0.375, 0.625, 0.875], t.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(t[..., None] - centers) * 4.0)
    total = w.sum(-1, keepdims=True)
    w = jnp.where(total > 0.0, w / jnp.maximum(total, 1e-12), w)
    return (w @ keys) * 255.0


def stereo_compose(
    rgb: jax.Array,
    depth: jax.Array,
    ipd: float = 0.064,
    depth_strength: float = 1.0,
    convergence: float = 0.0,
    display_mode: str = "Half-SBS",
    quality: str = "high",
    feather: bool = False,
    fill_16_9: bool = False,
    roll: float = 0.0,
) -> jax.Array:
    """Full stereo stage: per-eye DIBR (or fast warp) + optional per-eye
    edge feathering (reference KEY_B) + optional per-eye 16:9 padding
    (reference depth.py:2175-2177) + display arrangement.  `roll` rotates
    the parallax direction (reference u_roll, viewer.py:399) — the Pallas
    pair kernel is horizontal-only, so roll≠0 takes the jnp DIBR path."""
    import math as _math

    if display_mode == "Depth":
        out = depth_colormap_spectral(depth.astype(rgb.dtype))
        return edge_feather(out) if feather else out
    rolled = _is_rolled(roll)
    if quality == "high":
        left = right = None
        if _on_tpu() and not rolled:
            try:
                from desktop2stereo_tpu.ops.pallas.dibr import dibr_render_pair

                left, right = dibr_render_pair(
                    rgb.astype(jnp.float32), depth.astype(jnp.float32),
                    ipd=ipd, depth_strength=depth_strength,
                    convergence=convergence,
                )
            except Exception:
                left = right = None  # fall back to per-eye path
        if left is None:
            left = dibr_render(rgb, depth, -ipd / 2.0, depth_strength,
                               convergence, roll=roll)
            right = dibr_render(rgb, depth, +ipd / 2.0, depth_strength,
                                convergence, roll=roll)
        if feather:
            left, right = edge_feather(left), edge_feather(right)
        if fill_16_9:
            # pad each EYE to 16:9 before arrangement (reference
            # depth.py:2175-2177) — bars land beside each eye, not the pair
            left, right = pad_to_aspect(left), pad_to_aspect(right)
        return jnp.clip(compose_display(left, right, display_mode), 0.0, 255.0)
    # fast path = legacy compositor semantics (the reference's torch
    # Streamer compositor has no feathering either, depth.py:2106-2231)
    return make_sbs(rgb, depth, ipd, depth_strength, convergence, display_mode,
                    fill_16_9=fill_16_9)
