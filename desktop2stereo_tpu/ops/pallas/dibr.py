"""Fused Pallas DIBR kernel: warp + push-pull inpaint + confidence blend.

One-pass TPU implementation of the reference viewer's per-eye fragment
shader body (reference viewer.py:437-631): the parallax color warp, the
directional push-pull background inpaint with opposite-sweep fallback, the
3-tap vertical blur, and the disocclusion-confidence blend — everything
after the (cheap, XLA-fused) depth shaping.

Why fused: the jnp formulation materializes ~50 full-frame intermediates
per eye (24 sweep taps × masks/weights at 4K ≈ 20 ms, plus a 400 ms XLA
gather for the warp).  Here each grid step owns a full-width row tile in
VMEM: the warp is the decomposed dynamic-gather (see ops/pallas/warp.py),
sweep taps are static column slices of VMEM-resident rows, and vertical
taps come from ±1-tile row halos.  HBM sees rgb/depth ~3× and the output
once — a few ms per eye instead of ~420 ms.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift_cols_clamp(x: jax.Array, off: int) -> jax.Array:
    """x[:, j+off] with clamp-to-edge, static off; x [th, W] or [th, W, C]."""
    if off == 0:
        return x
    W = x.shape[1]
    if off > 0:
        pad = jnp.repeat(x[:, W - 1:W], off, axis=1)
        return jnp.concatenate([x[:, off:], pad], axis=1)
    pad = jnp.repeat(x[:, :1], -off, axis=1)
    return jnp.concatenate([pad, x[:, :off]], axis=1)


def _gather_rows(flat_c: jax.Array, q_rel: jax.Array, r_idx: jax.Array,
                 dq_lo: int, dq_hi: int) -> jax.Array:
    out = jnp.zeros_like(flat_c)
    for dq in range(dq_lo, dq_hi + 1):
        if dq > 0:
            shifted = jnp.concatenate([flat_c[dq:], flat_c[-1:].repeat(dq, 0)], 0)
        elif dq < 0:
            shifted = jnp.concatenate([flat_c[:1].repeat(-dq, 0), flat_c[:dq]], 0)
        else:
            shifted = flat_c
        cand = jnp.take_along_axis(shifted, r_idx, axis=1, mode="promise_in_bounds")
        out = jnp.where(q_rel == dq, cand, out)
    return out


def _dibr_kernel(px_ref, conf_ref,
                 rgb_u_ref, rgb_c_ref, rgb_d_ref,
                 dep_u_ref, dep_c_ref, dep_d_ref,
                 out_ref, *,
                 kmax: int, search_radius: int, depth_tolerance: float,
                 sweep_sign: float, vshift: int, tile_h: int, tile_idx_max: int):
    th = tile_h
    wp = px_ref.shape[1]
    ng = wp // LANES
    i = pl.program_id(0)

    rgb = [rgb_c_ref[c] for c in range(3)]           # 3 × [th, wp]
    dep = dep_c_ref[0]                               # RAW depth rows

    # --- 1. warp: decomposed dynamic-gather ---------------------------------
    px = px_ref[...]
    i0f = jnp.floor(px)
    frac = px - i0f
    i0 = i0f.astype(jnp.int32)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1) // LANES

    def flat2(x):
        return x.reshape(th * ng, LANES)

    def decompose(idx):
        return flat2(idx // LANES - g_idx), flat2(idx % LANES)

    q0, r0 = decompose(i0)
    q1, r1 = decompose(i0 + 1)
    frac_f = flat2(frac)
    color = []
    for c in range(3):
        fc = flat2(rgb[c])
        g0 = _gather_rows(fc, q0, r0, -kmax, kmax)
        g1 = _gather_rows(fc, q1, r1, -kmax, kmax)
        color.append((g0 * (1.0 - frac_f) + g1 * frac_f).reshape(th, wp))

    # --- 2. push-pull inpaint (reference viewer.py:437-506) -----------------
    # center_depth_inv = -smooth(d): the 3-tap 1.5px pre-smooth is a
    # symmetric sum (sign-invariant), recomputed here from the RAW rows;
    # the sweep/blur taps below read RAW depth — exactly the reference's
    # split (smoothed center viewer.py:546-551, raw tex_depth neighbors
    # viewer.py:448,473,492; r05 fix)
    def _htap15(x):
        lo = _shift_cols_clamp(x, 1)
        hi = _shift_cols_clamp(x, 2)
        a = lo * 0.5 + hi * 0.5
        lo2 = _shift_cols_clamp(x, -1)
        hi2 = _shift_cols_clamp(x, -2)
        b = lo2 * 0.5 + hi2 * 0.5
        return a + b

    cdi = -(dep * 0.7 + _htap15(dep) * 0.15)

    def sweep(direction: float, decay: float, use_depth_weight: bool):
        colors = [jnp.zeros((th, wp), jnp.float32) for _ in range(3)]
        # the reference's cum-gate accumulator is identical to the weight
        # sum (both add w every tap), so one accumulator serves as both
        weights = jnp.zeros((th, wp), jnp.float32)
        for t in range(1, search_radius + 1):
            off = int(direction * t)
            s_depth_inv = 1.0 - _shift_cols_clamp(dep, off)
            is_bg = s_depth_inv > cdi + depth_tolerance
            dist_w = math.exp(-float(t) * decay)
            if use_depth_weight:
                w = dist_w * (1.0 + (s_depth_inv - cdi) * 10.0)
            else:
                w = jnp.full((th, wp), dist_w, jnp.float32)
            active = jnp.logical_and(is_bg, weights <= 5.0)
            w = jnp.where(active, w, 0.0)
            for c in range(3):
                colors[c] = colors[c] + _shift_cols_clamp(rgb[c], off) * w
            weights = weights + w
        return colors, weights

    fwd_c, fwd_w = sweep(sweep_sign, 0.15, True)
    bwd_c, bwd_w = sweep(-sweep_sign, 0.2, False)
    need_bwd = fwd_w < 2.0
    best_c = [fwd_c[c] + jnp.where(need_bwd, bwd_c[c], 0.0) for c in range(3)]
    best_w = fwd_w + jnp.where(need_bwd, bwd_w, 0.0)

    found = best_w > 0.01
    inv_w = 1.0 / jnp.maximum(best_w, 1e-12)
    blurred = [best_c[c] * inv_w for c in range(3)]
    vert_c = [b * 0.5 for b in blurred]
    vert_w = jnp.full((th, wp), 0.5, jnp.float32)

    # vertical taps at ±vshift rows from the halo tiles.  Tile edges clamp
    # to the frame border like the jnp reference's row shifts.
    up_ok = i > 0
    dn_ok = i < tile_idx_max

    def row_shifted(refs, off):
        """refs = (upper_tile, center_tile, lower_tile) single-channel."""
        up, cen, dn = refs
        if off < 0:  # rows above
            span = jnp.concatenate([up[th + off:], cen[:th + off]], axis=0)
            edge = jnp.concatenate(
                [jnp.repeat(cen[:1], -off, axis=0), cen[:th + off]], axis=0)
            return jnp.where(up_ok, span, edge)
        span = jnp.concatenate([cen[off:], dn[:off]], axis=0)
        edge = jnp.concatenate(
            [cen[off:], jnp.repeat(cen[th - 1:th], off, axis=0)], axis=0)
        return jnp.where(dn_ok, span, edge)

    for off in (-vshift, vshift):
        v_dep = row_shifted((dep_u_ref[0], dep, dep_d_ref[0]), off)
        ok = (1.0 - v_dep) > cdi + depth_tolerance * 0.5
        w = jnp.where(ok, 0.25, 0.0)
        for c in range(3):
            v_rgb = row_shifted((rgb_u_ref[c], rgb[c], rgb_d_ref[c]), off)
            vert_c[c] = vert_c[c] + v_rgb * w
        vert_w = vert_w + w

    inv_vw = 1.0 / vert_w
    conf = conf_ref[...]
    for c in range(3):
        filled = vert_c[c] * inv_vw
        filled = jnp.where(found, filled, rgb[c])
        out_ref[c] = color[c] + conf * (filled - color[c])


def _interleave_rgb_u8(ch, w_out: int, lanes_out: int, th: int) -> jax.Array:
    """3 planar [th, >=w_out] f32 channels → [th, lanes_out] u8 in flat HWC
    order: out[h, 3j+c] = quantize(ch[c][h, j]).

    The pixel interleave is the CHW→HWC relayout that otherwise runs as an
    XLA transpose+concat after the kernel (~0.6 ms at 4K — 12 MB through
    HBM twice, shuffle-bound).  Here each 128-lane output group gathers its
    ≤43 consecutive source pixels from the (at most two) source lane groups
    they span — the rows are already in VMEM, so HBM sees only the final u8
    store.  Trailing lanes past 3*w_out clamp to the last pixel (callers
    crop or gate on exact multiples)."""
    ng_src = (ch[0].shape[1] + LANES - 1) // LANES
    pad = ng_src * LANES - ch[0].shape[1]
    if pad:
        ch = [jnp.concatenate([x, jnp.zeros((th, pad), x.dtype)], axis=1)
              for x in ch]
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, LANES), 1)
    groups = []
    for g in range(lanes_out // LANES):
        m = g * LANES + lane
        j = jnp.minimum(m // 3, w_out - 1)
        c = m % 3
        # static source-group bounds from the (monotone, clamped) j range
        j_min = min((g * LANES) // 3, w_out - 1)
        j_max = min((g * LANES + LANES - 1) // 3, w_out - 1)
        q_lo, q_hi = j_min // LANES, j_max // LANES
        r = j % LANES
        vals = []
        for cc in range(3):
            a = ch[cc][:, q_lo * LANES:(q_lo + 1) * LANES]
            ga = jnp.take_along_axis(a, r, axis=1, mode="promise_in_bounds")
            if q_hi != q_lo:
                b = ch[cc][:, q_hi * LANES:(q_hi + 1) * LANES]
                gb = jnp.take_along_axis(b, r, axis=1,
                                         mode="promise_in_bounds")
                ga = jnp.where(j // LANES == q_lo, ga, gb)
            vals.append(ga)
        groups.append(
            jnp.where(c == 0, vals[0], jnp.where(c == 1, vals[1], vals[2])))
    out = groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=1)
    # Mosaic has no f32→u8 cast; clip keeps the i32 round-trip exact
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _lane_pair_avg(x: jax.Array) -> jax.Array:
    """[th, wp] -> [th, wp//2]: mean of adjacent lane pairs (the Half-SBS
    horizontal area x2 squeeze, reference depth.py:2219-2226).

    Mosaic has no strided lane slicing (stride must be 1), so the even-lane
    compaction runs as within-128-lane-group shuffles: pairsum once, then
    each output group gathers `(2l) % 128` from its two source groups and
    selects by half."""
    th, wp = x.shape
    half = wp // 2
    s = x + _shift_cols_clamp(x, 1)  # s[:, j] = x[j] + x[j+1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, LANES), 1)
    idx = (2 * lane) % LANES
    nb = (half + LANES - 1) // LANES
    pad = 2 * nb * LANES - wp
    if pad:
        s = jnp.concatenate([s, jnp.zeros((th, pad), x.dtype)], axis=1)
    blocks = []
    for k in range(nb):
        va = s[:, 2 * k * LANES:(2 * k + 1) * LANES]
        vb = s[:, (2 * k + 1) * LANES:(2 * k + 2) * LANES]
        ga = jnp.take_along_axis(va, idx, axis=1, mode="promise_in_bounds")
        gb = jnp.take_along_axis(vb, idx, axis=1, mode="promise_in_bounds")
        blocks.append(jnp.where(lane < LANES // 2, ga, gb))
    out = blocks[0] if nb == 1 else jnp.concatenate(blocks, axis=1)
    return out[:, :half] * 0.5


def _dibr_pair_kernel(rgb_u_ref, rgb_c_ref, rgb_d_ref,
                      dep_u_ref, dep_c_ref, dep_d_ref,
                      *out_refs,
                      dq_l: Tuple[int, int], dq_r: Tuple[int, int],
                      search_radius: int, depth_tolerance: float,
                      eye_offset: float, depth_strength: float,
                      convergence: float, edge_margin: float,
                      width: int, vshift: int, tile_h: int, tile_idx_max: int,
                      out_mode: str = "eyes",
                      feather: float = 0.0, height: int = 0):
    """Both eyes in one pass: depth pre-smooth + shaping + edge falloff +
    per-eye warp/confidence + shared inpaint sweeps + blends (the whole
    dibr_render body, reference viewer.py:528-631).

    Eye-sharing: the 3-tap pre-smooth and disocclusion jump are SYMMETRIC
    sums (tap(-1.5s)+tap(+1.5s) is sign-invariant), so the smoothed depth,
    confidence base, background masks and every shifted column/row array
    are identical for both eyes — computed once.  The inpaint sweeps are
    ALSO eye-independent (the reference's g_par_dir × g_sweep_sign double
    sign-flip cancels to -x for both eyes, reference viewer.py:442,540-543)
    so one forward + one backward sweep serves both; only the warp
    direction and the final blends are per-eye."""
    th = tile_h
    wp = dep_c_ref.shape[2]
    ng = wp // LANES
    i = pl.program_id(0)

    rgb = [rgb_c_ref[c] for c in range(3)]
    dep_raw = dep_c_ref[0]

    def htap(x, off: float):
        """Constant-offset column tap as static-shift lerp."""
        i0 = math.floor(off)
        f = off - i0
        a = _shift_cols_clamp(x, i0)
        if f == 0.0:
            return a
        return a * (1.0 - f) + _shift_cols_clamp(x, i0 + 1) * f

    # --- eye-independent depth work ------------------------------------------
    smooth = (dep_raw * 0.7 + htap(dep_raw, -1.5) * 0.15
              + htap(dep_raw, +1.5) * 0.15)
    cdi = -smooth
    # shift commutes with the affine 1-x: precompute once instead of
    # subtracting inside every sweep tap (24 full-tile ops saved)
    inv_raw = 1.0 - dep_raw  # sweep/blur taps read RAW depth
                             # (reference viewer.py:448,473,492; r05 fix —
                             # only the center cdi uses the smooth)
    jump = jnp.abs(htap(dep_raw, -2.0) - htap(dep_raw, +2.0))
    t_ = jnp.clip((jump - 0.04) / (0.10 - 0.04), 0.0, 1.0)
    conf_base = t_ * t_ * (3.0 - 2.0 * t_)
    depth_shaped = (-smooth) * (1.0 + 0.35 * (1.0 - smooth))

    # --- edge falloff (smoothstep at both borders) ---------------------------
    col = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1).astype(jnp.float32)
    u = (col + 0.5) / width
    e1 = jnp.clip(u / edge_margin, 0.0, 1.0)
    e1 = e1 * e1 * (3.0 - 2.0 * e1)
    e2 = jnp.clip((1.0 - u) / edge_margin, 0.0, 1.0)
    e2 = e2 * e2 * (3.0 - 2.0 * e2)
    shift_base = (depth_shaped + convergence) * depth_strength * (e1 * e2)

    g_idx = jax.lax.broadcasted_iota(jnp.int32, (th, wp), 1) // LANES

    def flat2(x):
        return x.reshape(th * ng, LANES)

    # the i0+1 bilinear tap reads rgb shifted left by one column at the SAME
    # (q, r) index set — one decompose and a tighter dq range than indexing
    # i0+1 directly (whose carry into the next lane group costs a whole
    # extra gather sweep)
    rgb1 = [_shift_cols_clamp(rgb[c], 1) for c in range(3)]

    def warp(eye: float, dq: Tuple[int, int]):
        px = col - (eye * shift_base) * width
        oob = jnp.logical_or(px < 0.0, px > width - 1.0)
        pxc = jnp.clip(px, 0.0, width - 1.0)
        i0f = jnp.floor(pxc)
        frac = flat2(pxc - i0f)
        i0 = i0f.astype(jnp.int32)
        q0, r0 = flat2(i0 // LANES - g_idx), flat2(i0 % LANES)
        color = []
        for c in range(3):
            g0 = _gather_rows(flat2(rgb[c]), q0, r0, dq[0], dq[1])
            g1 = _gather_rows(flat2(rgb1[c]), q0, r0, dq[0], dq[1])
            color.append((g0 * (1.0 - frac) + g1 * frac).reshape(th, wp))
        conf = jnp.where(oob, 1.0, conf_base)
        return color, conf

    # --- inpaint sweeps: shared by BOTH eyes -----------------------------------
    # The reference's sweep direction is eye-independent: g_par_dir folds in
    # sign(eye_offset) and g_sweep_sign is -sign(eye_offset), so their
    # product is always -x (reference viewer.py:442,540-543).  One forward
    # sweep (depth-weighted, decay .15, direction -1) and one opposite
    # fallback (plain, decay .2, direction +1) therefore serve both eyes —
    # half the sweep taps of a per-eye pairing.
    # Tap-invariant depth terms are hoisted: thr for the is_bg compare, and
    # the depth weight refactored as dist·(1 + 10·(s_inv − cdi)) =
    # dist·pre + (10·dist)·s_inv with pre = 1 − 10·cdi — two ops per tap
    # instead of three, same f32 math (the sweeps are ~half the kernel's
    # VPU ops; every op here is ~4 µs of frame time at 4K).
    thr = cdi + depth_tolerance
    pre_w = 1.0 - 10.0 * cdi

    def sweep_role(direction: int, depth_weighted: bool, decay: float):
        # the reference's cum-gate accumulator is identical to the weight sum
        # (both add w every tap), so one accumulator serves as both
        acc = [jnp.zeros((th, wp), jnp.float32) for _ in range(3)]
        wsum = jnp.zeros((th, wp), jnp.float32)
        for t in range(1, search_radius + 1):
            off = direction * t
            s_depth_inv = _shift_cols_clamp(inv_raw, off)
            is_bg = s_depth_inv > thr
            s_rgb = [_shift_cols_clamp(rgb[c], off) for c in range(3)]
            dist_w = math.exp(-float(t) * decay)
            if depth_weighted:
                w = dist_w * pre_w + (10.0 * dist_w) * s_depth_inv
            else:
                w = dist_w  # scalar; the where below broadcasts it
            w = jnp.where(jnp.logical_and(is_bg, wsum <= 5.0), w, 0.0)
            for c in range(3):
                acc[c] = acc[c] + s_rgb[c] * w
            wsum = wsum + w
        return acc, wsum

    fwd_shared = sweep_role(-1, depth_weighted=True, decay=0.15)
    bwd_shared = sweep_role(+1, depth_weighted=False, decay=0.2)

    # --- vertical blur taps (fully eye-independent) ---------------------------
    up_ok = i > 0
    dn_ok = i < tile_idx_max

    def row_shifted(refs, off):
        up, cen, dn = refs
        if off < 0:
            span = jnp.concatenate([up[th + off:], cen[:th + off]], axis=0)
            edge = jnp.concatenate(
                [jnp.repeat(cen[:1], -off, axis=0), cen[:th + off]], axis=0)
            return jnp.where(up_ok, span, edge)
        span = jnp.concatenate([cen[off:], dn[:off]], axis=0)
        edge = jnp.concatenate(
            [cen[off:], jnp.repeat(cen[th - 1:th], off, axis=0)], axis=0)
        return jnp.where(dn_ok, span, edge)

    vadd_c = [jnp.zeros((th, wp), jnp.float32) for _ in range(3)]
    vert_w = jnp.full((th, wp), 0.5, jnp.float32)
    for off in (-vshift, vshift):
        v_raw = row_shifted((dep_u_ref[0], dep_raw, dep_d_ref[0]), off)
        # RAW row taps (reference viewer.py:492); only cdi is smoothed
        ok = (1.0 - v_raw) > cdi + depth_tolerance * 0.5
        w = jnp.where(ok, 0.25, 0.0)
        for c in range(3):
            v_rgb = row_shifted((rgb_u_ref[c], rgb[c], rgb_d_ref[c]), off)
            vadd_c[c] = vadd_c[c] + v_rgb * w
        vert_w = vert_w + w
    inv_vw = 1.0 / vert_w

    # --- per-eye: warp + blend (sweeps shared, see above) ----------------------
    eye_cfg = (
        (-abs(eye_offset), dq_l, fwd_shared, bwd_shared),
        (+abs(eye_offset), dq_r, fwd_shared, bwd_shared),
    )
    eye_out = []
    for eye, dq, (fwd_c, fwd_w), (bwd_c, bwd_w) in eye_cfg:
        color, conf = warp(eye, dq)
        need_bwd = fwd_w < 2.0
        best_w = fwd_w + jnp.where(need_bwd, bwd_w, 0.0)
        found = best_w > 0.01
        scale = 0.5 / jnp.maximum(best_w, 1e-12)
        out = []
        for c in range(3):
            best_c = fwd_c[c] + jnp.where(need_bwd, bwd_c[c], 0.0)
            filled = jnp.where(found, (best_c * scale + vadd_c[c]) * inv_vw, rgb[c])
            out.append(color[c] + conf * (filled - color[c]))
        eye_out.append(out)

    if feather > 0.0:
        # per-eye viewport edge feathering (reference viewer.py:586-613,
        # KEY_B): rgb × (fadeL·fadeR·fadeT·fadeB)^0.7, smoothstep fades over
        # `feather` of the view.  Fused here where the rows are in VMEM —
        # the mask is pure iota math, no extra input.
        def fstep(x):
            t = jnp.clip(x * (1.0 / feather), 0.0, 1.0)
            return t * t * (3.0 - 2.0 * t)

        row = (i * th + jax.lax.broadcasted_iota(jnp.int32, (th, wp), 0)
               ).astype(jnp.float32)
        v = (row + 0.5) / height
        fmask = (fstep(u) * fstep(1.0 - u) * fstep(v) * fstep(1.0 - v)) ** 0.7
        eye_out = [[c * fmask for c in eye] for eye in eye_out]

    if out_mode == "eyes":
        out_l_ref, out_r_ref = out_refs
        for c in range(3):
            out_l_ref[c] = eye_out[0][c]
            out_r_ref[c] = eye_out[1][c]
        return

    if out_mode == "eyes_u8":
        # quantized eyes: the half-width Half-SBS tail renders each eye at
        # OUTPUT resolution (per-output-pixel like the reference viewer's
        # per-eye viewports, viewer.py:1520-1544) so no squeeze happens —
        # just fuse the clip/round/cast here where the rows are in VMEM.
        # Mosaic has no f32→u8 cast; clip keeps the i32 round-trip exact.
        out_l_ref, out_r_ref = out_refs
        for c in range(3):
            out_l_ref[c] = (jnp.clip(eye_out[0][c] + 0.5, 0.0, 255.0)
                            .astype(jnp.int32).astype(jnp.uint8))
            out_r_ref[c] = (jnp.clip(eye_out[1][c] + 0.5, 0.0, 255.0)
                            .astype(jnp.int32).astype(jnp.uint8))
        return

    if out_mode == "sbs_hwc_u8":
        # The finished SBS frame in FINAL memory layout: one [th, Lp] u8
        # buffer holding flat HWC rows (left eye pixels in [0, 3·width),
        # right eye in [3·width, 6·width)).  The caller's whole tail is a
        # row-crop + free reshape — no XLA concat, no CHW→HWC transpose.
        (out_ref,) = out_refs
        packed = [
            jnp.concatenate(
                [eye_out[0][c][:, :width], eye_out[1][c][:, :width]], axis=1)
            for c in range(3)
        ]
        out_ref[...] = _interleave_rgb_u8(
            packed, 2 * width, out_ref.shape[1], th)
        return

    if out_mode == "eyes_hwc_u8":
        # Per-eye flat-HWC u8 buffers (Half-TAB tail: the caller row-concats
        # the eyes, which is a contiguous copy — the expensive relayout is
        # the interleave, fused here).
        out_l_ref, out_r_ref = out_refs
        for ref, eye in ((out_l_ref, eye_out[0]), (out_r_ref, eye_out[1])):
            ref[...] = _interleave_rgb_u8(
                [eye[c] for c in range(3)], width, ref.shape[1], th)
        return

    # "half_sbs_u8": squeeze each eye x2 horizontally (area), place left eye
    # in cols [0, W/2), right eye at [W/2, W), quantize round-half-up to u8
    # — the whole compose_display("Half-SBS") + clip/cast stage fused here
    # where the rows already live in VMEM (reference depth.py:2219-2231).
    (out_ref,) = out_refs
    half_w = width // 2
    pad = wp - 2 * half_w
    for c in range(3):
        l_sq = _lane_pair_avg(eye_out[0][c])[:, :half_w]
        r_sq = _lane_pair_avg(eye_out[1][c])[:, :half_w]
        row = jnp.concatenate([l_sq, r_sq], axis=1)
        if pad:
            row = jnp.concatenate(
                [row, jnp.zeros((th, pad), jnp.float32)], axis=1)
        # Mosaic has no f32→u8 cast; clip keeps the i32 round-trip exact
        out_ref[c] = (jnp.clip(row + 0.5, 0.0, 255.0)
                      .astype(jnp.int32).astype(jnp.uint8))


def pair_tiling(H: int, W: int) -> Tuple[int, int, int]:
    """(hp, wp, tile_h) padding/tiling the pair kernel uses for an HxW frame.
    Exposed so upstream stages can hand over pre-padded planar buffers."""
    wp = _round_up(W, LANES)
    # Both eyes live in-flight at once → ~2× the single-eye register
    # pressure; at wide frames 64-row tiles spill past VMEM (needs 142M of
    # 128M) while 48 rows fit and beat 32 by ~7% (fewer halo re-reads).
    # Among the tile heights that fit, prefer one that divides H exactly:
    # a pad-free hp spares the upstream edge-pad copy of the whole planar
    # frame (~0.2 ms at 4K) — e.g. 4K eyes (2160) tile at 48, not 64+pad.
    cands = (48, 32) if wp >= 2048 else (TILE_H, 48, 32)
    tile_h = next((t for t in cands if H % t == 0), cands[0])
    return _round_up(H, tile_h), wp, tile_h


@functools.partial(
    jax.jit,
    static_argnames=("width", "ipd", "depth_strength", "convergence",
                     "search_radius", "depth_tolerance", "edge_margin",
                     "vshift", "out_mode", "interpret", "feather", "height"),
)
def dibr_render_pair_planar(
    rgbp: jax.Array,         # [3, hp, wp] f32 0..255, edge-padded planar
    depp: jax.Array,         # [1, hp, wp] f32 depth in [0,1], edge-padded
    width: int,              # true frame width W (<= wp)
    ipd: float = 0.064,
    depth_strength: float = 1.0,
    convergence: float = 0.0,
    search_radius: int = 12,
    depth_tolerance: float = 0.012,
    edge_margin: float = 0.05,
    vshift: int = 2,
    out_mode: str = "eyes",
    interpret: bool = False,
    feather: float = 0.0,    # >0: per-eye edge feathering over this view
                             # fraction (reference KEY_B; 0.02 = reference)
    height: int = 0,         # true frame height (for the feather v axis;
                             # 0 = the padded hp)
):
    """Both stereo eyes in ONE fused pass over pre-padded planar inputs.

    out_mode "eyes": returns (left, right) planar f32 [3, hp, wp].
    out_mode "eyes_u8": same, quantized u8 in the kernel.
    out_mode "sbs_hwc_u8": returns ONE u8 [hp, Lp] (Lp = 6·width rounded up
    to lanes) of flat-HWC rows — left eye pixels interleaved in lanes
    [0, 3·width), right eye in [3·width, 6·width).  The PRODUCTION Half-SBS
    mode: `out[:H].reshape(H, 2·width, 3)` is the finished frame, no XLA
    concat/transpose after the kernel.
    out_mode "eyes_hwc_u8": (left, right) u8 [hp, Lp] flat-HWC per eye
    (Lp = 3·width rounded up) — the Half-TAB tail (caller row-concats).
    out_mode "half_sbs_u8": returns ONE planar u8 [3, hp, wp] whose first
    `width` columns are the finished Half-SBS frame (left eye squeezed x2
    in [0, W/2), right eye in [W/2, W)) — the full-width warp-then-squeeze
    formulation, kept as the comparison baseline for benchmarks/dibr.py
    and the in-kernel-squeeze parity test.
    """
    _, hp, wp = rgbp.shape
    W = width
    # tile_h comes from pair_tiling so the kernel and the upstream padding
    # (programs.py preprocess) can never disagree on the rule
    _, _, tile_h = pair_tiling(hp, wp)
    assert hp % tile_h == 0, (hp, tile_h)
    nt = hp // tile_h
    if out_mode == "half_sbs_u8":
        assert W % 2 == 0, "Half-SBS fusion needs an even frame width"

    def dq_bounds(eye: float) -> Tuple[int, int]:
        # warp displacement delta = i0-col with i0 = floor(clip(px)) and
        # px-col = -eye*(shaped+conv)*strength*falloff*W, shaped ∈ [-1.35, 0],
        # falloff ∈ [0, 1].  Each eye shifts one way only and the products
        # preserve sign in f32, so the bounds are exact: lo covers the most
        # negative displacement (including padded cols clamping back to W-1),
        # hi covers ceil() of the most positive (the i0+1 tap needs no extra
        # group — it reads a one-column-shifted source at the same indices).
        v_lo = (-1.35 + convergence) * depth_strength
        v_hi = convergence * depth_strength
        cand = (0.0, -eye * v_lo * W, -eye * v_hi * W)
        d_min = min(cand) - (wp - W)
        d_max = max(cand)
        return (int(math.floor(d_min / LANES)),
                int(math.ceil(d_max / LANES)))

    dq_l = dq_bounds(-abs(ipd / 2.0))
    dq_r = dq_bounds(+abs(ipd / 2.0))

    def spec(chans, off):
        return pl.BlockSpec(
            (chans, tile_h, wp),
            lambda i, _o=off: (0, jnp.clip(i + _o, 0, nt - 1), 0),
            memory_space=pltpu.VMEM,
        )

    def out_spec():
        return pl.BlockSpec((3, tile_h, wp), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    if out_mode == "eyes":
        out_shape = (jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
                     jax.ShapeDtypeStruct((3, hp, wp), jnp.float32))
        out_specs = (out_spec(), out_spec())
    elif out_mode == "eyes_u8":
        out_shape = (jax.ShapeDtypeStruct((3, hp, wp), jnp.uint8),
                     jax.ShapeDtypeStruct((3, hp, wp), jnp.uint8))
        out_specs = (out_spec(), out_spec())
    elif out_mode in ("sbs_hwc_u8", "eyes_hwc_u8"):
        lanes_out = _round_up(
            (6 if out_mode == "sbs_hwc_u8" else 3) * W, LANES)

        def hwc_spec():
            return pl.BlockSpec((tile_h, lanes_out), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        if out_mode == "sbs_hwc_u8":
            out_shape = jax.ShapeDtypeStruct((hp, lanes_out), jnp.uint8)
            out_specs = hwc_spec()
        else:
            out_shape = (jax.ShapeDtypeStruct((hp, lanes_out), jnp.uint8),
                         jax.ShapeDtypeStruct((hp, lanes_out), jnp.uint8))
            out_specs = (hwc_spec(), hwc_spec())
    else:
        out_shape = jax.ShapeDtypeStruct((3, hp, wp), jnp.uint8)
        out_specs = out_spec()

    return pl.pallas_call(
        functools.partial(
            _dibr_pair_kernel, dq_l=dq_l, dq_r=dq_r, search_radius=search_radius,
            depth_tolerance=depth_tolerance, eye_offset=ipd / 2.0,
            depth_strength=depth_strength, convergence=convergence,
            edge_margin=edge_margin, width=W, vshift=vshift,
            tile_h=tile_h, tile_idx_max=nt - 1, out_mode=out_mode,
            feather=feather, height=height or hp,
        ),
        out_shape=out_shape,
        grid=(nt,),
        in_specs=[
            spec(3, -1), spec(3, 0), spec(3, 1),
            spec(1, -1), spec(1, 0), spec(1, 1),
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rgbp, rgbp, rgbp, depp, depp, depp)


def pad_planar(rgb: jax.Array, depth: jax.Array):
    """HWC rgb + [H,W] depth → edge-padded planar f32 kernel inputs."""
    H, W = depth.shape
    hp, wp, _ = pair_tiling(H, W)
    rgbp = jnp.pad(rgb, ((0, hp - H), (0, wp - W), (0, 0)), mode="edge")
    rgbp = rgbp.astype(jnp.float32).transpose(2, 0, 1)
    depp = jnp.pad(depth.astype(jnp.float32), ((0, hp - H), (0, wp - W)),
                   mode="edge")[None]
    return rgbp, depp


@functools.partial(
    jax.jit,
    static_argnames=("ipd", "depth_strength", "convergence", "search_radius",
                     "depth_tolerance", "edge_margin", "vshift", "interpret"),
)
def dibr_render_pair(
    rgb: jax.Array,          # [H, W, 3] f32, 0..255
    depth: jax.Array,        # [H, W] f32 post-processed depth in [0,1]
    ipd: float = 0.064,
    depth_strength: float = 1.0,
    convergence: float = 0.0,
    search_radius: int = 12,
    depth_tolerance: float = 0.012,
    edge_margin: float = 0.05,
    vshift: int = 2,
    interpret: bool = False,
):
    """Both stereo eyes in ONE fused pass (shares the rgb/depth reads and
    all inpaint shift work between eyes).  Returns (left, right) HWC f32."""
    H, W, C = rgb.shape
    assert C == 3
    rgbp, depp = pad_planar(rgb, depth)
    out_l, out_r = dibr_render_pair_planar(
        rgbp, depp, W, ipd=ipd, depth_strength=depth_strength,
        convergence=convergence, search_radius=search_radius,
        depth_tolerance=depth_tolerance, edge_margin=edge_margin,
        vshift=vshift, out_mode="eyes", interpret=interpret,
    )
    left = out_l.transpose(1, 2, 0)[:H, :W]
    right = out_r.transpose(1, 2, 0)[:H, :W]
    return left, right


@functools.partial(
    jax.jit,
    static_argnames=("max_disp", "search_radius", "depth_tolerance",
                     "sweep_sign", "vshift", "interpret"),
)
def dibr_warp_fill_blend(
    rgb: jax.Array,        # [H, W, 3] f32, 0..255
    depth_smoothed: jax.Array,  # [H, W] f32 (pre-smoothed d)
    conf: jax.Array,       # [H, W] f32 disocclusion confidence
    px: jax.Array,         # [H, W] f32 warp coords, clamped to [0, W-1]
    max_disp: int = 512,
    search_radius: int = 12,
    depth_tolerance: float = 0.012,
    sweep_sign: float = 1.0,
    vshift: int = 2,
    interpret: bool = False,
) -> jax.Array:
    H, W, C = rgb.shape
    assert C == 3
    wp = _round_up(W, LANES)
    hp = _round_up(H, TILE_H)
    kmax = max_disp // LANES + 2
    nt = hp // TILE_H

    # edge-replicate so tile-border clamps equal frame-border clamps
    rgbp = jnp.pad(rgb, ((0, hp - H), (0, wp - W), (0, 0)), mode="edge")
    rgbp = rgbp.astype(jnp.float32).transpose(2, 0, 1)  # [3, hp, wp]
    depp = jnp.pad(depth_smoothed.astype(jnp.float32),
                   ((0, hp - H), (0, wp - W)), mode="edge")[None]
    confp = jnp.pad(conf.astype(jnp.float32), ((0, hp - H), (0, wp - W)),
                    mode="edge")
    pxp = jnp.pad(px.astype(jnp.float32), ((0, hp - H), (0, wp - W)))

    def spec(chans, off):
        return pl.BlockSpec(
            (chans, TILE_H, wp),
            lambda i, _o=off: (0, jnp.clip(i + _o, 0, nt - 1), 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _dibr_kernel, kmax=kmax, search_radius=search_radius,
            depth_tolerance=depth_tolerance, sweep_sign=sweep_sign,
            vshift=vshift, tile_h=TILE_H, tile_idx_max=nt - 1,
        ),
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            spec(3, -1), spec(3, 0), spec(3, 1),
            spec(1, -1), spec(1, 0), spec(1, 1),
        ],
        out_specs=pl.BlockSpec((3, TILE_H, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=hp * wp * (search_radius * 2 * 8 + (2 * kmax + 1) * 6) * 3,
            bytes_accessed=hp * wp * 4 * (3 * 3 + 3) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pxp, confp, rgbp, rgbp, rgbp, depp, depp, depp)
    return out.transpose(1, 2, 0)[:H, :W]
