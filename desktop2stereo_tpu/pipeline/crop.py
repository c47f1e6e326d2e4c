"""Letterbox / pillarbox auto-crop detection.

Re-implements the reference's movie-crop pipeline (reference
xr_viewer/crop.py:200-430): a cheap device-side stats program samples luma
on a sparse row/column grid, counts the contiguous uniform (low-std) bar
runs from each edge with a cumprod trick, and a host-side controller turns
the six stats into a crop rectangle with the same guards (minimum bar size,
top/bottom symmetry, edge trim, minimum removed area, dark-scene rejection)
plus hysteresis (a full-frame result must repeat before the crop resets).

TPU split: the stats program is one tiny jitted reduction (the analog of the
reference's async CUDA stats kernel, crop.py:380-400); only 6 scalars cross
to the host per poll.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

UNIFORM_STD = 6.0        # reference crop.py:390
BRIGHT_LUMA = 20.0       # reference crop.py:395
Crop = Tuple[float, float, float, float]  # (u0, v0, uw, vh)
FULL: Crop = (0.0, 0.0, 1.0, 1.0)


@functools.lru_cache(maxsize=16)
def _sample_plan(w: int, h: int):
    """Sparse sampling grid (reference crop.py:300-330 _movie_crop_sample_plan)."""
    x0, x1 = int(w * 0.10), max(int(w * 0.10) + 1, int(w * 0.90))
    row_stride = max(1, (h + 359) // 360)
    y_rows = np.arange(0, h, row_stride, dtype=np.int64)
    if y_rows.size == 0 or int(y_rows[-1]) != h - 1:
        y_rows = np.append(y_rows, h - 1)
    step_x = max(1, (x1 - x0) // 128)
    center_mask = (y_rows >= int(h * 0.35)) & (y_rows < int(h * 0.65))

    y0c, y1c = int(h * 0.10), max(int(h * 0.10) + 1, int(h * 0.90))
    col_stride = max(1, (w + 359) // 360)
    x_cols = np.arange(0, w, col_stride, dtype=np.int64)
    if x_cols.size == 0 or int(x_cols[-1]) != w - 1:
        x_cols = np.append(x_cols, w - 1)
    step_y = max(1, (y1c - y0c) // 128)
    return dict(x0=x0, x1=x1, step_x=step_x, y_rows=y_rows,
                center_mask=center_mask, y0c=y0c, y1c=y1c, step_y=step_y,
                x_cols=x_cols)


def crop_stats(rgb: jax.Array) -> jax.Array:
    """rgb [H,W,3] (0..255) → stats [6]: (top_run, bottom_run, center_mean,
    center_bright_frac, left_run, right_run) over the sample grid."""
    H, W = rgb.shape[0], rgb.shape[1]
    plan = _sample_plan(W, H)

    rows = rgb[jnp.asarray(plan["y_rows"]), plan["x0"]:plan["x1"]:plan["step_x"]]
    luma_r = (rows[..., 0] * 0.2126 + rows[..., 1] * 0.7152 + rows[..., 2] * 0.0722)
    row_std = jnp.std(luma_r, axis=1)
    uniform_row = (row_std < UNIFORM_STD).astype(jnp.int32)
    top_run = jnp.sum(jnp.cumprod(uniform_row))
    bottom_run = jnp.sum(jnp.cumprod(uniform_row[::-1]))

    center = jnp.asarray(plan["center_mask"], jnp.float32)
    row_mean = jnp.mean(luma_r, axis=1)
    bright = (luma_r > BRIGHT_LUMA).astype(jnp.float32).mean(axis=1)
    denom = jnp.maximum(jnp.sum(center), 1.0)
    center_mean = jnp.sum(row_mean * center) / denom
    center_bright = jnp.sum(bright * center) / denom

    cols = rgb[plan["y0c"]:plan["y1c"]:plan["step_y"], jnp.asarray(plan["x_cols"])]
    luma_c = (cols[..., 0] * 0.2126 + cols[..., 1] * 0.7152 + cols[..., 2] * 0.0722)
    col_std = jnp.std(luma_c, axis=0)
    uniform_col = (col_std < UNIFORM_STD).astype(jnp.int32)
    left_run = jnp.sum(jnp.cumprod(uniform_col))
    right_run = jnp.sum(jnp.cumprod(uniform_col[::-1]))

    return jnp.stack([
        top_run.astype(jnp.float32), bottom_run.astype(jnp.float32),
        center_mean, center_bright,
        left_run.astype(jnp.float32), right_run.astype(jnp.float32),
    ])


def crop_from_stats(stats, w: int, h: int) -> Crop:
    """Decision logic (reference crop.py:236-300 _movie_crop_from_stats)."""
    plan = _sample_plan(w, h)
    y_rows, x_cols = plan["y_rows"], plan["x_cols"]
    top_i = int(round(float(stats[0])))
    bottom_count = int(round(float(stats[1])))
    center_mean, center_bright = float(stats[2]), float(stats[3])
    left_i = int(round(float(stats[4])))
    right_count = int(round(float(stats[5])))
    n_rows, n_cols = len(y_rows), len(x_cols)

    has_tb = 0 < top_i and 0 < bottom_count and top_i + bottom_count < n_rows
    has_lr = 0 < left_i and 0 < right_count and left_i + right_count < n_cols
    if not has_tb and not has_lr:
        return FULL

    u0, v0, uw, vh = FULL
    if has_tb:
        bottom_anchor = n_rows - bottom_count - 1
        if bottom_anchor >= top_i:
            top = int(y_rows[min(top_i, n_rows - 1)])
            bottom = h - min(h, int(y_rows[bottom_anchor]) + 1)
            min_bar = max(8, int(h * 0.035))
            if top >= min_bar and bottom >= min_bar:
                big, small = max(top, bottom), min(top, bottom)
                if big - small <= max(18, int(big * 0.25)):
                    trim = max(2, min(8, int(round(h * 0.004))))
                    crop_top = max(0, min(top + trim, h - 2))
                    crop_bottom = max(crop_top + 1, h - bottom - trim)
                    crop_h = crop_bottom - crop_top
                    if (h - crop_h) >= max(16, int(h * 0.07)):
                        if center_mean >= 14.0 or center_bright >= 0.035:
                            v0, vh = crop_top / h, crop_h / h
    if has_lr:
        right_anchor = n_cols - right_count - 1
        if right_anchor >= left_i:
            left = int(x_cols[min(left_i, n_cols - 1)])
            right = w - min(w, int(x_cols[right_anchor]) + 1)
            min_bar = max(8, int(w * 0.035))
            if left >= min_bar and right >= min_bar:
                big, small = max(left, right), min(left, right)
                if big - small <= max(18, int(big * 0.25)):
                    trim = max(2, min(8, int(round(w * 0.004))))
                    crop_left = max(0, min(left + trim, w - 2))
                    crop_right = max(crop_left + 1, w - right - trim)
                    crop_w = crop_right - crop_left
                    if (w - crop_w) >= max(16, int(w * 0.07)):
                        u0, uw = crop_left / w, crop_w / w

    if (u0, v0, uw, vh) == FULL:
        return FULL
    return (u0, v0, uw, vh)


class CropController:
    """Hysteresis wrapper (reference crop.py:202-217): a detected crop
    applies immediately (with a 2px deadband); a full-frame result must
    repeat `full_hits_reset` times before the crop resets."""

    def __init__(self, full_hits_reset: int = 3, poll_every: int = 30):
        self.crop: Crop = FULL
        self.full_hits = 0
        self.full_hits_reset = full_hits_reset
        self.poll_every = poll_every
        self._frame = 0
        self._stats = jax.jit(crop_stats)

    @property
    def active(self) -> bool:
        return self.crop != FULL

    def update(self, rgb: jax.Array) -> Crop:
        """Call once per frame with the device frame; polls every N frames."""
        self._frame += 1
        if (self._frame - 1) % self.poll_every != 0:
            return self.crop
        h, w = rgb.shape[0], rgb.shape[1]
        stats = np.asarray(self._stats(rgb))
        detected = crop_from_stats(stats, w, h)
        if detected != FULL:
            self.full_hits = 0
            old = self.crop
            if max(abs(old[i] - detected[i]) for i in range(4)) >= 2.0 / max(h, 1):
                self.crop = detected
        else:
            self.full_hits += 1
            if self.full_hits >= self.full_hits_reset and self.active:
                self.crop = FULL
        return self.crop


def apply_crop(img: jax.Array, crop: Crop) -> jax.Array:
    """Slice [H,W,...] by a UV crop rect (static python floats)."""
    if crop == FULL:
        return img
    H, W = img.shape[0], img.shape[1]
    y0 = int(round(crop[1] * H))
    x0 = int(round(crop[0] * W))
    y1 = y0 + max(1, int(round(crop[3] * H)))
    x1 = x0 + max(1, int(round(crop[2] * W)))
    return img[y0:y1, x0:x1]
