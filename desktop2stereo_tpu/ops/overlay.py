"""GPU FPS overlay: 3x5 bitmap font rendered as a mask, composited in-graph.

Equivalent of the reference's tensor font overlay (reference
depth.py:641-658 font table, 2027-2103 overlay_fps): a tiny fixed-function
glyph set ("FPS: 12.3") scaled to the frame, blended green over the top-left
corner.  The mask is built host-side in numpy once per text change (the
reference rebuilds every 10 frames) and the blend is one fused multiply-add
on device.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Classic 3x5 block digits (rows of 3 bits each).
FONT: Dict[str, Tuple[str, ...]] = {
    "0": ("111", "101", "101", "101", "111"),
    "1": ("010", "110", "010", "010", "111"),
    "2": ("111", "001", "111", "100", "111"),
    "3": ("111", "001", "111", "001", "111"),
    "4": ("101", "101", "111", "001", "001"),
    "5": ("111", "100", "111", "001", "111"),
    "6": ("111", "100", "111", "101", "111"),
    "7": ("111", "001", "010", "100", "100"),
    "8": ("111", "101", "111", "101", "111"),
    "9": ("111", "101", "111", "001", "111"),
    "F": ("111", "100", "110", "100", "100"),
    "P": ("110", "101", "110", "100", "100"),
    "S": ("111", "100", "111", "001", "111"),
    ":": ("000", "010", "000", "010", "000"),
    ".": ("000", "000", "000", "000", "010"),
    " ": ("000", "000", "000", "000", "000"),
}


@functools.lru_cache(maxsize=64)
def text_mask(text: str, height: int, width: int) -> np.ndarray:
    """[H, W] float32 alpha mask with `text` rendered top-left, scaled like
    the reference (scale = clamp(H//60, 1, 8), reference depth.py:2070)."""
    scale = max(1, min(8, height // 60))
    char_h, char_w = 5 * scale, 3 * scale
    spacing = scale
    margin = 2 * scale
    mask = np.zeros((height, width), np.float32)
    for i, ch in enumerate(text):
        glyph = FONT.get(ch, FONT[" "])
        g = np.array([[1.0 if c == "1" else 0.0 for c in row] for row in glyph],
                     np.float32)
        g = np.repeat(np.repeat(g, scale, 0), scale, 1)
        x0 = margin + i * (char_w + spacing)
        y0 = margin
        x1, y1 = min(width, x0 + char_w), min(height, y0 + char_h)
        if x0 < width and y0 < height:
            mask[y0:y1, x0:x1] = np.maximum(mask[y0:y1, x0:x1],
                                            g[: y1 - y0, : x1 - x0])
    return mask


def overlay_text(rgb: jax.Array, mask: jax.Array,
                 color=(0.0, 255.0, 0.0)) -> jax.Array:
    """Blend a prepared text mask over rgb [H,W,3] (values 0..255),
    preserving the input dtype (uint8 frames stay uint8)."""
    alpha = mask[..., None].astype(jnp.float32)
    col = jnp.asarray(color, jnp.float32)
    out = rgb.astype(jnp.float32) * (1.0 - alpha) + col * alpha
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        out = jnp.clip(out + 0.5, 0, 255)
    return out.astype(rgb.dtype)


class FpsOverlay:
    """Host-side helper: throttled mask rebuild (every N frames, reference
    depth.py:2060-2063) + device blend."""

    def __init__(self, interval: int = 10):
        self.interval = interval
        self._frame = 0
        self._mask = None
        self._blend = jax.jit(overlay_text)

    def __call__(self, rgb: jax.Array, fps: float) -> jax.Array:
        h, w = rgb.shape[0], rgb.shape[1]
        if self._mask is None or self._frame % self.interval == 0 \
                or self._mask.shape != (h, w):
            self._mask = jnp.asarray(text_mask(f"FPS: {fps:.1f}", h, w))
        self._frame += 1
        return self._blend(rgb, self._mask)
