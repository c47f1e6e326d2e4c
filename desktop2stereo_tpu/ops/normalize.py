"""Frame preprocessing: BGRA→RGB, output-height resize, model normalization.

Replicates the reference's `process()` (reference depth.py:542-566: BGRA→RGB +
aspect-keeping even-dim downscale with bilinear+antialias) and its ImageNet
normalization split by model family (reference depth.py:1794-1799: DPT /
ZoeDepth / DepthPro use mean=std=0.5; everything else classic ImageNet).
All functions are pure, jittable, NHWC.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.resize import resize

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
HALF_MEAN = (0.5, 0.5, 0.5)
HALF_STD = (0.5, 0.5, 0.5)


def norm_constants(norm_family: str) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    if norm_family == "half":
        return HALF_MEAN, HALF_STD
    if norm_family == "none":
        # model normalizes internally; pass RGB [0,1] through
        # (InfiniDepth, reference depth.py:1945)
        return (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    return IMAGENET_MEAN, IMAGENET_STD


def process_frame_size(h: int, w: int, target_height: int) -> Tuple[int, int]:
    """Even-aligned aspect-keeping output size (reference depth.py:557-559)."""
    if target_height >= h:
        return h, w
    new_h = (target_height // 2) * 2
    new_w = (int(w * target_height / h) // 2) * 2
    return new_h, new_w


def bgra_to_rgb(frame: jax.Array) -> jax.Array:
    """[H,W,4] or [H,W,3] BGR(A) uint8 → [H,W,3] RGB."""
    return frame[..., :3][..., ::-1]


def process(frame: jax.Array, target_height: int, compute_dtype=jnp.float32) -> jax.Array:
    """Capture frame → RGB float frame at output resolution.

    Input: [H,W,3|4] uint8 BGRA/BGR (capture layout).  Output: [H',W',3]
    float RGB in [0,255], downscaled to `target_height` with
    bilinear+antialias exactly like the reference CUDA path
    (reference depth.py:560-566).
    """
    rgb = bgra_to_rgb(frame).astype(compute_dtype)
    h, w = rgb.shape[-3], rgb.shape[-2]
    nh, nw = process_frame_size(h, w, target_height)
    if (nh, nw) == (h, w):
        return rgb
    return resize(rgb, (nh, nw), mode="bilinear", antialias=nh < h)


def normalize_for_model(
    rgb01: jax.Array, norm_family: str = "imagenet"
) -> jax.Array:
    """(x - mean)/std with the family's constants; NHWC, x in [0,1]."""
    mean, std = norm_constants(norm_family)
    mean_a = jnp.asarray(mean, dtype=rgb01.dtype)
    inv_std = jnp.asarray([1.0 / s for s in std], dtype=rgb01.dtype)
    return (rgb01 - mean_a) * inv_std
