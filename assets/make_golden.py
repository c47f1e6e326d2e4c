"""Generate assets/golden.png — the checked-in golden input for
tools/depth_visualize and manual depth-regression runs (the role
assets/cats.jpg plays in the reference, reference depth_visualize.py:1459).

A synthetic 1080p scene with the structure depth models respond to:
a sky→ground vertical gradient, overlapping rectangles at staggered
scales (occlusion ordering), a checkerboard floor receding to a vanishing
point (perspective cue), and high-contrast edges for the DIBR warp's
disocclusion path.  Deterministic: re-running reproduces the same file.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw


def make_golden(width: int = 1920, height: int = 1080) -> np.ndarray:
    img = Image.new("RGB", (width, height))
    d = ImageDraw.Draw(img)

    # sky gradient
    for y in range(height):
        t = y / height
        d.line([(0, y), (width, y)],
               fill=(int(90 + 100 * t), int(140 + 60 * t), int(220 - 90 * t)))

    # checkerboard floor receding to a vanishing point at the horizon
    horizon = int(height * 0.55)
    vp = (width // 2, horizon)
    for row in range(24):
        y0 = horizon + int((height - horizon) * (row / 24) ** 2)
        y1 = horizon + int((height - horizon) * ((row + 1) / 24) ** 2)
        cols = 16
        for c in range(cols):
            if (row + c) % 2:
                continue
            fx0 = c / cols - 0.5
            fx1 = (c + 1) / cols - 0.5
            s0 = (y0 - horizon) / max(height - horizon, 1)
            s1 = (y1 - horizon) / max(height - horizon, 1)
            spread = lambda f, s: int(vp[0] + f * width * (0.25 + 0.75 * s))
            d.polygon([(spread(fx0, s0), y0), (spread(fx1, s0), y0),
                       (spread(fx1, s1), y1), (spread(fx0, s1), y1)],
                      fill=(70, 60, 50))

    # staggered "buildings" — near objects larger & lower
    rng = np.random.default_rng(42)
    for i, (cx, w, h, col) in enumerate([
        (0.15, 0.18, 0.55, (180, 60, 50)),
        (0.38, 0.12, 0.40, (60, 140, 70)),
        (0.62, 0.22, 0.70, (210, 180, 60)),
        (0.85, 0.10, 0.30, (90, 80, 160)),
    ]):
        x0 = int((cx - w / 2) * width)
        x1 = int((cx + w / 2) * width)
        y1 = int(height * 0.92)
        y0 = y1 - int(h * height)
        d.rectangle([x0, y0, x1, y1], fill=col, outline=(20, 20, 20), width=4)
        # windows
        for wy in range(y0 + 30, y1 - 20, 70):
            for wx in range(x0 + 20, x1 - 30, 60):
                d.rectangle([wx, wy, wx + 28, wy + 40], fill=(245, 240, 200))

    # a near-field sphere (strong disparity + round occluder)
    d.ellipse([width * 0.42, height * 0.62, width * 0.58, height * 0.95],
              fill=(230, 230, 235), outline=(30, 30, 30), width=5)

    return np.asarray(img, np.uint8)


def letterbox(scene: np.ndarray, bar_frac: float = 0.12) -> np.ndarray:
    """Film-style black bars around the scene — the input that exercises the
    letterbox crop detector (reference xr_viewer/crop.py auto mode)."""
    h, w = scene.shape[:2]
    bar = int(h * bar_frac)
    out = np.zeros_like(scene)
    inner = np.asarray(
        Image.fromarray(scene).resize((w, h - 2 * bar), Image.BILINEAR)
    )
    out[bar:h - bar] = inner
    return out


def main() -> None:
    here = os.path.dirname(__file__)
    scene = make_golden()
    Image.fromarray(scene).save(os.path.join(here, "golden.png"))
    Image.fromarray(letterbox(scene)).save(
        os.path.join(here, "golden_letterbox.png"))
    print(f"wrote {here}/golden.png and golden_letterbox.png")


if __name__ == "__main__":
    main()
