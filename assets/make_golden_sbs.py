"""Generate assets/golden_sbs.npz — the checked-in end-to-end regression
artifact: golden.png → DA-V2-Small (seeded random weights, rng_seed=0) →
full high-quality pipeline → Half-SBS u8 + depth, at 180p.

Plays the role of the reference's de-facto numerical-regression harness
(depth_visualize.py on assets/cats.jpg, reference depth_visualize.py:1459)
but automated: tests/test_golden_regression.py re-runs the pipeline on CPU
and compares against this artifact within a small tolerance, catching
unintended numerical drift anywhere in preprocess → model → depth post →
DIBR → compose.

Regenerate under the EXACT test environment (numerics shift by a few u8
LSBs under different CPU scheduling):

    PYTHONPATH=. TF_ENABLE_ONEDNN_OPTS=0 \\
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python assets/make_golden_sbs.py
"""

from __future__ import annotations

import os

import numpy as np


def generate():
    # align numerics with the test environment (conftest.py): oneDNN
    # rewrites CPU matmul schedules and shifts results by a few u8 LSBs
    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from desktop2stereo_tpu.core.config import Settings
    from desktop2stereo_tpu.models.factory import build_bound
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig

    here = os.path.dirname(os.path.abspath(__file__))
    bound, spec = build_bound("Depth-Anything-V2-Small", init_size=126,
                              rng_seed=0)
    cfg = ProgramConfig.from_settings(
        Settings(model="Depth-Anything-V2-Small", depth_resolution=126,
                 output_resolution=180),
        quality="high",
    )
    prog = ProgramCache(cfg, bound, spec)
    img = np.asarray(Image.open(os.path.join(here, "golden.png"))
                     .resize((320, 180)))
    frame = np.dstack([img[..., ::-1],
                       np.full(img.shape[:2], 255, np.uint8)])
    sbs, depth = prog(frame)
    return frame, np.asarray(sbs), np.asarray(depth, np.float32)


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    frame, sbs, depth = generate()
    out = os.path.join(here, "golden_sbs.npz")
    np.savez_compressed(out, frame=frame, sbs=sbs,
                        depth=depth.astype(np.float16))
    print(f"wrote {out}: sbs {sbs.shape}, depth {depth.shape}")


if __name__ == "__main__":
    main()
