"""North-star benchmark: 4K frame → depth (DA-V2 ViT-L @ 518) → Half-SBS,
the full frame program on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline compares against the reference's best published 4K→4K number
(18 FPS, depth-res 384, RX 9060XT — reference Benchmark.md:9; see
BASELINE.md); the north star (≥60 FPS at the much larger ViT-L) needs ~3.3×.

The metric is the DEVICE pipeline rate: every stage the reference counts in
its FPS (preprocess → ViT-L → depth post → DIBR stereo composite) runs on
the TPU, with the next frame's program chained after the previous frame's
completion.  Host↔device copies are measured and reported separately
("tunnel_*"): this dev harness reaches the chip through a network tunnel
(~15-90 MB/s vs PCIe's ~16 GB/s on a real TPU host), so folding them into
the headline number would benchmark the tunnel, not the framework.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_4K_FPS = 18.0  # reference Benchmark.md:9 (best 4K→4K row)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from desktop2stereo_tpu.core.config import Settings
    from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache
    from desktop2stereo_tpu.models.factory import build_bound
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig

    setup_compilation_cache()
    policy = detect_policy()

    model_name = "Depth-Anything-V2-Large"
    settings = Settings(
        model=model_name,
        depth_resolution=518,
        output_resolution=2160,   # 4K in → 4K out
        display_mode="Half-SBS",
        depth_strength=2.0,
    )
    t0 = time.time()
    bound, spec = build_bound(model_name, init_size=126)
    cfg = ProgramConfig.from_settings(settings, quality="high")
    program = ProgramCache(cfg, bound, spec, compute_dtype=policy.compute_dtype)

    frame_shape = (2160, 3840, 4)
    program.warmup(frame_shape, steps=2)
    compile_s = time.time() - t0

    # one synthetic 4K frame resident in HBM (the capture stage's product)
    frame = jax.device_put(
        np.random.default_rng(0).integers(0, 255, frame_shape, dtype=np.uint8)
    )

    # --- device pipeline rate: frame N+1 chained after frame N -------------
    # NOTE block_until_ready does not truly block on the axon dev tunnel, so
    # sync through a data-dependent scalar fetch, amortized over batches.
    scalar = jax.jit(lambda x: x[0, 0, 0].astype(jnp.float32))
    for _ in range(3):
        sbs, depth = program(frame)
    float(scalar(sbs))

    frames = 0
    # The data-dependent scalar fetch costs a full tunnel round-trip
    # (~30 ms on the dev harness, ~µs on a real TPU host); amortize it over
    # a large enough batch that it stays measurement noise (<0.5 ms/frame).
    batch = 64
    t0 = time.time()
    measure_s = 12.0
    while time.time() - t0 < measure_s:
        for _ in range(batch):
            sbs, depth = program(frame)
            frames += 1
        float(scalar(sbs))
    elapsed = time.time() - t0
    fps = frames / elapsed

    # --- host upload overhead (tunnel on this dev harness, PCIe in prod).
    # Downloads are NOT timed: the dev tunnel's d2h path stalls for minutes
    # under HBM pressure, which would wedge the benchmark while measuring
    # nothing about the framework.
    h_frame = np.zeros(frame_shape, np.uint8)
    t0 = time.time()
    jax.block_until_ready(jax.device_put(h_frame))
    h2d_s = time.time() - t0

    result = {
        "metric": "device_pipeline_fps_4k_halfsbs_vitl518",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_4K_FPS, 3),
        "frames": frames,
        "frame_ms": round(1000.0 * elapsed / max(frames, 1), 2),
        "tunnel_h2d_ms": round(h2d_s * 1000, 1),
        "platform": policy.platform,
        "devices": policy.description,
        "compile_s": round(compile_s, 1),
        "config": "4K synthetic -> DA-V2 ViT-L @518 (random weights, bf16) -> Half-SBS 4K",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
