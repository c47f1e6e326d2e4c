"""North-star benchmark: 4K frame → depth (DA-V2 ViT-L @ 518) → Half-SBS,
end-to-end through the frame engine on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline compares against the reference's best published 4K→4K number
(18 FPS, depth-res 384, RX 9060XT — reference Benchmark.md:9; see
BASELINE.md), which our north star (≥60 FPS with a much larger ViT-L)
must beat by ~3.3×.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_4K_FPS = 18.0  # reference Benchmark.md:9 (best 4K→4K row)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from desktop2stereo_tpu.core.config import Settings
    from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache
    from desktop2stereo_tpu.models.factory import build_model
    from desktop2stereo_tpu.pipeline.engine import FrameEngine
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig
    from desktop2stereo_tpu.sinks.null import NullSink
    from desktop2stereo_tpu.sources.synthetic import SyntheticSource

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
    apply_fn, params, spec = build_model(model_name, init_size=126)
    params = jax.tree.map(lambda p: jax.device_put(p), params)
    cfg = ProgramConfig.from_settings(settings, quality="high")
    program = ProgramCache(
        cfg, lambda x: apply_fn(params, x), spec, compute_dtype=policy.compute_dtype
    )

    frame_shape = (2160, 3840, 4)
    program.warmup(frame_shape, steps=3)
    compile_s = time.time() - t0

    source = SyntheticSource(size=frame_shape[:2], channels=4)
    sink = NullSink()
    engine = FrameEngine(source, program, sink, target_fps=0.0)
    engine.start()
    measure_s = 12.0
    time.sleep(measure_s)
    engine.stop()
    stats = engine.stats_final()

    fps = stats.frames / measure_s if stats.fps == 0 else stats.fps
    result = {
        "metric": "e2e_fps_4k_halfsbs_vitl518",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_4K_FPS, 3),
        "fps_1pct_low": round(stats.fps_1pct_low, 2),
        "frames": stats.frames,
        "latency_ms": {k: round(v * 1000, 2) for k, v in stats.latency.items()},
        "platform": policy.platform,
        "devices": policy.description,
        "compile_s": round(compile_s, 1),
        "config": "4K synthetic -> DA-V2 ViT-L @518 (random weights, bf16) -> Half-SBS 4K",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
