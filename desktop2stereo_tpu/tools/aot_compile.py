"""Ahead-of-time program builder: pre-populate the persistent XLA cache.

The reference lazily builds a fixed-shape TensorRT/CoreML/OpenVINO engine on
the first frame and stores it on disk keyed by model+shape+dtype (reference
depth.py:1841-1862 `_ensure_engine_built`, 1587-1631 `warmup_model`).  The
TPU analog is XLA's persistent compilation cache — this tool walks a set of
capture shapes and compiles every stage program up front so a production
run's first frame is served at steady-state latency.

    python -m desktop2stereo_tpu.tools.aot_compile \
        --model Depth-Anything-V2-Large --depth-res 518 \
        --shapes 2160x3840,1080x1920 --output-resolution 2160
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="Depth-Anything-V2-Small")
    ap.add_argument("--depth-res", type=int, default=None,
                    help="model input resolution (default: registry default)")
    ap.add_argument("--shapes", default="1080x1920",
                    help="comma-separated capture HxW list")
    ap.add_argument("--output-resolution", type=int, default=1080)
    ap.add_argument("--display-mode", default="Half-SBS")
    ap.add_argument("--quality", choices=("high", "fast"), default="high")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="pre-compile the int8 encoder variant")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args(argv)

    from desktop2stereo_tpu.core.config import Settings
    from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache
    from desktop2stereo_tpu.models.factory import build_bound
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig

    cache_dir = setup_compilation_cache()
    policy = detect_policy(prefer_fp32=args.fp32)
    print(f"[aot] cache: {cache_dir}")
    print(f"[aot] device: {policy.description}, dtype: {policy.compute_dtype.__name__}")

    bound, spec = build_bound(args.model, checkpoint=args.checkpoint,
                              init_size=args.depth_res, quant=args.quant)
    settings = Settings(
        model=args.model,
        depth_resolution=args.depth_res or (spec.resolutions or (384,))[0],
        output_resolution=args.output_resolution,
        display_mode=args.display_mode,
    )
    cfg = ProgramConfig.from_settings(settings, quality=args.quality)
    from desktop2stereo_tpu.core.registry import effective_compute_dtype

    compute = effective_compute_dtype(spec, policy.compute_dtype)
    cache = ProgramCache(cfg, bound, spec, compute_dtype=compute)

    for shape in args.shapes.split(","):
        h, w = (int(v) for v in shape.lower().split("x"))
        t0 = time.perf_counter()
        cache.warmup((h, w, 4))
        print(f"[aot] {h}x{w}: compiled+primed in {time.perf_counter() - t0:.1f}s")
    print("[aot] done — programs persisted; production first-frame is warm")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
