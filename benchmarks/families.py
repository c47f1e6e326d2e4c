"""Whole-pipeline device rate per model family (1080p → Half-SBS 1080p),
slope-timed.  Refreshes the README per-family table.

Default invocation spawns ONE SUBPROCESS PER FAMILY: params from earlier
models otherwise stay resident in HBM and inflate later families' numbers
(measured: DepthPro ~8% slower as the 10th in-process entry).  Pass family
names to measure just those, in-process.  `--quant int8` measures the
quantized path (fused Pallas kernel) instead of bf16.
"""
import os
import subprocess
import sys
import time

CONFIGS = [
    ("Depth-Anything-V2-Small", 518),
    ("Depth-Anything-V2-Base", 518),   # BASELINE configs[1] class
    ("Video-Depth-Anything-Small", 518),
    ("DA3-SMALL", 504),
    ("InfiniDepth-Small", 512),
    ("dpt-large", 384),
    ("dpt-hybrid-midas", 384),
    ("dpt-beit-base-384", 384),
    ("zoedepth-nyu", 384),
    ("DepthPro-Large", 1536),
    # giant class (the TP-rationale measurements, VERDICT r03 item 8):
    # ViT-G single-chip numbers + HBM footprint ground the docs'
    # "serve-by-DP vs shard-by-TP" call in measured data
    ("DA3-GIANT", 504),
    ("DA3NESTED-GIANT-LARGE", 504),
]


def _hbm_mb() -> float:
    """Live HBM bytes in use on device 0 (TPU runtime memory_stats)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1e6
    except Exception:
        return 0.0


def measure(name: str, res: int, quant: str = "none",
            stages: bool = False) -> None:
    import jax
    import numpy as np

    from desktop2stereo_tpu.core.config import Settings
    from desktop2stereo_tpu.core.registry import get_spec
    from desktop2stereo_tpu.core.runtime import (
        detect_policy, setup_compilation_cache)
    from desktop2stereo_tpu.models.factory import build_bound
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig

    try:
        from benchmarks._timing import slope_ms
    except ImportError:
        from _timing import slope_ms

    setup_compilation_cache()
    policy = detect_policy()

    H, W = 1080, 1920
    ps = get_spec(name).patch_size or 14
    bound, spec = build_bound(name, init_size=ps * 9, quant=quant)
    settings = Settings(model=name, depth_resolution=res,
                        output_resolution=1080, display_mode="Half-SBS",
                        depth_strength=2.0)
    cfg = ProgramConfig.from_settings(settings, quality="high")
    prog = ProgramCache(cfg, bound, spec, compute_dtype=policy.compute_dtype)
    frame = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (H, W, 4), dtype=np.uint8))
    t0 = time.time()
    prog.warmup((H, W, 4), steps=2)
    compile_s = time.time() - t0

    ms = slope_ms(lambda f: prog(f)[0], frame, n1=40, n2=160, warmup=8,
                  repeats=3)
    tag = f" [{quant}]" if quant != "none" else ""
    hbm = _hbm_mb()
    if hbm:
        hbm_s = f"  HBM {hbm / 1e3:.2f} GB"
    else:  # runtime without memory_stats (axon tunnel): params lower-bound
        pb = sum(x.nbytes for x in jax.tree_util.tree_leaves(bound.params)
                 if hasattr(x, "nbytes"))
        hbm_s = f"  params {pb / 1e9:.2f} GB"
    print(f"{name:32s} @{res}{tag}  {ms:7.2f} ms/frame  {1000.0/ms:6.1f} FPS"
          f"  (compile {compile_s:.0f}s){hbm_s}", flush=True)
    if stages:
        try:
            from benchmarks._timing import stage_slopes
        except ImportError:
            from _timing import stage_slopes
        br = stage_slopes(prog, frame, n1=20, n2=80, repeats=3)
        parts = "  ".join(f"{k[:-3]}={v}" for k, v in br.items()
                          if k.endswith("_ms"))
        note = br.get("note", "")
        print(f"{'':32s}  stages[ms]: {parts}{note}", flush=True)


def main() -> None:
    args = sys.argv[1:]
    quant = "none"
    stages = "--stages" in args
    if stages:
        args.remove("--stages")
    if "--quant" in args:
        i = args.index("--quant")
        if i + 1 >= len(args) or args[i + 1] not in ("none", "int8"):
            sys.exit("usage: families.py [--quant none|int8] [--stages] "
                     "[family ...]")
        quant = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args
    if names:
        configs = [c for c in CONFIGS if c[0] in names]
        for name, res in configs:
            measure(name, res, quant, stages=stages)
        return
    # one fresh process per family (serialized: one TPU holder at a time).
    # The repo root must ride in PYTHONPATH: the child starts as a plain
    # script so sys.path[0] is benchmarks/, not the root, and the package
    # is not pip-installed.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    for name, _res in CONFIGS:
        cmd = [sys.executable, os.path.abspath(__file__), name]
        if quant != "none":
            cmd += ["--quant", quant]
        if stages:
            cmd += ["--stages"]
        rc = subprocess.call(cmd, cwd=root, env=env)
        if rc != 0:
            print(f"{name}: FAILED rc={rc}", flush=True)


if __name__ == "__main__":
    main()
