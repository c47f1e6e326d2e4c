"""Whole-pipeline device rate per model family (1080p → Half-SBS 1080p),
slope-timed.  Refreshes the README per-family table."""
import sys
import time
import jax
import jax.numpy as jnp
import numpy as np

from desktop2stereo_tpu.core.config import Settings
from desktop2stereo_tpu.core.runtime import setup_compilation_cache, detect_policy
from desktop2stereo_tpu.models.factory import build_bound
from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig

setup_compilation_cache()
policy = detect_policy()

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
]
if len(sys.argv) > 1:
    CONFIGS = [c for c in CONFIGS if c[0] in sys.argv[1:]]

H, W = 1080, 1920
frame = None
scalar = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))

for name, res in CONFIGS:
    from desktop2stereo_tpu.core.registry import get_spec
    ps = get_spec(name).patch_size or 14
    bound, spec = build_bound(name, init_size=ps * 9)
    settings = Settings(model=name, depth_resolution=res,
                        output_resolution=1080, display_mode="Half-SBS",
                        depth_strength=2.0)
    cfg = ProgramConfig.from_settings(settings, quality="high")
    prog = ProgramCache(cfg, bound, spec, compute_dtype=policy.compute_dtype)
    if frame is None:
        frame = jax.device_put(np.random.default_rng(0).integers(
            0, 255, (H, W, 4), dtype=np.uint8))
    t0 = time.time()
    prog.warmup((H, W, 4), steps=2)
    compile_s = time.time() - t0

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            sbs, _d = prog(frame)
        float(scalar(sbs))
        return time.perf_counter() - t0

    run(8)
    n1, n2 = 40, 160
    ms = min((run(n2) - run(n1)) / (n2 - n1) * 1000 for _ in range(3))
    print(f"{name:32s} @{res}  {ms:7.2f} ms/frame  {1000.0/ms:6.1f} FPS"
          f"  (compile {compile_s:.0f}s)", flush=True)
