"""Per-stage device timings for the north-star config (4K, ViT-L @518).

Slope method: (time(n2 calls) - time(n1 calls)) / (n2 - n1), sync via a
data-dependent scalar fetch (block_until_ready is a no-op on the axon
tunnel) so the fetch RTT cancels out.
"""
import jax
import jax.numpy as jnp
import numpy as np

from desktop2stereo_tpu.core.config import Settings
from desktop2stereo_tpu.core.runtime import setup_compilation_cache, detect_policy
from desktop2stereo_tpu.models.factory import build_bound
from desktop2stereo_tpu.pipeline.programs import (
    FrameState, ProgramConfig, build_frame_step, init_state,
)

setup_compilation_cache()
policy = detect_policy()

H, W = 2160, 3840
model_name = "Depth-Anything-V2-Large"
bound, spec = build_bound(model_name, init_size=126)
settings = Settings(model=model_name, depth_resolution=518,
                    output_resolution=2160, display_mode="Half-SBS",
                    depth_strength=2.0)
cfg = ProgramConfig.from_settings(settings, quality="high")

step = build_frame_step(cfg, bound, spec, compute_dtype=policy.compute_dtype, jit=True)
stages = step.stages
model_j = jax.jit(lambda p, x: bound.first(p, x)[0])

frame = jax.device_put(
    np.random.default_rng(0).integers(0, 255, (H, W, 4), dtype=np.uint8))
state = jax.device_put(init_state(H, W))

try:
    from benchmarks._timing import timeit
except ImportError:
    from _timing import timeit


total = 0.0
if len(stages) == 2:
    pre_j, post_stereo_j = stages
    rgbp, model_in = pre_j(frame)
    raw = model_j(bound.params, model_in)
    raw1 = raw[0] if raw.ndim == 3 else raw
    print(f"[fused-tail structure] rgbp {rgbp.shape} {rgbp.dtype}, "
          f"model_in {model_in.shape}")
    total += timeit("pre (planar)", pre_j, frame)
    total += timeit("model", model_j, bound.params, model_in)
    total += timeit("post+stereo fused", post_stereo_j, raw1, state.ema_depth, rgbp)
else:
    pre_j, post_j, stereo_j = stages
    rgb, model_in = pre_j(frame)
    raw = model_j(bound.params, model_in)
    raw1 = raw[0] if raw.ndim == 3 else raw
    depth_full = post_j(raw1, state.ema_depth)
    total += timeit("pre", pre_j, frame)
    total += timeit("model", model_j, bound.params, model_in)
    total += timeit("post", post_j, raw1, state.ema_depth)
    total += timeit("stereo", stereo_j, rgb, depth_full)
print(f"{'sum':22s} {total:7.2f} ms   ({1000.0/total:.1f} FPS)")

# sanity: run the full step and check output
sbs, depth, _ = step(frame, state)
print("sbs:", sbs.shape, sbs.dtype, "depth:", depth.shape, depth.dtype)
print("sample:", np.asarray(sbs[::800, ::1000, 0]).tolist())
