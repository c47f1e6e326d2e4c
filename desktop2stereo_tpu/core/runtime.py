"""Device runtime: discovery, dtype policy, mesh, compilation cache.

The reference enumerates DirectML/MPS/CUDA/XPU/CPU and picks one device by
index (reference utils.py:1077-1096), chooses an autocast dtype per platform
(reference models/InfiniDepth/model/model.py:19-40), and caches compiled
engines on disk keyed by dtype+shape (reference depth.py:1841-1859).

TPU-native translation: JAX platform discovery, a bfloat16-first dtype policy
(the MXU's native low-precision type), a `jax.sharding.Mesh` instead of a
single torch.device, and the XLA persistent compilation cache instead of
.trt/.mlpackage files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Mesh axis names used across the framework:
#   "data"  — frame/stream-level data parallelism (multi-display capture)
#   "model" — tensor parallelism inside one model (ViT-G scale)
DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class DevicePolicy:
    """Resolved execution policy for the active platform."""

    platform: str                 # "tpu" | "cpu" | "gpu"
    compute_dtype: jnp.dtype      # bf16 on TPU, f32 on CPU
    param_dtype: jnp.dtype        # weights storage dtype
    num_devices: int
    description: str

    @property
    def is_tpu(self) -> bool:
        return self.platform == "tpu"


def detect_policy(prefer_fp32: bool = False) -> DevicePolicy:
    devs = jax.devices()
    platform = devs[0].platform
    # axon tunnels expose TPU as platform "tpu"; treat anything non-cpu/gpu
    # with a TPU-ish device_kind as tpu.
    kind = getattr(devs[0], "device_kind", "")
    if "TPU" in str(kind).upper():
        platform = "tpu"
    if platform == "tpu" and not prefer_fp32:
        compute = jnp.bfloat16
    else:
        compute = jnp.float32
    return DevicePolicy(
        platform=platform,
        compute_dtype=compute,
        param_dtype=jnp.float32,
        num_devices=len(devs),
        description=f"{len(devs)}x {kind or platform}",
    )


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh over the available devices.

    Single-chip runs get a trivial 1x1 mesh so every program is written
    against a mesh regardless of scale — the multi-chip path is the same
    code with a bigger mesh (replaces the reference's single torch.device).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    if num_data * num_model > n:
        raise ValueError(f"mesh {num_data}x{num_model} needs more than {n} devices")
    grid = np.array(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, *trailing: Optional[str]) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *trailing))


def setup_compilation_cache(cache_dir: Optional[str] = None) -> str:
    """Enable XLA's persistent compilation cache.

    Plays the role of the reference's on-disk TensorRT/CoreML/OpenVINO engine
    files keyed by dtype+shape (reference depth.py:1841-1859): first run pays
    the compile, later runs load the cached executable.
    """
    cache_dir = cache_dir or os.environ.get(
        "D2S_COMPILE_CACHE", os.path.expanduser("~/.cache/desktop2stereo_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs — cache is best-effort
    return cache_dir


def upload(
    x: np.ndarray,
    sharding: Optional[NamedSharding] = None,
    donate_to: Optional[jax.Array] = None,
) -> jax.Array:
    """Host→HBM transfer for a frame.

    This is the TPU analog of the reference's pinned-staging/PBO upload rings
    (reference viewer.py:1584-1744, xr_viewer/frame.py:62-161): `device_put`
    is async — it returns immediately with the copy in flight, and the frame
    engine overlaps it with the previous frame's compute.
    """
    if sharding is not None:
        return jax.device_put(x, sharding)
    return jax.device_put(x)
