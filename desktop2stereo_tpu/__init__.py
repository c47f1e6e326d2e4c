"""desktop2stereo_tpu — TPU-native real-time 2D→3D stereo conversion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
lc700x/desktop2stereo (reference: /root/reference): capture → monocular depth
(DINOv2-ViT + DPT families) → DIBR stereo compositing, as fused jitted XLA
programs with Pallas kernels on the hot paths.

Public surface:
    from desktop2stereo_tpu import core, ops, models, pipeline, sources, sinks
"""

__version__ = "0.1.0"

from desktop2stereo_tpu.core.config import Settings, load_settings, save_settings  # noqa: F401
