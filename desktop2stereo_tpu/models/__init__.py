"""Model zoo: flax reimplementations of the reference's depth families."""

from desktop2stereo_tpu.models.factory import build_model  # noqa: F401
from desktop2stereo_tpu.models.depth_anything import DepthAnything  # noqa: F401
