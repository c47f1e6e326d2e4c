"""Pure jittable image/depth ops (NHWC, static shapes, MXU-friendly)."""

from desktop2stereo_tpu.ops.resize import (  # noqa: F401
    resize,
    resize_patch_aligned,
    patch_aligned_size,
)
from desktop2stereo_tpu.ops.normalize import (  # noqa: F401
    process,
    normalize_for_model,
    bgra_to_rgb,
)
from desktop2stereo_tpu.ops.depth_post import (  # noqa: F401
    normalize_depth,
    apply_gamma,
    apply_foreground_scale,
    anti_alias,
    ema,
    post_process_depth,
)
from desktop2stereo_tpu.ops.stereo import (  # noqa: F401
    make_sbs,
    dibr_render,
    compose_display,
    stereo_compose,
)
