"""Frame pipeline: jitted programs + 3-stage latest-frame-wins engine."""

from desktop2stereo_tpu.pipeline.programs import (  # noqa: F401
    ProgramConfig,
    ProgramCache,
    build_frame_step,
    init_state,
    FrameState,
)
from desktop2stereo_tpu.pipeline.engine import FrameEngine, Mailbox  # noqa: F401
from desktop2stereo_tpu.pipeline.metrics import FpsCounter, StageLatency  # noqa: F401
