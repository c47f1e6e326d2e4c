"""XR frame-server core: the platform-independent half of the reference's
OpenXR viewer (reference xr_viewer/), kept so a workstation XR client can
attach to a TPU pipeline over the `update_frame(rgb, depth)` interface
(reference viewer.py:2359) without any GPU/OpenXR dependency on this side.

- geometry: virtual screen meshes + pose matrices (reference screen.py)
- filters:  OneEuro smoothing + quaternion slerp (reference input.py, laser.py)
- glb:      glTF2/GLB environment parser (reference render.py:21-230)
- frame_server: latest-frame mailbox an XR client polls
"""

from desktop2stereo_tpu.xr.filters import OneEuroFilter, OneEuroFilter3D, slerp
from desktop2stereo_tpu.xr.frame_server import FrameServer
from desktop2stereo_tpu.xr.geometry import SCREEN_PRESETS, ScreenPose

__all__ = [
    "OneEuroFilter",
    "OneEuroFilter3D",
    "slerp",
    "FrameServer",
    "ScreenPose",
    "SCREEN_PRESETS",
]
