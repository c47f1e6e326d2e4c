"""Output sinks: where composed stereo frames go.

All sinks expose `push(sbs_u8, depth, stats)` — the TPU-host analog of the
reference's presentation layer (`StereoWindow.update_frame`, reference
viewer.py:2359).  On a headless TPU host the useful sinks are MJPEG HTTP
(port of concept from reference streamer.py), file/PNG, and ffmpeg RTMP;
a GL/XR viewer is host-hardware dependent and attaches through the same
interface from a workstation client.
"""

from desktop2stereo_tpu.sinks.png import PngSink  # noqa: F401
from desktop2stereo_tpu.sinks.null import NullSink  # noqa: F401
from desktop2stereo_tpu.sinks.mjpeg import MjpegSink  # noqa: F401
from desktop2stereo_tpu.sinks.video import VideoSink  # noqa: F401


def make_sink(kind: str, **kw):
    if kind == "png":
        return PngSink(**kw)
    if kind == "null":
        return NullSink(**kw)
    if kind == "mjpeg":
        return MjpegSink(**kw)
    if kind == "video":
        return VideoSink(**kw)
    if kind == "rtmp":
        from desktop2stereo_tpu.sinks.rtmp import RtmpSink

        return RtmpSink(**kw)
    if kind == "viewer":
        from desktop2stereo_tpu.sinks.viewer import StereoWindow

        return StereoWindow(**kw)
    if kind == "window":
        from desktop2stereo_tpu.sinks.window import WindowSink

        return WindowSink(**kw)
    if kind == "xr":
        from desktop2stereo_tpu.sinks.xr import XrSink

        return XrSink(**kw)
    raise ValueError(f"unknown sink kind {kind!r}")
