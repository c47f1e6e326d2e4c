"""Frame sources: everything that can feed the pipeline.

All sources expose the reference's grabber interface
(`grab() -> frame | None`, reference capture.py:219): synthetic and
image/video sources are first-class (CI and headless TPU hosts, mirroring the
reference's standalone-test fake queue, reference implementation.py:2321-2351);
real screen capture is an optional extra behind the same interface.
"""

from desktop2stereo_tpu.sources.synthetic import SyntheticSource  # noqa: F401
from desktop2stereo_tpu.sources.image import ImageSource  # noqa: F401
from desktop2stereo_tpu.sources.video import VideoSource  # noqa: F401


def make_source(kind: str, **kw):
    if kind == "synthetic":
        return SyntheticSource(**kw)
    if kind == "image":
        return ImageSource(**kw)
    if kind == "video":
        return VideoSource(**kw)
    if kind == "screen":
        from desktop2stereo_tpu.sources.screen import ScreenSource

        return ScreenSource(**kw)
    if kind == "shm":
        from desktop2stereo_tpu.sources.shm import ShmSource

        return ShmSource(**kw)
    if kind == "tcp":
        from desktop2stereo_tpu.sources.net import TcpFrameSource

        return TcpFrameSource(**kw)
    raise ValueError(f"unknown source kind {kind!r}")
