"""`--settings file.yaml` alone must reproduce a reference run: the
reference app is driven entirely by settings.yaml (capture mode/window/
monitor utils.py:840,853-854, run mode 1046-1064, crop mode 1073), so
unset CLI flags resolve from it.  Explicit flags always win."""

import pytest

from desktop2stereo_tpu.cli import (
    apply_settings_defaults,
    build_parser,
    _sink_for_run_mode,
)
from desktop2stereo_tpu.core.config import Settings


def _resolve(argv, settings):
    args = build_parser().parse_args(argv)
    apply_settings_defaults(args, settings)
    return args


def test_no_settings_keeps_historical_defaults():
    args = _resolve([], Settings())
    assert args.source == "synthetic"
    assert args.sink == "mjpeg"
    assert args.crop == "off"
    assert args.monitor == 0
    assert args.window_title is None


def test_settings_drive_capture_and_sink():
    s = Settings(run_mode="OpenXR Link")
    s.extra.update({
        "Capture Mode": "Window",
        "Window Title": "vlc",
        "Monitor Index": 1,
        "Crop Mode": "Auto",
    })
    args = _resolve(["--settings", "x.yaml"], s)
    assert args.source == "screen" and args.source_from_settings
    assert args.sink == "xr"
    assert args.window_title == "vlc"
    assert args.monitor == 1
    assert args.crop == "auto"


def test_explicit_flags_beat_settings():
    s = Settings(run_mode="RTMP Streamer")
    s.extra.update({"Capture Mode": "Window", "Window Title": "vlc",
                    "Crop Mode": "auto", "Monitor Index": 2})
    args = _resolve(
        ["--settings", "x.yaml", "--source", "synthetic", "--sink", "png",
         "--crop", "off", "--monitor", "0", "--window-title", "other"], s)
    assert args.source == "synthetic"
    assert args.sink == "png"
    assert args.crop == "off"
    assert args.monitor == 0
    assert args.window_title == "other"


def test_run_mode_sink_mapping(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    assert _sink_for_run_mode("Local Viewer") == "viewer"
    monkeypatch.setenv("DISPLAY", ":0")
    assert _sink_for_run_mode("Local Viewer") == "window"
    assert _sink_for_run_mode("3D Monitor") == "window"
    assert _sink_for_run_mode("MJPEG Streamer") == "mjpeg"
    assert _sink_for_run_mode("RTMP Streamer") == "rtmp"
    assert _sink_for_run_mode("OpenXR Link") == "xr"
    assert _sink_for_run_mode("Streamer") == "mjpeg"


def test_monitor_index_none_string_is_ignored():
    # the reference default is the literal string "none" (settings.yaml)
    s = Settings()
    s.extra["Monitor Index"] = "none"
    args = _resolve(["--settings", "x.yaml"], s)
    assert args.monitor == 0


def test_xr_preview_tees_mjpeg():
    s = Settings(run_mode="OpenXR Link")
    s.extra["XR Preview"] = True
    args = _resolve(["--settings", "x.yaml"], s)
    assert args.sink == "xr,mjpeg"
    # explicit --sink wins over the preview tee
    args = _resolve(["--settings", "x.yaml", "--sink", "xr"], s)
    assert args.sink == "xr"


def test_tee_sink_fans_out_and_propagates_errors():
    import numpy as np
    from desktop2stereo_tpu.sinks.tee import TeeSink

    class Rec:
        def __init__(self):
            self.frames = []
            self.closed = False
            self.url = None

        def push(self, sbs, depth, stats):
            self.frames.append(sbs)

        def close(self):
            self.closed = True

    class Boom(Rec):
        def push(self, sbs, depth, stats):
            raise RuntimeError("window closed")

    a, b = Rec(), Rec()
    tee = TeeSink([a, b])
    frame = np.zeros((4, 6, 3), np.uint8)
    tee.push(frame, None, {})
    assert len(a.frames) == len(b.frames) == 1
    tee.close()
    assert a.closed and b.closed

    # a failing member still lets the others receive the frame, then the
    # error surfaces so the engine shuts down (window-close semantics)
    import pytest
    boom, ok = Boom(), Rec()
    tee2 = TeeSink([boom, ok])
    with pytest.raises(RuntimeError):
        tee2.push(frame, None, {})
    assert len(ok.frames) == 1


def test_device_probe_reports_backend_error_immediately(monkeypatch):
    """A jax.devices() exception (e.g. ABORTED: chip grant held elsewhere)
    must surface immediately, not masquerade as a 180 s tunnel hang."""
    import time

    import jax

    from desktop2stereo_tpu.cli import _apply_device_choice

    def boom():
        raise RuntimeError("ABORTED: TPU backend error")

    monkeypatch.setattr(jax, "devices", boom)
    t0 = time.monotonic()
    with pytest.raises(SystemExit) as e:
        _apply_device_choice("auto")
    assert e.value.code == 2
    assert time.monotonic() - t0 < 30.0


def test_device_tpu_refuses_cpu_fallback(monkeypatch):
    """--device tpu must abort rather than silently run at CPU speed."""
    import types as _types

    import jax

    from desktop2stereo_tpu.cli import _apply_device_choice

    fake = _types.SimpleNamespace(platform="cpu")
    monkeypatch.setattr(jax, "devices", lambda: [fake])
    with pytest.raises(SystemExit) as e:
        _apply_device_choice("tpu")
    assert e.value.code == 2
    # 'auto' accepts the CPU fallback
    _apply_device_choice("auto")
