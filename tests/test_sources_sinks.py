"""Sources and sinks: interfaces, MJPEG HTTP stream served end-to-end."""

import http.client
import os
import time

import numpy as np
import pytest

from desktop2stereo_tpu.sinks.mjpeg import MjpegSink
from desktop2stereo_tpu.sinks.null import NullSink
from desktop2stereo_tpu.sinks.png import PngSink
from desktop2stereo_tpu.sources.image import ImageSource
from desktop2stereo_tpu.sources.synthetic import SyntheticSource


def test_synthetic_source_frames_and_exhaustion():
    src = SyntheticSource(size=(72, 96), max_frames=3)
    shapes = []
    while (f := src.grab()) is not None:
        shapes.append(f.shape)
        assert f.dtype == np.uint8
    assert shapes == [(72, 96, 4)] * 3


def test_synthetic_source_animates():
    src = SyntheticSource(size=(72, 96))
    a = src.grab().copy()
    for _ in range(20):
        b = src.grab()
    assert not np.array_equal(a, b)


def test_image_source_bgra(tmp_path):
    from PIL import Image

    p = tmp_path / "x.png"
    arr = np.zeros((10, 12, 3), dtype=np.uint8)
    arr[..., 0] = 200  # red image
    Image.fromarray(arr).save(p)
    src = ImageSource(str(p), max_frames=2)
    f = src.grab()
    assert f.shape == (10, 12, 4)
    assert f[0, 0, 2] == 200 and f[0, 0, 0] == 0  # R landed in BGRA slot 2
    assert src.grab() is not None and src.grab() is None


def test_png_sink(tmp_path):
    sink = PngSink(str(tmp_path), every=2, save_depth=True)
    frame = np.zeros((8, 8, 3), dtype=np.uint8)
    depth = np.full((8, 8), 0.5, dtype=np.float32)
    for _ in range(4):
        sink.push(frame, depth, {})
    files = sorted(os.listdir(tmp_path))
    assert files == ["depth_000000.png", "depth_000002.png", "sbs_000000.png", "sbs_000002.png"]


def test_mjpeg_sink_serves_stream():
    sink = MjpegSink(port=0, fps=30.0, quality=80, host="127.0.0.1")
    try:
        frame = np.zeros((32, 48, 3), dtype=np.uint8)
        frame[:, :24] = (255, 0, 0)
        sink.push(frame, None, {})

        conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
        conn.request("GET", "/")
        page = conn.getresponse()
        assert page.status == 200
        assert b"/stream" in page.read()

        conn2 = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
        conn2.request("GET", "/stream")
        r = conn2.getresponse()
        assert r.status == 200
        assert "multipart/x-mixed-replace" in r.getheader("Content-Type")
        deadline = time.time() + 5
        data = b""
        while time.time() < deadline and b"\xff\xd8" not in data:  # JPEG SOI
            chunk = r.read(256)
            if not chunk:
                break
            data += chunk
            sink.push(frame, None, {})
        assert b"--frame" in data and b"\xff\xd8" in data
        conn2.close()
        conn.close()
    finally:
        sink.close()


def test_mjpeg_mode_endpoint():
    """GET /mode: the HTTP analog of the viewer's display-mode hot-keys."""
    import json

    class FakeProgram:
        def __init__(self):
            from desktop2stereo_tpu.pipeline.programs import ProgramConfig
            from desktop2stereo_tpu.core.config import Settings

            self.cfg = ProgramConfig.from_settings(Settings())
            self.calls = []

        def set_display_mode(self, m):
            from desktop2stereo_tpu.core.config import DISPLAY_MODES

            if m not in DISPLAY_MODES:
                raise ValueError(m)
            self.calls.append(m)

        @property
        def display_mode(self):
            # pending-aware, like ProgramCache.display_mode: a just-set
            # mode reports immediately, before a frame applies it
            return self.calls[-1] if self.calls else self.cfg.display_mode

    sink = MjpegSink(port=0, host="127.0.0.1")
    try:
        def get(path):
            conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
            conn.request("GET", path)
            r = conn.getresponse()
            body = r.read()
            conn.close()
            return r.status, json.loads(body)

        status, _ = get("/mode")
        assert status == 503  # no pipeline attached yet

        prog = FakeProgram()
        sink.mode_switcher = prog
        status, body = get("/mode")
        assert status == 200 and "available" in body

        status, body = get("/mode?set=Anaglyph")
        assert status == 200 and prog.calls == ["Anaglyph"]

        # pending-aware read-back: the endpoint must report the just-set
        # mode even before the next frame applies it (r05 review fix)
        status, body = get("/mode")
        assert status == 200 and body["mode"] == "Anaglyph"

        status, body = get("/mode?set=Bogus")
        assert status == 400 and "error" in body
    finally:
        sink.close()


def test_mjpeg_strength_endpoint():
    """GET /strength: the HTTP analog of the reference viewer's UP/DOWN/0
    depth-ratio keys (reference viewer.py:2321-2329)."""
    import json

    class FakeProgram:
        def __init__(self):
            self.value = 2.0

        @property
        def depth_strength(self):
            return self.value

        def set_depth_strength(self, v):
            self.value = min(10.0, max(0.0, float(v)))
            return self.value

        def adjust_depth_strength(self, d):
            return self.set_depth_strength(self.value + d)

        def reset_depth_strength(self):
            return self.set_depth_strength(2.0)

    sink = MjpegSink(port=0, host="127.0.0.1")
    try:
        def get(path):
            conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
            conn.request("GET", path)
            r = conn.getresponse()
            body = r.read()
            conn.close()
            return r.status, json.loads(body)

        status, _ = get("/strength")
        assert status == 503  # no pipeline attached yet

        sink.mode_switcher = FakeProgram()
        status, body = get("/strength")
        assert status == 200 and body["depth_strength"] == 2.0
        status, body = get("/strength?delta=0.5")
        assert status == 200 and body["depth_strength"] == 2.5
        status, body = get("/strength?set=99")
        assert status == 200 and body["depth_strength"] == 10.0
        status, body = get("/strength?reset=1")
        assert status == 200 and body["depth_strength"] == 2.0
        status, body = get("/strength?set=bogus")
        assert status == 400 and "error" in body
        # arbitrary floats snap to the 0.5 key grid: every distinct value
        # is a separately-compiled program variant kept for the session
        status, body = get("/strength?set=2.47")
        assert status == 200 and body["depth_strength"] == 2.5
        status, body = get("/strength?delta=0.3")
        assert status == 200 and body["depth_strength"] == 3.0
        status, body = get("/strength?delta=0.2")  # rounds to a zero step
        assert status == 200 and body["depth_strength"] == 3.0
    finally:
        sink.close()


def test_null_sink():
    s = NullSink()
    s.push(np.zeros((4, 4, 3), np.uint8), None, {})
    assert s.frames == 1 and s.last_shape == (4, 4, 3)


def test_rtmp_sink_mediamtx_sidecar(tmp_path):
    """serve=True spawns the media-server sidecar when the binary exists and
    shutdown() reaps it; ffmpeg is faked so no real encode happens."""
    import os
    import stat
    import time as _time

    from desktop2stereo_tpu.sinks.rtmp import RtmpSink

    def fake_bin(name, body="#!/bin/sh\nsleep 30\n"):
        p = tmp_path / name
        p.write_text(body)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
        return str(p)

    ffmpeg = fake_bin("ffmpeg", "#!/bin/sh\ncat > /dev/null\n")
    mtx = fake_bin("mediamtx")
    sink = RtmpSink("rtmp://127.0.0.1/live/d2s", ffmpeg=ffmpeg,
                    serve=True, mediamtx=mtx)
    assert sink._server is not None and sink._server.poll() is None

    frame = np.zeros((16, 32, 3), np.uint8)
    sink.push(frame, None, {})
    assert sink._proc is not None
    # resolution change restarts the encoder (reference main.py:1018-1061)
    first = sink._proc
    sink.push(np.zeros((32, 32, 3), np.uint8), None, {})
    assert sink._proc is not first

    sink.shutdown()
    deadline = _time.time() + 3.0
    while sink._server is not None and _time.time() < deadline:
        _time.sleep(0.05)
    assert sink._server is None


def test_rtmp_sink_audio_args(tmp_path, monkeypatch):
    """Audio passthrough (reference records system audio into its RTMP
    pipeline, reference main.py:661-755): explicit device → pulse input +
    aac encode in the ffmpeg command; 'none' → video-only."""
    import stat

    from desktop2stereo_tpu.sinks import rtmp as R

    p = tmp_path / "ffmpeg"
    p.write_text("#!/bin/sh\ncat > /dev/null\n")
    p.chmod(p.stat().st_mode | stat.S_IEXEC)

    captured = {}
    real_popen = R.subprocess.Popen

    def spy(cmd, **kw):
        captured["cmd"] = cmd
        return real_popen(cmd if cmd[0] != str(p) else [str(p)], **kw)

    monkeypatch.setattr(R.subprocess, "Popen", spy)

    sink = R.RtmpSink("rtmp://127.0.0.1/live", ffmpeg=str(p),
                      audio="mysink.monitor")
    sink.push(np.zeros((16, 32, 3), np.uint8), None, {})
    cmd = captured["cmd"]
    assert ["-f", "pulse", "-i", "mysink.monitor"] == cmd[cmd.index("pulse") - 1: cmd.index("pulse") + 3]
    assert "aac" in cmd
    sink.shutdown()

    sink = R.RtmpSink("rtmp://127.0.0.1/live", ffmpeg=str(p), audio="none")
    sink.push(np.zeros((16, 32, 3), np.uint8), None, {})
    assert "pulse" not in captured["cmd"] and "aac" not in captured["cmd"]
    sink.shutdown()

    # the settings 'Audio Delay' knob: -itsoffset precedes the audio input
    # (reference main.py:522 'applies to next input'), absent without audio
    sink = R.RtmpSink("rtmp://127.0.0.1/live", ffmpeg=str(p),
                      audio="mysink.monitor", audio_delay=-0.15)
    sink.push(np.zeros((16, 32, 3), np.uint8), None, {})
    cmd = captured["cmd"]
    i = cmd.index("-itsoffset")
    assert cmd[i + 1] == "-0.15" and cmd[i + 2: i + 4] == ["-f", "pulse"]
    sink.shutdown()

    sink = R.RtmpSink("rtmp://127.0.0.1/live", ffmpeg=str(p), audio="none",
                      audio_delay=-0.15)
    sink.push(np.zeros((16, 32, 3), np.uint8), None, {})
    assert "-itsoffset" not in captured["cmd"]
    sink.shutdown()

    # auto mode never raises, whatever the host has
    assert R.detect_audio_source() is None or "-i" in R.detect_audio_source()


def test_rtmp_sink_serve_without_mediamtx(tmp_path):
    """serve=True degrades gracefully when no mediamtx binary exists."""
    import stat

    from desktop2stereo_tpu.sinks.rtmp import RtmpSink

    p = tmp_path / "ffmpeg"
    p.write_text("#!/bin/sh\ncat > /dev/null\n")
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    sink = RtmpSink("srt://127.0.0.1:8890", ffmpeg=str(p), serve=True,
                    mediamtx=None)
    assert sink._server is None
    sink.shutdown()


def test_mjpeg_stats_endpoint():
    """GET /stats: the title-bar readout as JSON (reference
    main.py:1233-1251) — fps, per-stage latency, frame/drop counts."""
    import json

    sink = MjpegSink(port=0, host="127.0.0.1")
    try:
        def get(path):
            conn = http.client.HTTPConnection("127.0.0.1", sink.port, timeout=5)
            conn.request("GET", path)
            r = conn.getresponse()
            body = r.read()
            conn.close()
            return r.status, json.loads(body)

        status, body = get("/stats")
        assert status == 200 and body == {}  # nothing pushed yet

        frame = np.zeros((16, 16, 3), np.uint8)
        stats = {"fps": 42.5, "fps_1pct_low": 30.0, "frame_ms": 23.5,
                 "latency": {"capture": 0.001, "compute": 0.012},
                 "frames": 100, "dropped": 7}
        sink.push(frame, None, stats)
        status, body = get("/stats")
        assert status == 200
        assert body["fps"] == 42.5 and body["dropped"] == 7
        assert body["latency"]["compute"] == 0.012
    finally:
        sink.close()
