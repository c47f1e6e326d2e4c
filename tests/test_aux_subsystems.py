"""Aux subsystem tests: FPS overlay, letterbox crop detection, profiling
hooks, headless viewer facade, control service."""

import threading
import time
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.overlay import FpsOverlay, overlay_text, text_mask
from desktop2stereo_tpu.pipeline.crop import (
    FULL,
    CropController,
    apply_crop,
    crop_from_stats,
    crop_stats,
)
from desktop2stereo_tpu.pipeline.profiling import StageTimer


def test_fps_overlay_draws_green_text():
    rgb = jnp.zeros((240, 320, 3), jnp.float32)
    ov = FpsOverlay()
    out = np.asarray(ov(rgb, 59.9))
    # green pixels where glyphs are, nothing else
    assert (out[..., 1] > 0).any()
    assert (out[..., 0] == 0).all() and (out[..., 2] == 0).all()
    mask = text_mask("FPS: 59.9", 240, 320)
    np.testing.assert_array_equal((out[..., 1] > 0), mask > 0)


def _letterboxed(h=360, w=640, bar=50):
    rng = np.random.default_rng(0)
    img = np.zeros((h, w, 3), np.float32)
    img[bar:h - bar] = rng.uniform(40, 220, (h - 2 * bar, w, 3))
    return img


def test_crop_detects_letterbox():
    img = jnp.asarray(_letterboxed())
    stats = crop_stats(img)
    crop = crop_from_stats(np.asarray(stats), 640, 360)
    assert crop != FULL
    u0, v0, uw, vh = crop
    assert u0 == 0.0 and uw == 1.0           # no pillarbox
    assert 0.10 < v0 < 0.18                   # ~50/360 plus edge trim
    assert 0.64 < vh < 0.78


def test_crop_full_frame_stays_full():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(30, 220, (360, 640, 3)).astype(np.float32))
    crop = crop_from_stats(np.asarray(crop_stats(img)), 640, 360)
    assert crop == FULL


def test_crop_controller_hysteresis():
    ctrl = CropController(full_hits_reset=3, poll_every=1)
    boxed = jnp.asarray(_letterboxed())
    rng = np.random.default_rng(2)
    full = jnp.asarray(rng.uniform(30, 220, (360, 640, 3)).astype(np.float32))

    assert ctrl.update(boxed) != FULL
    # one or two full frames do NOT reset (reveal hysteresis)
    ctrl.update(full)
    assert ctrl.active
    ctrl.update(full)
    assert ctrl.active
    ctrl.update(full)
    assert not ctrl.active  # third consecutive full frame resets


def test_apply_crop_slices():
    img = jnp.zeros((100, 200, 3))
    out = apply_crop(img, (0.25, 0.1, 0.5, 0.8))
    assert out.shape == (80, 100, 3)


def test_stage_timer():
    t = StageTimer()
    with t.stage("model"):
        time.sleep(0.01)
    assert 0.005 < t.snapshot()["model"] < 0.5


def test_viewer_facade_and_control_service():
    from desktop2stereo_tpu.sinks.viewer import StereoWindow

    win = StereoWindow(port=0, show_fps=True)
    frame = jnp.full((120, 160, 3), 128.0, jnp.float32)
    win.push(np.asarray(frame, np.uint8), None, {"fps": 30.0})
    assert win.frame_count == 1
    win.close()

    from desktop2stereo_tpu.service import control

    server = control.serve(port=0, settings_path="/tmp/d2s_test_settings.yaml")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=5).read()
        assert b"Depth Model" in page
        status = urllib.request.urlopen(f"http://127.0.0.1:{port}/status", timeout=5).read()
        assert b"running" in status
    finally:
        server.shutdown()


def test_apply_crop_clamps_out_of_range_rects():
    """A manual rect outside [0,1] must clamp, not negative-index-wrap to
    the opposite edge of the frame."""
    import jax.numpy as jnp

    img = jnp.arange(20 * 30 * 3, dtype=jnp.float32).reshape(20, 30, 3)
    out = apply_crop(img, (-0.05, 0.0, 1.0, 1.0))
    # u0 clamps to 0 → full width, content starts at the TRUE left edge
    assert out.shape[1] == 30
    assert float(out[0, 0, 0]) == float(img[0, 0, 0])
    # overshooting rect clamps to the frame
    out2 = apply_crop(img, (0.5, 0.5, 0.9, 0.9))
    assert out2.shape[0] <= 10 and out2.shape[1] <= 15


def test_crop_detector_ignores_tiny_frames():
    """Frames below the reference's small-frame guard are never cropped."""
    import numpy as np

    from desktop2stereo_tpu.pipeline.crop import FULL, crop_from_stats

    stats = np.array([5.0, 5.0, 100.0, 0.5, 0.0, 0.0], np.float32)
    assert crop_from_stats(stats, 60, 48) == FULL


def test_control_panel_sanitizes_lang_param():
    """The user-controlled `lang` query value is echoed into HTML attributes
    and a redirect Location header — it must be normalized to en/zh first
    (reflected-XSS / header-injection guard)."""
    from desktop2stereo_tpu.service.control import _form_page
    from desktop2stereo_tpu.core.config import Settings

    evil = '"><script>alert(1)</script>'
    page = _form_page(Settings(), lang=evil).decode()
    assert "<script>alert" not in page
    assert 'action="/start?lang=en"' in page
    # zh still selects the Chinese strings
    assert "深度模型".encode() in _form_page(Settings(), lang="zh")


def test_control_panel_family_size_parsing():
    """Model dropdown parses family+size like the reference GUI
    (reference gui.py:376-414)."""
    from desktop2stereo_tpu.core.registry import MODEL_REGISTRY
    from desktop2stereo_tpu.service.control import (
        build_family_size_map, parse_model_name)

    assert parse_model_name("Depth-Anything-V2-Small") == (
        "Depth-Anything-V2", "Small")
    assert parse_model_name("DepthPro") == ("DepthPro", "")
    fams, sizes, full = build_family_size_map(sorted(MODEL_REGISTRY))
    assert "Depth-Anything-V2" in fams
    # sizes ordered Small < Base < Large, and full-name lookup round-trips
    for fam in fams:
        for size in sizes[fam]:
            assert full[(fam, size)] in MODEL_REGISTRY


def test_control_panel_enumerated_form_and_stats(tmp_path):
    """The form carries device/monitor/window enumeration, per-mode row
    visibility hooks, and the live-stats element; /status surfaces parsed
    worker stats (reference gui.py:376-470, 785-825 feature set)."""
    from desktop2stereo_tpu.core.config import Settings
    from desktop2stereo_tpu.service.control import (
        _form_page, worker_stats_from_log)

    html = _form_page(Settings(), "en").decode()
    for frag in ('id="family"', 'id="msize"', "row_monitor", "row_window",
                 "row_audio", "syncRows()", "refreshWindows", 'id="stats"',
                 'name="device"', 'name="convergence"', "temporal_smooth"):
        assert frag in html, frag
    assert "深度模型" in _form_page(Settings(), "zh").decode()

    log = tmp_path / "w.log"
    log.write_text("[d2s] fps=42.5 (1%low=40.1) dropped=3 capture=1.2ms, "
                   "depth+compose=9.0ms, sink=0.3ms\n")
    s = worker_stats_from_log(str(log))
    assert s["fps"] == 42.5 and s["fps_1pct_low"] == 40.1 and s["dropped"] == 3
    assert s["latency_ms"]["depth+compose"] == 9.0
    assert worker_stats_from_log(str(tmp_path / "missing.log")) == {}


def test_control_panel_windows_endpoint():
    """/windows returns a JSON list (empty on headless hosts) for the
    capture dropdown's refresh."""
    import json as _json
    import threading
    import urllib.request

    from desktop2stereo_tpu.service import control

    server = control.serve(port=0, settings_path="/tmp/d2s_t_settings.yaml")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/windows", timeout=5).read()
        assert isinstance(_json.loads(body), list)
        status = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/status", timeout=5).read())
        assert "stats" in status
    finally:
        server.shutdown()


def test_native_list_windows_binding():
    """The X11 window-enumeration binding degrades to [] on headless hosts
    instead of raising (native d2s_x11_list_windows)."""
    from desktop2stereo_tpu.sources.screen import list_windows

    names = list_windows()
    assert isinstance(names, list)
    assert all(isinstance(n, str) and n for n in names)


def test_control_panel_tcp_source_composes_port():
    """The panel's `tcp` source row composes `tcp:<ingest port>` for the
    worker CLI (sources/net.py remote-agent ingest; r05)."""
    from desktop2stereo_tpu.service import control

    server = control.serve(port=0,
                           settings_path="/tmp/d2s_test_settings2.yaml")
    port = server.server_address[1]

    calls = {}

    class FakeManager:
        def start(self, settings, source, sink, extra_args=None):
            calls["source"] = source
            calls["sink"] = sink

        def stop(self):
            pass

        def status(self):
            return {"running": False}

    server.manager = FakeManager()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5).read()
        assert b"<option>tcp</option>" in page and b"row_ingest" in page
        data = urllib.parse.urlencode({
            "source": "tcp", "ingest_port": "7901", "sink": "null",
            "model": "Depth-Anything-V2-Small"}).encode()
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/start", data=data), timeout=5)
        assert calls["source"] == "tcp:7901"
        # empty port falls back to the documented default
        data = urllib.parse.urlencode({
            "source": "tcp", "sink": "null",
            "model": "Depth-Anything-V2-Small"}).encode()
        urllib.request.urlopen(urllib.request.Request(
            f"http://{'127.0.0.1'}:{port}/start", data=data), timeout=5)
        assert calls["source"] == "tcp:7800"
    finally:
        server.shutdown()
