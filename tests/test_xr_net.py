"""XR frame-server network transport tests (loopback)."""

import numpy as np
import pytest

from desktop2stereo_tpu.xr.frame_server import FrameServer
from desktop2stereo_tpu.xr.net import FrameNetClient, FrameNetServer


@pytest.fixture()
def served():
    fs = FrameServer()
    srv = FrameNetServer(fs, host="127.0.0.1", port=0).start()
    yield fs, srv
    srv.close()


def test_raw_roundtrip_with_depth(served):
    fs, srv = served
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (48, 64, 3), np.uint8)
    depth = rng.random((48, 64)).astype(np.float32)
    fs.update_frame(rgb, depth)

    c = FrameNetClient(port=srv.port, encoding="raw")
    pkt = c.poll(timeout=2.0)
    assert pkt is not None
    np.testing.assert_array_equal(pkt.rgb, rgb)
    np.testing.assert_allclose(pkt.depth, depth, atol=1.0 / 65535)

    # nothing newer → None, and last_seen stays
    assert c.poll(timeout=0.05) is None
    fs.update_frame(rgb // 2, None)
    pkt2 = c.poll(timeout=2.0)
    assert pkt2 is not None and pkt2.seq == pkt.seq + 1
    assert pkt2.depth is None
    c.close()


def test_depth_rides_at_its_own_resolution(served):
    """SBS rgb + model-res depth: the header must carry the depth map's own
    dims (dh/dw) — depth is usually NOT at the composite frame's size."""
    fs, srv = served
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (48, 128, 3), np.uint8)   # SBS: double width
    depth = rng.random((24, 32)).astype(np.float32)      # model res
    fs.update_frame(rgb, depth)

    c = FrameNetClient(port=srv.port, encoding="raw")
    pkt = c.poll(timeout=2.0)
    assert pkt is not None and pkt.rgb.shape == (48, 128, 3)
    assert pkt.depth.shape == (24, 32)
    np.testing.assert_allclose(pkt.depth, depth, atol=1.0 / 65535)
    c.close()


def test_jpeg_encoding_roundtrip(served):
    fs, srv = served
    rgb = np.full((32, 48, 3), 128, np.uint8)
    rgb[:16] = [255, 0, 0]
    fs.update_frame(rgb, None)

    c = FrameNetClient(port=srv.port, encoding="jpeg")
    pkt = c.poll(timeout=2.0)
    assert pkt is not None and pkt.rgb.shape == (32, 48, 3)
    # lossy but close
    assert abs(int(pkt.rgb[:16, :, 0].astype(int).mean()) - 255) < 20
    assert abs(int(pkt.rgb[20:, :, 1].astype(int).mean()) - 128) < 20
    c.close()


def test_latest_wins_across_slow_client(served):
    fs, srv = served
    c = FrameNetClient(port=srv.port, encoding="raw")
    for i in range(5):
        fs.update_frame(np.full((8, 8, 3), i * 40, np.uint8), None)
    pkt = c.poll(timeout=2.0)
    # client jumped straight to the newest frame
    assert pkt.rgb[0, 0, 0] == 160
    assert pkt.seq == 5
    c.close()


def test_encode_rgb_reports_actual_encoding():
    """The header must carry the encoding actually used: a failed/ skipped
    jpeg encode shipping raw bytes under a 'jpeg' label crashes the client."""
    from desktop2stereo_tpu.xr.net import _encode_rgb

    rgb = np.zeros((8, 8, 3), np.uint8)
    _, used = _encode_rgb(rgb, "raw")
    assert used == "raw"
    _, used = _encode_rgb(rgb, "jpeg")
    assert used == "jpeg"
    # non-uint8 frames are converted, not allowed to blow up imencode
    payload, used = _encode_rgb(rgb.astype(np.float32) + 300.0, "jpeg")
    assert used in ("jpeg", "raw") and payload


def test_frame_server_wakes_promptly_on_publish():
    """Lost-wakeup regression: a frame published while the consumer is
    waiting must end the wait immediately, not after the full timeout."""
    import threading
    import time

    fs = FrameServer()
    fs.update_frame(np.zeros((4, 4, 3), np.uint8))
    first = fs.latest()
    t = threading.Timer(0.05,
                        fs.update_frame, (np.ones((4, 4, 3), np.uint8),))
    t.start()
    t0 = time.monotonic()
    pkt = fs.latest(last_seen=first.seq, timeout=5.0)
    elapsed = time.monotonic() - t0
    assert pkt is not None and pkt.seq == first.seq + 1
    assert elapsed < 1.0, f"waited {elapsed:.2f}s for an already-arrived frame"


def test_meta_query_and_interleaving():
    """The session-config query returns the server's settings-derived meta
    and does not disturb the frame stream (a client asks once at connect,
    then polls)."""
    fs = FrameServer()
    meta = {"ipd": 0.07, "depth_strength": 3.0, "convergence": 0.0,
            "environment": "Cinema", "controller": "PICO"}
    srv = FrameNetServer(fs, host="127.0.0.1", port=0, meta=meta).start()
    try:
        c = FrameNetClient(port=srv.port, encoding="raw")
        assert c.meta() == meta
        rgb = np.full((8, 12, 3), 9, np.uint8)
        fs.update_frame(rgb, None)
        pkt = c.poll(timeout=2.0)
        assert pkt is not None
        np.testing.assert_array_equal(pkt.rgb, rgb)
        assert c.meta() == meta  # works mid-stream too
        c.close()

        # a server with no meta answers with an empty dict
        c2 = FrameNetClient(port=srv.port, encoding="raw")
        srv.meta.clear()
        assert c2.meta() == {}
        c2.close()
    finally:
        srv.close()


def test_client_adopts_server_meta():
    from desktop2stereo_tpu.tools.xr_client import adopt_server_meta, build_parser

    args = build_parser().parse_args([])
    adopt_server_meta(args, {"ipd": 0.07, "depth_strength": 3.5})
    assert args.ipd == 0.07 and args.depth_strength == 3.5
    assert args.convergence == 0.01  # absent from meta → built-in default

    args = build_parser().parse_args(["--ipd", "0.05"])
    adopt_server_meta(args, {"ipd": 0.07})
    assert args.ipd == 0.05  # explicit flag beats the server
