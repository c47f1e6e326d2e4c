"""Native host-runtime tests: shm frame ring, frame pacer, shm source.
Skip cleanly when no C++ toolchain is available."""

import threading
import time

import numpy as np
import pytest

native = pytest.importorskip("desktop2stereo_tpu.native")


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++ / native build unavailable")
    return lib


def test_ring_roundtrip(lib):
    ring = native.ShmFrameRing("/d2s_test_ring", max_bytes=64 * 64 * 4, slots=3)
    try:
        reader = native.ShmFrameRing("/d2s_test_ring", create=False)
        assert reader.read_latest() is None  # nothing yet

        frame = np.arange(64 * 64 * 4, dtype=np.uint8).reshape(64, 64, 4) % 251
        seq = ring.write(frame, timestamp_ns=1234)
        assert seq == 1
        got = reader.read_latest()
        assert got is not None
        out, ts = got
        np.testing.assert_array_equal(out, frame)
        assert ts == 1234

        # latest-wins: write 5, read once → newest only
        for i in range(5):
            ring.write(np.full((32, 32, 4), i, np.uint8))
        out2, _ = reader.read_latest()
        assert out2.shape == (32, 32, 4)
        assert (out2 == 4).all()
        assert reader.read_latest() is None  # drained

        with pytest.raises(ValueError):
            ring.write(np.zeros((128, 128, 4), np.uint8))  # over capacity
        reader.close()
    finally:
        ring.close()


def test_ring_cross_thread_stream(lib):
    ring = native.ShmFrameRing("/d2s_test_ring2", max_bytes=16 * 16 * 4, slots=4)
    try:
        stop = threading.Event()
        writes = [0]

        def producer():
            i = 0
            while not stop.is_set():
                ring.write(np.full((16, 16, 4), i % 250, np.uint8))
                writes[0] += 1
                i += 1

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        reader = native.ShmFrameRing("/d2s_test_ring2", create=False)
        reads, torn = 0, 0
        deadline = time.monotonic() + 1.0
        while time.monotonic() < deadline:
            got = reader.read_latest()
            if got is not None:
                frame, _ = got
                # seqlock guarantees untorn frames: all pixels identical
                assert (frame == frame[0, 0, 0]).all()
                reads += 1
        stop.set()
        t.join(1)
        reader.close()
        assert reads > 10 and writes[0] > reads  # latest-wins dropped some
    finally:
        ring.close()


def test_frame_pacer(lib):
    pacer = native.FramePacer(fps=200.0)
    t0 = time.perf_counter()
    for _ in range(20):
        pacer.wait()
    elapsed = time.perf_counter() - t0
    assert 0.08 < elapsed < 0.25  # 20 frames at 5 ms


def test_shm_source(lib):
    from desktop2stereo_tpu.sources.shm import ShmSource

    ring = native.ShmFrameRing("/d2s_test_src", max_bytes=8 * 8 * 4)
    try:
        ring.write(np.full((8, 8, 4), 7, np.uint8))
        src = ShmSource("/d2s_test_src", timeout=1.0, max_frames=2)
        frame = src.grab()
        assert frame is not None and (frame == 7).all()
        ring.write(np.full((8, 8, 4), 9, np.uint8))
        assert (src.grab() == 9).all()
        assert src.grab() is None  # max_frames
    finally:
        ring.close()


def test_capture_agent_main_streams_to_ring(lib, monkeypatch):
    """tools/capture_agent end to end with a faked screen: frames must
    land in the shm ring at the agent's declared shape."""
    import sys

    import desktop2stereo_tpu.tools.capture_agent as agent_mod

    class FakeScreen:
        def __init__(self, **kw):
            self.n = 0

        def grab(self):
            self.n += 1
            if self.n > 5:
                return None  # source ends → agent exits cleanly
            f = np.zeros((16, 24, 4), np.uint8)
            f[..., 0] = self.n
            return f

        def close(self):
            pass

    class KeepRing(native.ShmFrameRing):
        def close(self):  # agent teardown must not unlink before we read
            pass

    import desktop2stereo_tpu.sources.screen as screen_mod
    monkeypatch.setattr(screen_mod, "ScreenSource", FakeScreen)
    monkeypatch.setattr(native, "ShmFrameRing", KeepRing)
    monkeypatch.setattr(sys, "argv",
                        ["agent", "--ring", "/d2s_test_agent", "--fps", "500"])
    agent_mod.main()

    reader = KeepRing("/d2s_test_agent", create=False)
    try:
        got = reader.read_latest()
        assert got is not None
        frame, seq = got
        assert frame.shape == (16, 24, 4)
        assert frame[0, 0, 0] >= 2  # a post-probe frame made it through
    finally:
        import contextlib
        import os

        with contextlib.suppress(OSError):
            os.unlink("/dev/shm/d2s_test_agent")
