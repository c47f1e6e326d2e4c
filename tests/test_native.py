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
