"""pipeline/metrics.py: per-stage latency EMAs and rolling FPS/1%-low
(the reference's title-bar observability, reference main.py:1081-1094)."""

import numpy as np

from desktop2stereo_tpu.pipeline.metrics import FpsCounter, StageLatency


def test_stage_latency_ema_and_total():
    lat = StageLatency()
    lat.record("capture", 0.010)
    assert lat.snapshot() == {"capture": 0.010}  # first sample = value
    lat.record("capture", 0.020, ema_alpha=0.5)
    assert abs(lat.snapshot()["capture"] - 0.015) < 1e-9
    lat.record("model", 0.005)
    assert abs(lat.total() - 0.020) < 1e-9


def test_fps_counter_steady_rate():
    fps = FpsCounter(window=100)
    t = 100.0
    for _ in range(60):
        fps.tick(now=t)
        t += 1.0 / 60.0
    s = fps.stats()
    assert abs(s["fps"] - 60.0) < 0.5
    assert abs(s["frame_ms"] - 1000.0 / 60.0) < 0.2
    # steady rate: 1%-low equals the average
    assert abs(s["fps_1pct_low"] - 60.0) < 1.0


def test_fps_counter_one_percent_low_catches_hitches():
    fps = FpsCounter(window=300)
    t = 0.0
    rng = np.random.default_rng(0)
    for i in range(200):
        # 60 Hz with a 100 ms hitch every 50 frames
        t += 0.1 if i % 50 == 49 else 1.0 / 60.0
        fps.tick(now=t)
    s = fps.stats()
    assert s["fps"] > 40.0
    assert s["fps_1pct_low"] <= 11.0  # the hitch dominates the 1%-low


def test_fps_counter_degenerate():
    fps = FpsCounter()
    assert fps.stats()["fps"] == 0.0          # no ticks
    fps.tick(now=5.0)
    assert fps.stats()["fps"] == 0.0          # one tick
    fps.tick(now=5.0)                          # zero-delta pair ignored
    assert fps.stats()["fps"] == 0.0


def test_stage_latency_medians():
    from desktop2stereo_tpu.pipeline.metrics import StageLatency

    lat = StageLatency()
    for v in (0.030, 0.010, 0.020, 0.500, 0.015):  # one outlier
        lat.record("depth+compose", v)
    lat.record("sink", 0.001)
    med = lat.medians()
    assert med["depth+compose"] == 0.020  # odd count → middle sample
    assert med["sink"] == 0.001
    assert lat.counts() == {"depth+compose": 5, "sink": 1}
    # even count → mean of the middle pair
    lat.record("sink", 0.003)
    assert abs(lat.medians()["sink"] - 0.002) < 1e-12
    # the outlier still dominates the EMA-free last/mean views but NOT the
    # median — the property the e2e bench relies on
    assert med["depth+compose"] < sum((0.030, 0.010, 0.020, 0.500, 0.015)) / 5


def test_stage_latency_history_bounded():
    from desktop2stereo_tpu.pipeline.metrics import StageLatency

    lat = StageLatency(history=8)
    for i in range(100):
        lat.record("s", float(i))
    assert lat.counts()["s"] == 8
    assert lat.medians()["s"] == (95 + 96) / 2.0


def test_projected_pcie_fps_math():
    import bench

    # 83 FPS device rate, 4K BGRA up (33.2 MB) + 4K RGB down (24.9 MB)
    h2d = 2160 * 3840 * 4
    d2h = 2160 * 3840 * 3
    p = bench.project_pcie_fps(83.0, h2d, d2h)
    # serial floor on a FULL-DUPLEX link: up and down ride separate lane
    # directions, so the charged transfer is the slower direction alone
    duplex_s = max(h2d, d2h) / 16e9
    assert abs(p["projected_pcie_xfer_ms"] - duplex_s * 1000) < 0.01
    serial = 1.0 / (1.0 / 83.0 + duplex_s)
    assert abs(p["pipeline_fps_projected_pcie"] - serial) < 0.01
    # the half-duplex floor (r03-comparable) charges the sum
    halfd = 1.0 / (1.0 / 83.0 + (h2d + d2h) / 16e9)
    assert abs(p["pipeline_fps_projected_pcie_halfduplex"] - halfd) < 0.01
    assert p["pipeline_fps_projected_pcie_halfduplex"] < p[
        "pipeline_fps_projected_pcie"]
    # overlapped: compute-bound here (12 ms > 3.6 ms) → the device rate
    assert abs(p["pipeline_fps_projected_pcie_overlapped"] - 83.0) < 0.01
    assert p["projected_pcie_bytes_per_frame"] == h2d + d2h
    assert p["projected_pcie_h2d_bytes"] == h2d
    assert p["projected_pcie_d2h_bytes"] == d2h
    # transfer-bound regime: huge frames flip the overlapped bound
    p2 = bench.project_pcie_fps(1000.0, int(16e9), 0)
    assert abs(p2["pipeline_fps_projected_pcie_overlapped"] - 1.0) < 1e-6
