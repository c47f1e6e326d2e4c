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
