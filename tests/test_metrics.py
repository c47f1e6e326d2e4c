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


def test_headline_rate_declares_chained_slope():
    """VERDICT r04 item 8: chained-slope is THE headline estimator
    whenever it exists; batch-median is a cross-check field, never a
    silent max."""
    import bench

    # slope available: headline comes from chained_ms even when the batch
    # rate is HIGHER (the old max-of-two would have flipped here)
    r = bench._headline_rate(120.0, {"chained_ms": 10.0})
    assert r["source"] == "chained_slope"
    assert abs(r["fps"] - 100.0) < 1e-9
    assert r["disagree"] is True          # 20% apart → flagged
    assert abs(r["disagreement_pct"] - 20.0) < 0.1

    # agreement within 10% is not flagged
    r2 = bench._headline_rate(95.0, {"chained_ms": 10.0})
    assert r2["source"] == "chained_slope" and r2["disagree"] is False

    # no slope → degrade to batch median with the source labeled
    r3 = bench._headline_rate(95.0, {"note": "skipped: budget"})
    assert r3["fps"] == 95.0 and "batch_median" in r3["source"]
    r4 = bench._headline_rate(95.0, {"error": "boom"})
    assert r4["fps"] == 95.0 and "batch_median" in r4["source"]


def test_bench_stage_validation():
    """ADVICE r04: a typo'd --stage must error, not silently run int8."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "bench.py", "--stage", "bf32", "--budget", "5"],
        capture_output=True, text=True, timeout=60,
        cwd=__file__.rsplit("/tests/", 1)[0])
    assert proc.returncode != 0
    assert "unknown --stage" in (proc.stderr + proc.stdout)


def test_bench_budget_clock():
    import time

    import bench

    old = bench._DEADLINE[0]
    try:
        bench._DEADLINE[0] = None
        assert bench._left() == float("inf")
        bench._DEADLINE[0] = time.time() + 30.0
        assert 29.0 < bench._left() <= 30.0
    finally:
        bench._DEADLINE[0] = old


def test_slope_ms_median_of_repeats():
    """ADVICE r04 (medium): repeats must aggregate by MEDIAN of positive
    slopes, not best-of (which biased the scored metric low-ms/high-FPS)."""
    from benchmarks import _timing

    calls = {"n": 0}
    # fabricate a fn/sync pair where run(n) durations produce slopes of
    # 2, 1, 6 ms across three repeats: median 2, best-of would say 1
    # slope_ms evaluates run(n2) BEFORE run(n1) in the difference
    durations = iter([0.0,            # warmup run(4)
                      0.112, 0.016,   # repeat 1: (112-16)/48 = 2.0 ms
                      0.064, 0.016,   # repeat 2: 1.0 ms
                      0.304, 0.016])  # repeat 3: 6.0 ms

    t = {"now": 0.0}

    def fake_perf_counter():
        return t["now"]

    class _FakeTime:
        perf_counter = staticmethod(fake_perf_counter)

    real_time, real_sync = _timing.time, _timing.sync
    try:
        _timing.time = _FakeTime()
        _timing.sync = lambda out: 0.0

        def fn():
            calls["n"] += 1
            return 0

        # every run(n) call advances the fake clock by the scripted amount
        orig_slope = _timing.slope_ms

        def instrumented(fn, n1, n2, repeats):
            # wrap fn so each sync boundary consumes one scripted duration
            return orig_slope(fn, n1=n1, n2=n2, warmup=4, repeats=repeats)

        # emulate by advancing clock inside sync: each run() starts at now
        # and we add the next scripted duration when sync fires
        def scripted_sync(out):
            t["now"] += next(durations)
            return 0.0

        _timing.sync = scripted_sync
        ms = instrumented(fn, n1=16, n2=64, repeats=3)
        assert abs(ms - 2.0) < 1e-6, ms
    finally:
        _timing.time = real_time
        _timing.sync = real_sync
