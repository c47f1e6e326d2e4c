"""Multi-stream engine: N feeds through one compiled pipeline."""

import threading
import pytest

import numpy as np
import jax.numpy as jnp

from desktop2stereo_tpu.pipeline.multi import MultiStreamEngine
from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig


def make_cfg(**kw):
    base = dict(
        model_name="Depth-Anything-V2-Small",
        depth_resolution=98,
        output_height=64,
        display_mode="Half-SBS",
        ipd=0.064,
        depth_strength=1.0,
        convergence=0.0,
        foreground_scale=0.0,
        aa_strength=0.0,
        ema_alpha=0.9,
        temporal_smooth=True,
        quality="fast",
    )
    base.update(kw)
    return ProgramConfig(**base)


class ListSource:
    def __init__(self, frames):
        self._frames = list(frames)

    def grab(self):
        return self._frames.pop(0) if self._frames else None


class CollectSink:
    def __init__(self):
        self.frames = []
        self.stats = []

    def push(self, sbs, depth, stats):
        self.frames.append(np.asarray(sbs))
        self.stats.append(stats)


def fake_model(pixels):
    return pixels[..., 0] * 0.5 + 0.25


def test_two_streams_independent_state():
    rng = np.random.default_rng(0)
    bright = [np.full((64, 96, 4), 230, np.uint8) for _ in range(6)]
    dark = [np.full((64, 96, 4), 20, np.uint8) for _ in range(6)]

    program = ProgramCache(make_cfg(), fake_model, compute_dtype=jnp.float32)
    sinks = [CollectSink(), CollectSink()]
    eng = MultiStreamEngine(
        [ListSource(bright), ListSource(dark)], program, sinks,
        target_fps=200.0,
    )
    stats = eng.run(duration=20.0)

    assert sinks[0].frames and sinks[1].frames
    # per-stream state: (stream, oh, ow) keys for both streams
    streams_seen = {k[0] for k in program._states}
    assert streams_seen == {0, 1}
    # EMA carries differ between the bright and dark feeds
    s0 = program._states[(0, 64, 96)].ema_depth
    s1 = program._states[(1, 64, 96)].ema_depth
    assert abs(float(jnp.mean(s0)) - float(jnp.mean(s1))) > 0.1
    # outputs reflect their own feed (bright stream brighter)
    assert sinks[0].frames[-1].mean() > sinks[1].frames[-1].mean() + 50
    assert stats["stream0"]["frames"] > 0 and stats["stream1"]["frames"] > 0
    assert sinks[0].stats[-1]["stream"] == 0


def test_batched_engine_matches_sequential():
    """BatchedStreamEngine (one vmapped device batch per launch) must
    produce the same frames as the sequential engine for fresh inputs."""
    from desktop2stereo_tpu.pipeline.multi import BatchedStreamEngine
    from desktop2stereo_tpu.pipeline.programs import BatchedProgramCache

    rng = np.random.default_rng(1)
    feeds = [
        [rng.integers(0, 255, (48, 64, 4), np.uint8) for _ in range(4)]
        for _ in range(2)
    ]

    # sequential reference, frame by frame through ProgramCache.
    # temporal_smooth off so a latest-wins skip cannot diverge EMA history
    cfg = make_cfg(output_height=48, temporal_smooth=False)
    seq_prog = ProgramCache(cfg, fake_model, compute_dtype=jnp.float32)
    want = {0: [], 1: []}
    for i in range(4):
        for s in range(2):
            sbs, _ = seq_prog(jnp.asarray(feeds[s][i]), stream=s)
            want[s].append(np.asarray(sbs))

    prog = BatchedProgramCache(cfg, fake_model,
                               compute_dtype=jnp.float32, num_streams=2)
    sinks = [CollectSink(), CollectSink()]
    eng = BatchedStreamEngine(
        [ListSource([f.copy() for f in feeds[0]]),
         ListSource([f.copy() for f in feeds[1]])],
        prog, sinks, target_fps=30.0,
    )
    eng.run(duration=30.0)

    for s in range(2):
        assert sinks[s].frames, f"stream {s} produced nothing"
        # every delivered frame must be bit-identical to SOME sequential
        # frame of the same stream (latest-wins may skip, never invent)
        for got in sinks[s].frames:
            assert any(np.array_equal(got, w) for w in want[s]), \
                f"stream {s} frame matches no sequential output"


def test_batched_streaming_matches_per_stream():
    """Streaming (stateful) models batch by stacking their carries on the
    leading dim: S batched streams must equal S independent ProgramCaches
    frame for frame (each stream's rolling state stays its own)."""
    from desktop2stereo_tpu.pipeline.programs import (
        BatchedProgramCache, BoundModel)

    # toy streaming model: depth = luminance + 0.01*counter, counter per
    # batch row (exercises a REAL per-stream carry)
    def first(_p, x):
        counter = jnp.zeros((x.shape[0],), jnp.float32)
        return x[..., 0] * 0.004, counter

    def step(_p, x, counter):
        d = x[..., 0] * 0.004 + 0.01 * counter[:, None, None]
        return d, counter + 1.0

    bound = BoundModel(params=(), first=first, step=step, stateful=True)
    cfg = make_cfg()

    rng = np.random.default_rng(11)
    clips = [rng.integers(0, 255, (4, 48, 64, 4), np.uint8) for _ in range(2)]

    batched = BatchedProgramCache(cfg, bound, compute_dtype=jnp.float32,
                                  num_streams=2)
    singles = [ProgramCache(cfg, bound, compute_dtype=jnp.float32)
               for _ in range(2)]

    for t in range(4):
        frames = jnp.asarray(np.stack([clips[0][t], clips[1][t]]))
        sbs_b, dep_b = batched(frames)
        for s in range(2):
            sbs_s, dep_s = singles[s](jnp.asarray(clips[s][t]))
            np.testing.assert_allclose(np.asarray(dep_b[s]),
                                       np.asarray(dep_s), atol=1e-5)
            np.testing.assert_array_equal(np.asarray(sbs_b[s]),
                                          np.asarray(sbs_s))


def test_batched_survives_empty_stream():
    """A stream whose source never yields (empty video, dead producer) must
    not starve the live streams' batches."""
    from desktop2stereo_tpu.pipeline.multi import BatchedStreamEngine
    from desktop2stereo_tpu.pipeline.programs import BatchedProgramCache

    cfg = make_cfg(output_height=32, temporal_smooth=False)
    prog = BatchedProgramCache(cfg, fake_model, compute_dtype=jnp.float32,
                               num_streams=2)
    sinks = [CollectSink(), CollectSink()]
    frames = [np.zeros((32, 48, 4), np.uint8) for _ in range(3)]
    eng = BatchedStreamEngine(
        [ListSource(frames), ListSource([])], prog, sinks, target_fps=100.0)
    eng.run(duration=20.0)
    assert sinks[0].frames, "live stream starved by the empty one"
    assert not sinks[1].frames  # stand-ins never reach the dead stream's sink


def test_batched_rejects_mixed_shapes():
    from desktop2stereo_tpu.pipeline.multi import BatchedStreamEngine
    from desktop2stereo_tpu.pipeline.programs import BatchedProgramCache
    import pytest

    cfg = make_cfg(output_height=32, temporal_smooth=False)
    prog = BatchedProgramCache(cfg, fake_model, compute_dtype=jnp.float32,
                               num_streams=2)
    eng = BatchedStreamEngine(
        [ListSource([np.zeros((32, 48, 4), np.uint8)]),
         ListSource([np.zeros((40, 64, 4), np.uint8)])],
        prog, [CollectSink(), CollectSink()], target_fps=100.0)
    with pytest.raises(RuntimeError, match="uniform frame shapes"):
        eng.run(duration=15.0)


def test_exhausted_stream_pending_flushes_while_other_runs():
    """Stream A ends while stream B keeps the compute loop busy: A's final
    frame must still reach its sink promptly (round-2 review finding)."""
    class EndlessSource:
        def __init__(self):
            self.n = 0

        def grab(self):
            self.n += 1
            return np.full((32, 48, 4), self.n % 255, np.uint8)

    cfg = make_cfg(output_height=32, temporal_smooth=False)
    prog = ProgramCache(cfg, fake_model, compute_dtype=jnp.float32)
    sinks = [CollectSink(), CollectSink()]
    eng = MultiStreamEngine(
        [ListSource([np.zeros((32, 48, 4), np.uint8)]), EndlessSource()],
        prog, sinks, target_fps=200.0)
    eng.start()
    import time as _t

    t_end = _t.time() + 20
    while _t.time() < t_end and not sinks[0].frames:
        _t.sleep(0.05)
    eng.shutdown.set()
    for t in eng._threads:
        t.join(timeout=5.0)
    assert sinks[0].frames, "finite stream's last frame was withheld"


def test_stream_exhaustion_and_latest_wins():
    frames = [np.zeros((32, 64, 4), np.uint8) for _ in range(3)]
    program = ProgramCache(make_cfg(output_height=32), fake_model,
                           compute_dtype=jnp.float32)
    sink = CollectSink()
    eng = MultiStreamEngine([ListSource(frames)], program, [sink],
                            target_fps=500.0)
    eng.run(duration=20.0)
    # all sources exhausted → engine stops on its own; ≥1 frame delivered
    assert 1 <= len(sink.frames) <= 3
    assert eng.streams[0].done.is_set()


@pytest.mark.slow
def test_batched_real_vda_streams_are_independent():
    """Two batched VDA streams: stream A's rolling 31-frame cache must not
    see stream B's content (real temporal model, tiny config)."""
    import jax
    from desktop2stereo_tpu.models.vda import VideoDepthAnything, make_vda_fns
    from desktop2stereo_tpu.pipeline.programs import (
        BatchedProgramCache, BoundModel, ProgramCache)

    # channels ≥32: the temporal transformer's GroupNorm uses 32 groups
    model = VideoDepthAnything(
        hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
        out_layers=(0, 1, 2, 3), neck_channels=(32, 32, 32, 32),
        fusion_channels=32, patch_size=14)
    x0 = jnp.zeros((1, 28, 28, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, 1, None)
    _, first, step = make_vda_fns(model)
    bound = BoundModel(params=params, first=first, step=step, stateful=True)

    cfg = make_cfg(depth_resolution=28)
    rng = np.random.default_rng(5)
    clips = [rng.integers(0, 255, (3, 56, 56, 4), np.uint8) for _ in range(2)]

    batched = BatchedProgramCache(cfg, bound, compute_dtype=jnp.float32,
                                  num_streams=2)
    singles = [ProgramCache(cfg, bound, compute_dtype=jnp.float32)
               for _ in range(2)]
    for t in range(3):
        frames = jnp.asarray(np.stack([clips[0][t], clips[1][t]]))
        _sbs, dep_b = batched(frames)
        for s in range(2):
            _s, dep_s = singles[s](jnp.asarray(clips[s][t]))
            np.testing.assert_allclose(np.asarray(dep_b[s]), np.asarray(dep_s),
                                       atol=2e-4, rtol=2e-4)


def test_batched_stale_stream_freezes_model_carry():
    """A launch where stream B has no fresh frame (fresh=[True, False])
    must advance only stream A's model carry — B's rolling state must not
    absorb the re-submitted duplicate (review finding: a slow stream's
    temporal window would fill with copies)."""
    from desktop2stereo_tpu.pipeline.programs import (
        BatchedProgramCache, BoundModel)

    def first(_p, x):
        return x[..., 0] * 0.004, jnp.zeros((x.shape[0],), jnp.float32)

    def step(_p, x, counter):
        return x[..., 0] * 0.004, counter + 1.0

    bound = BoundModel(params=(), first=first, step=step, stateful=True)
    batched = BatchedProgramCache(make_cfg(), bound, compute_dtype=jnp.float32,
                                  num_streams=2)
    frames = jnp.zeros((2, 48, 64, 4), jnp.uint8)
    batched(frames)                              # first: counters [0, 0]
    batched(frames, fresh=np.array([True, False]))
    batched(frames, fresh=np.array([True, True]))
    key = next(iter(batched._states))
    counters = np.asarray(batched._states[key].model)
    np.testing.assert_array_equal(counters, [2.0, 1.0])


def test_batched_late_stream_does_not_starve_live_ones():
    """A stream whose source hasn't produced yet (remote agent still
    connecting) must not block the batch for stateless models: the live
    stream flows with a stand-in row, the late stream's sink stays silent
    until its own frames arrive (r05 review fix)."""
    import time as _time

    from desktop2stereo_tpu.pipeline.multi import BatchedStreamEngine
    from desktop2stereo_tpu.pipeline.programs import BatchedProgramCache

    rng = np.random.default_rng(5)
    frames0 = [rng.integers(0, 255, (48, 64, 4), np.uint8)
               for _ in range(8)]
    frame1 = rng.integers(0, 255, (48, 64, 4), np.uint8)

    class DelayedSource:
        def __init__(self, delay_s, frames):
            self._t0 = _time.monotonic()
            self.delay = delay_s
            self._frames = list(frames)

        def grab(self):
            if _time.monotonic() - self._t0 < self.delay:
                _time.sleep(0.02)
                return self.grab()
            return self._frames.pop(0) if self._frames else None

    class TimedSink(CollectSink):
        def __init__(self):
            super().__init__()
            self.first_push_t = None

        def push(self, sbs, depth, stats):
            if self.first_push_t is None:
                self.first_push_t = _time.monotonic()
            super().push(sbs, depth, stats)

    cfg = make_cfg(output_height=48, temporal_smooth=False)
    prog = BatchedProgramCache(cfg, fake_model,
                               compute_dtype=jnp.float32, num_streams=2)
    sinks = [TimedSink(), TimedSink()]
    t_start = _time.monotonic()
    eng = BatchedStreamEngine(
        [ListSource([f.copy() for f in frames0]),
         DelayedSource(1.2, [frame1])],
        prog, sinks, target_fps=30.0,
    )
    eng.run(duration=20.0)

    assert sinks[0].frames, "live stream starved by the late one"
    # the live stream's first delivery must NOT have waited for the late
    # stream's 1.2 s first frame
    assert sinks[0].first_push_t - t_start < 1.0, (
        f"first push at +{sinks[0].first_push_t - t_start:.2f}s")
    # the late stream eventually delivers its own (real) frame and never
    # received a stand-in
    assert sinks[1].frames, "late stream never delivered"
