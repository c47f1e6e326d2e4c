"""Multi-stream engine: N feeds through one compiled pipeline."""

import threading

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
