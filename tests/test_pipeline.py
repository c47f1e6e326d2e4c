"""Pipeline tests: jitted frame step, engine with latest-wins mailboxes,
EMA state carry, shape specialization."""

import threading
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.config import Settings
from desktop2stereo_tpu.pipeline.engine import FrameEngine, Mailbox
from desktop2stereo_tpu.pipeline.programs import (
    ProgramCache,
    ProgramConfig,
    build_frame_step,
    init_state,
)
from desktop2stereo_tpu.sinks.null import NullSink
from desktop2stereo_tpu.sources.synthetic import SyntheticSource


class FakeStatefulModel:
    """Streaming-model stand-in: depth = gradient + a counter carried in
    state (so outputs prove the carry threads through the program)."""

    @staticmethod
    def first(pixels):
        depth = fake_model_apply(pixels)
        return depth, jnp.zeros((), jnp.float32)

    @staticmethod
    def step(pixels, counter):
        depth = fake_model_apply(pixels) + counter * 0.001
        return depth, counter + 1.0


def test_stateful_model_carry_threads_through_program():
    from desktop2stereo_tpu.pipeline.programs import ProgramCache

    cfg = make_cfg(temporal_smooth=False)
    program = ProgramCache(cfg, FakeStatefulModel(), compute_dtype=jnp.float32)
    frame = jnp.zeros((64, 96, 4), jnp.uint8)
    program(frame)  # first: builds carry
    program(frame)  # step: counter 0 → 1
    program(frame)  # step: counter 1 → 2
    key = next(iter(program._states))
    assert float(program._states[key].model) == 2.0


def fake_model_apply(pixels: jax.Array) -> jax.Array:
    """Stand-in depth net: luminance ramp (shape-correct, cheap)."""
    return (pixels[..., 0] * 0.3 + pixels[..., 1] * 0.6 + pixels[..., 2] * 0.1 + 1.0)


def make_cfg(**kw) -> ProgramConfig:
    base = dict(
        model_name="Depth-Anything-V2-Small",
        depth_resolution=98,
        output_height=72,
        display_mode="Half-SBS",
        ipd=0.064,
        depth_strength=2.0,
        convergence=0.0,
        foreground_scale=0.0,
        aa_strength=2.0,
        ema_alpha=0.9,
        temporal_smooth=True,
        quality="high",
    )
    base.update(kw)
    return ProgramConfig(**base)


def test_frame_step_shapes_and_state():
    cfg = make_cfg()
    step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    frame = np.random.default_rng(0).integers(0, 255, (144, 256, 4), dtype=np.uint8)
    state = init_state(72, 128)
    sbs, depth, state2 = step(jnp.asarray(frame), state)
    assert sbs.shape == (72, 128, 3) and sbs.dtype == jnp.uint8
    assert depth.shape == (72, 128)
    assert not np.isnan(np.asarray(state2.ema_depth)).any()


def test_frame_step_ema_behaviour():
    cfg = make_cfg(display_mode="Depth")
    step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    f1 = rng.integers(0, 255, (144, 256, 4), dtype=np.uint8)
    f2 = rng.integers(0, 255, (144, 256, 4), dtype=np.uint8)
    s0 = init_state(72, 128)
    _, d1, s1 = step(jnp.asarray(f1), s0)
    d1 = np.asarray(d1)
    # second frame must be EMA-blended: alpha*prev + (1-alpha)*cur
    step2 = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    _, d2_raw, _ = step2(jnp.asarray(f2), init_state(72, 128))  # unsmoothed f2
    _, d2, _ = step(jnp.asarray(f2), s1)
    expected = d1 + (1 - 0.9) * (np.asarray(d2_raw) - d1)
    assert np.abs(np.asarray(d2) - expected).max() < 1e-5


def test_program_cache_multiple_shapes():
    cfg = make_cfg()
    cache = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    a = np.zeros((144, 256, 4), dtype=np.uint8)
    b = np.zeros((288, 512, 4), dtype=np.uint8)
    sbs_a, _ = cache(jnp.asarray(a))
    sbs_b, _ = cache(jnp.asarray(b))
    assert sbs_a.shape == (72, 128, 3)
    assert sbs_b.shape == (72, 128, 3)  # same output height policy
    cache.reset()


def test_mailbox_latest_wins():
    box = Mailbox()
    for i in range(5):
        box.put(i)
    item, seq = box.get(timeout=0.1)
    assert item == 4 and seq == 5
    item2, seq2 = box.get(timeout=0.05, last_seq=seq)
    assert item2 is None and seq2 == seq  # nothing newer


def test_engine_end_to_end_synthetic():
    cfg = make_cfg()
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    source = SyntheticSource(size=(144, 256), max_frames=30)
    sink = NullSink()
    program.warmup((144, 256, 4))  # compile outside the timed loop
    # paced capture so compute keeps up; latest-wins may still drop some
    engine = FrameEngine(source, program, sink, target_fps=60.0)
    stats = engine.run(duration=20.0)
    assert stats.frames >= 10
    assert sink.frames >= 1
    assert sink.last_shape == (72, 128, 3)
    assert "depth+compose" in stats.latency


def test_engine_slow_sink_receives_final_frame():
    """A finite run must not shut down between composing the last frame
    and the sink pushing it: with a sink slower than the source, run()
    waits for delivery (r05 review fix — `--frames N` nondeterministically
    emitted N-1 outputs before)."""
    import time as _time

    cfg = make_cfg()
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    program.warmup((144, 256, 4))

    class SlowRecordingSink:
        wants_depth = False

        def __init__(self):
            self.pushed = []

        def push(self, sbs, depth, stats):
            _time.sleep(0.06)             # slower than the 10 ms stop poll
            self.pushed.append(np.asarray(sbs).copy())

        def close(self):
            pass

    for _ in range(3):                    # the race was nondeterministic
        source = SyntheticSource(size=(144, 256), max_frames=4)
        sink = SlowRecordingSink()
        engine = FrameEngine(source, program, sink, target_fps=240.0)
        stats = engine.run(duration=20.0)
        # the LAST composed frame must always have been pushed (earlier
        # ones may legally drop to latest-wins under the slow sink)
        assert sink.pushed, "sink never received a frame"
        assert len(sink.pushed) >= 1
        assert engine._sink_seq >= engine.out_box._seq, (
            "engine stopped before the sink consumed the newest frame")


def test_program_cache_live_display_mode_switch():
    """set_display_mode re-targets a lazily-compiled variant at the next
    frame while carried state survives (the reference's viewer hot-keys,
    reference viewer.py:2304)."""
    cfg = make_cfg()
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    frame = np.zeros((72, 128, 4), np.uint8)

    sbs_a, _ = program(frame)
    h, w = np.asarray(sbs_a).shape[:2]

    program.set_display_mode("Full-SBS")
    sbs_b, _ = program(frame)
    hb, wb = np.asarray(sbs_b).shape[:2]
    assert wb == 2 * w and hb == h          # Full-SBS doubles the width
    assert program.cfg.display_mode == "Full-SBS"
    # EMA state survived the switch: the state key still holds an array
    assert program._states, "carried state was dropped on mode switch"

    # cycle returns to a known mode and bad names are rejected
    mode = program.cycle_display_mode()
    assert mode in __import__(
        "desktop2stereo_tpu.core.config", fromlist=["DISPLAY_MODES"]
    ).DISPLAY_MODES
    with pytest.raises(ValueError):
        program.set_display_mode("Nope")

    # switching back reuses the cached variant (no rebuild)
    program.set_display_mode(cfg.display_mode)
    sbs_c, _ = program(frame)
    assert np.asarray(sbs_c).shape == np.asarray(sbs_a).shape


def test_program_cache_live_depth_strength():
    """Live depth-strength stepping (the reference viewer's UP/DOWN/0 keys,
    reference viewer.py:2321-2329): clamped 0.5 steps, applied at the next
    frame, carried state survives, variants are cached for reuse."""
    cfg = make_cfg(depth_strength=2.0)
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    frame = np.asarray(
        np.random.default_rng(3).integers(0, 255, (72, 128, 4), np.uint8))

    sbs_a, _ = program(frame)
    assert program.depth_strength == 2.0

    assert program.adjust_depth_strength(+0.5) == 2.5
    sbs_b, _ = program(frame)
    assert program.cfg.depth_strength == 2.5
    assert program._states, "carried state was dropped on strength switch"
    assert not np.array_equal(np.asarray(sbs_a), np.asarray(sbs_b)), \
        "stronger disparity must change the stereo output"

    # clamps at both ends (reference clamps to [0, 10])
    assert program.set_depth_strength(99.0) == program.MAX_DEPTH_STRENGTH
    assert program.adjust_depth_strength(-999.0) == 0.0
    # reset returns to the configured value; the 2.0 variant is reused
    n_variants = len(program._variants)
    assert program.reset_depth_strength() == 2.0
    sbs_c, _ = program(frame)
    assert len(program._variants) == n_variants
    assert program.cfg.depth_strength == 2.0

    # mode and strength compose into one pending switch
    program.set_display_mode("Full-SBS")
    program.set_depth_strength(3.0)
    program(frame)
    assert program.cfg.display_mode == "Full-SBS"
    assert program.cfg.depth_strength == 3.0

    # edge feathering toggles live too (reference KEY_B) and darkens the
    # eye borders; mode/strength survive the toggle
    assert program.toggle_feather() is True
    sbs_f, _ = program(frame)
    assert program.cfg.edge_feather is True
    assert program.cfg.depth_strength == 3.0
    assert float(np.asarray(sbs_f)[0].sum()) <= float(
        np.asarray(program(frame)[0])[0].sum()) * 1.001  # smoke: no blowup
    assert program.toggle_feather() is False
    program(frame)
    assert program.cfg.edge_feather is False


def test_mailbox_counts_drops():
    box = Mailbox()
    for i in range(5):
        box.put(i)           # 4 overwritten unconsumed
    assert box.dropped == 4
    _item, seq = box.get(timeout=0.1)
    box.put(5)               # previous was consumed: no drop
    assert box.dropped == 4
    box.put(6)               # 5 never consumed: drop
    assert box.dropped == 5


def test_engine_dropped_stat_nonzero_when_source_outpaces_compute():
    """latest-wins drops are the design's central mechanism; the stat must
    reflect them (round-1 verdict: the counter was dead)."""
    class SlowProgram:
        def __call__(self, frame):
            time.sleep(0.03)
            f = np.asarray(frame)[..., :3]
            return f, f[..., 0].astype(np.float32)

    source = SyntheticSource(size=(32, 48), max_frames=40)
    engine = FrameEngine(source, SlowProgram(), NullSink(), target_fps=500.0)
    stats = engine.run(duration=10.0)
    assert stats.frames + stats.dropped >= 35   # nearly all accounted for
    assert stats.dropped > 0
    assert engine.stats()["dropped"] == stats.dropped


def test_engine_preload_processes_probe_frame():
    """A frame grabbed before start() (the CLI's shape probe) must be
    processed, not lost."""
    class Identity:
        def __call__(self, frame):
            f = np.asarray(frame)[..., :3]
            return f, f[..., 0].astype(np.float32)

    class EmptySource:
        def grab(self):
            return None     # exhausted immediately

        def close(self):
            pass

    sink = NullSink()
    engine = FrameEngine(EmptySource(), Identity(), sink, target_fps=0.0)
    engine.preload(np.zeros((16, 24, 4), np.uint8))
    stats = engine.run(duration=5.0)
    assert stats.frames == 1
    assert sink.frames == 1


def test_engine_propagates_stage_errors():
    class BadSource:
        def grab(self):
            raise RuntimeError("capture exploded")

        def close(self):
            pass

    cfg = make_cfg()
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    engine = FrameEngine(BadSource(), program, NullSink(), target_fps=0.0)
    engine.start()
    with pytest.raises(RuntimeError, match="capture exploded"):
        engine.join(timeout=5.0)


@pytest.mark.slow
def test_fused_halfsbs_structure_matches_generic(monkeypatch):
    """The TPU-only fused tail (planar preprocess + post+stereo in one
    program, u8 emitted by the kernel) must produce the same frames as the
    generic 4-program chain.  On CPU we force the fused structure and run
    the pair kernel in interpret mode."""
    import functools

    import desktop2stereo_tpu.ops.pallas.dibr as dibr
    import desktop2stereo_tpu.pipeline.programs as P

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: True)
    monkeypatch.setattr(
        dibr, "dibr_render_pair_planar",
        functools.partial(dibr.dibr_render_pair_planar, interpret=True),
    )

    cfg = make_cfg(display_mode="Half-SBS")
    frame = jnp.asarray(
        np.random.default_rng(7).integers(0, 255, (64, 96, 4), np.uint8))

    fused_step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    assert len(fused_step.stages) == 2, "fused structure not active"
    state = init_state(64, 96)
    sbs_f, depth_f, _ = fused_step(frame, state)

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: False)
    generic_step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    assert len(generic_step.stages) == 3
    sbs_g, depth_g, _ = generic_step(frame, init_state(64, 96))

    np.testing.assert_allclose(np.asarray(depth_f), np.asarray(depth_g),
                               atol=1e-5, rtol=1e-5)
    # The fused tail renders each eye at OUTPUT (half) width from a
    # pair-mean-squeezed source (the reference viewer's per-eye-viewport
    # semantics); the generic chain warps full-width and squeezes after.
    # Check the fused output against its own jnp formulation: squeeze →
    # per-eye jnp DIBR at half width → concat → quantize.
    from desktop2stereo_tpu.ops import stereo as S

    rgb_hwc = np.asarray(
        jnp.asarray(frame[..., [2, 1, 0]], jnp.float32))  # BGRA→RGB, no resize
    dep = np.asarray(depth_g)
    oh, ow = dep.shape
    half = ow // 2
    rgb_h = jnp.asarray(rgb_hwc.reshape(oh, half, 2, 3).mean(2), jnp.float32)
    dep_h = jnp.asarray(dep.reshape(oh, half, 2).mean(2), jnp.float32)
    left = S.dibr_render(rgb_h, dep_h, -cfg.ipd / 2, cfg.depth_strength,
                         cfg.convergence)
    right = S.dibr_render(rgb_h, dep_h, +cfg.ipd / 2, cfg.depth_strength,
                          cfg.convergence)
    want = np.clip(np.concatenate([np.asarray(left), np.asarray(right)],
                                  axis=1) + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(sbs_f).astype(np.int32),
                               want.astype(np.int32), atol=1)


@pytest.mark.slow
def test_fused_halftab_structure_matches_jnp(monkeypatch):
    """Half-TAB fused tail: each eye renders at output height (oh/2) from a
    row-pair-mean-squeezed source; check against the same formulation in
    jnp (squeeze → per-eye DIBR → vertical concat → quantize)."""
    import functools

    import desktop2stereo_tpu.ops.pallas.dibr as dibr
    import desktop2stereo_tpu.pipeline.programs as P
    from desktop2stereo_tpu.ops import stereo as S

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: True)
    monkeypatch.setattr(
        dibr, "dibr_render_pair_planar",
        functools.partial(dibr.dibr_render_pair_planar, interpret=True),
    )

    cfg = make_cfg(display_mode="Half-TAB")
    frame = jnp.asarray(
        np.random.default_rng(9).integers(0, 255, (64, 96, 4), np.uint8))

    fused_step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    assert len(fused_step.stages) == 2, "fused structure not active"
    sbs_f, depth_f, _ = fused_step(frame, init_state(64, 96))
    assert sbs_f.shape == (64, 96, 3) and sbs_f.dtype == jnp.uint8

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: False)
    generic_step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    _, depth_g, _ = generic_step(frame, init_state(64, 96))
    np.testing.assert_allclose(np.asarray(depth_f), np.asarray(depth_g),
                               atol=1e-5, rtol=1e-5)

    rgb_hwc = np.asarray(jnp.asarray(frame[..., [2, 1, 0]], jnp.float32))
    dep = np.asarray(depth_g)
    oh, ow = dep.shape
    eh = oh // 2
    rgb_h = jnp.asarray(rgb_hwc.reshape(eh, 2, ow, 3).mean(1), jnp.float32)
    dep_h = jnp.asarray(dep.reshape(eh, 2, ow).mean(1), jnp.float32)
    left = S.dibr_render(rgb_h, dep_h, -cfg.ipd / 2, cfg.depth_strength,
                         cfg.convergence)
    right = S.dibr_render(rgb_h, dep_h, +cfg.ipd / 2, cfg.depth_strength,
                          cfg.convergence)
    want = np.clip(np.concatenate([np.asarray(left), np.asarray(right)],
                                  axis=0) + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(sbs_f).astype(np.int32),
                               want.astype(np.int32), atol=1)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["Half-SBS", "Half-TAB"])
def test_fused_hwc_tail_at_lane_multiple_widths(mode, monkeypatch):
    """At lane-multiple eye widths the fused tail emits the final HWC u8
    layout from inside the kernel ('sbs_hwc_u8' / 'eyes_hwc_u8'); the
    frames must match the jnp formulation exactly like the generic-width
    path does.  Frame 64x128: Half-SBS eye width 64 (6·64 lane-aligned),
    Half-TAB eye width 128 (3·128 lane-aligned)."""
    import functools

    import desktop2stereo_tpu.ops.pallas.dibr as dibr
    import desktop2stereo_tpu.pipeline.programs as P
    from desktop2stereo_tpu.ops import stereo as S

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: True)
    monkeypatch.setattr(
        dibr, "dibr_render_pair_planar",
        functools.partial(dibr.dibr_render_pair_planar, interpret=True),
    )

    cfg = make_cfg(display_mode=mode)
    frame = jnp.asarray(
        np.random.default_rng(11).integers(0, 255, (64, 128, 4), np.uint8))
    fused_step = build_frame_step(cfg, fake_model_apply,
                                  compute_dtype=jnp.float32)
    assert len(fused_step.stages) == 2, "fused structure not active"
    sbs_f, depth_f, _ = fused_step(frame, init_state(64, 128))
    assert sbs_f.shape == (64, 128, 3) and sbs_f.dtype == jnp.uint8

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: False)
    generic_step = build_frame_step(cfg, fake_model_apply,
                                    compute_dtype=jnp.float32)
    _, depth_g, _ = generic_step(frame, init_state(64, 128))
    np.testing.assert_allclose(np.asarray(depth_f), np.asarray(depth_g),
                               atol=1e-5, rtol=1e-5)

    rgb_hwc = np.asarray(jnp.asarray(frame[..., [2, 1, 0]], jnp.float32))
    dep = np.asarray(depth_g)
    oh, ow = dep.shape
    if mode == "Half-SBS":
        half = ow // 2
        rgb_h = jnp.asarray(rgb_hwc.reshape(oh, half, 2, 3).mean(2), jnp.float32)
        dep_h = jnp.asarray(dep.reshape(oh, half, 2).mean(2), jnp.float32)
        axis = 1
    else:
        eh = oh // 2
        rgb_h = jnp.asarray(rgb_hwc.reshape(eh, 2, ow, 3).mean(1), jnp.float32)
        dep_h = jnp.asarray(dep.reshape(eh, 2, ow).mean(1), jnp.float32)
        axis = 0
    left = S.dibr_render(rgb_h, dep_h, -cfg.ipd / 2, cfg.depth_strength,
                         cfg.convergence)
    right = S.dibr_render(rgb_h, dep_h, +cfg.ipd / 2, cfg.depth_strength,
                          cfg.convergence)
    want = np.clip(np.concatenate([np.asarray(left), np.asarray(right)],
                                  axis=axis) + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(sbs_f).astype(np.int32),
                               want.astype(np.int32), atol=1)


@pytest.mark.parametrize("shape", [
    (3, 3), (1, 48), (48, 1), (17, 33),      # degenerate / odd
    (33, 17),                                 # odd portrait
    (720, 1280), (1080, 608),                 # landscape / tall portrait
])
def test_frame_step_degenerate_shapes(shape):
    """The full frame step must survive tiny/odd/portrait captures (shift
    saturation, patch-align floors, odd-width Half-SBS fallback) without
    NaNs or crashes."""
    h, w = shape
    cfg = make_cfg()
    step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    frame = jnp.asarray(
        np.random.default_rng(h * 100 + w).integers(0, 255, (h, w, 4), np.uint8))
    from desktop2stereo_tpu.ops.normalize import process_frame_size

    oh, ow = process_frame_size(h, w, cfg.output_height)
    sbs, depth, state = step(frame, init_state(oh, ow))
    sbs = np.asarray(sbs)
    depth = np.asarray(depth)
    assert sbs.dtype == np.uint8 and sbs.ndim == 3
    assert np.isfinite(depth).all()
    assert not np.isnan(np.asarray(state.ema_depth)).any()


def test_variant_setters_are_atomic_against_apply():
    """A setter racing _apply_pending must see either the old pending or
    the NEW cfg — never the stale cfg with pending already cleared (which
    silently reverted an in-flight mode switch)."""
    import threading

    cfg = make_cfg(depth_strength=2.0)
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    frame = np.zeros((72, 128, 4), np.uint8)
    program(frame)  # build the base variant

    in_apply = threading.Event()
    release = threading.Event()
    orig_build = program._build_steps

    def slow_build(c, share_from=None):
        in_apply.set()
        assert release.wait(10.0)
        return orig_build(c, share_from=share_from)

    program._build_steps = slow_build
    program.set_display_mode("Full-SBS")

    worker = threading.Thread(target=program, args=(frame,), daemon=True)
    worker.start()
    assert in_apply.wait(10.0)
    # mid-apply: a '+' press from the sink thread must block until the
    # swap lands and then build on TOP of the new mode
    got = {}

    def press():
        got["v"] = program.adjust_depth_strength(+0.5)

    presser = threading.Thread(target=press, daemon=True)
    presser.start()
    time.sleep(0.1)
    release.set()
    worker.join(30.0)
    presser.join(30.0)
    assert got["v"] == 2.5
    program._build_steps = orig_build
    program(frame)
    assert program.cfg.display_mode == "Full-SBS", \
        "concurrent strength press reverted the in-flight mode switch"
    assert program.cfg.depth_strength == 2.5


def test_program_fill_16_9_pads_device_side():
    """Settings.fill_16_9 reaches the device stereo stage: the composed
    output is each eye padded to 16:9 (reference Streamer main.py:1340),
    and the fused Half-SBS tail is bypassed for the generic one."""
    cfg = make_cfg(fill_16_9=True)
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    frame = np.zeros((72, 72, 4), np.uint8)  # square capture
    sbs, _ = program(frame)
    h, w = np.asarray(sbs).shape[:2]
    assert (w * 9) == (h * 16), f"not 16:9: {h}x{w}"


def test_warmup_returns_compile_report():
    """warmup() accounts per-program first-call seconds (the cold-compile
    budget is a user-visible regression axis; bench/CLI surface this)."""
    cfg = make_cfg()
    cache = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    rep = cache.warmup((144, 256, 4))
    assert rep and rep is cache.compile_report
    # staged split for the stateless fake model: pre + model + tail programs
    assert "pre_s" in rep and "model_s" in rep
    assert ("fused_tail_s" in rep) or ("post_s" in rep and "stereo_s" in rep)
    assert all(isinstance(v, float) and v >= 0 for v in rep.values())
    # warmup must still leave the cache stateless (reset) and callable
    assert not cache._states
    sbs, _ = cache(jnp.zeros((144, 256, 4), jnp.uint8))
    assert sbs.shape == (72, 128, 3)


def test_warmup_degrades_when_fused_tail_fails(monkeypatch):
    """A Pallas tail failure during warmup must NOT kill startup: warmup
    reports the error and the priming loop installs step()'s jnp fallback
    tail (the reference's engine->PyTorch downgrade analog)."""
    import desktop2stereo_tpu.ops.pallas.dibr as dibr
    import desktop2stereo_tpu.pipeline.programs as P

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: True)

    def boom(*a, **k):
        raise RuntimeError("mosaic lowering failed (simulated)")

    monkeypatch.setattr(dibr, "dibr_render_pair_planar", boom)

    cfg = make_cfg(display_mode="Half-SBS")
    cache = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    assert len(cache._step.stages) == 2, "fused structure not active"
    rep = cache.warmup((64, 96, 4))
    assert rep.get("fused_tail_error") is True
    # and the cache still serves frames through the fallback tail
    sbs, depth = cache(jnp.zeros((64, 96, 4), jnp.uint8))
    assert sbs.shape[-1] == 3 and depth.ndim == 2


def test_ema_carry_lives_at_model_res():
    """The EMA carry is the MODEL-res post-processed depth (the reference
    stabilizes before the resize-back, reference depth.py:1981-2004), and
    ema_shape() predicts its shape."""
    from desktop2stereo_tpu.pipeline.programs import ema_shape

    cfg = make_cfg()
    step = build_frame_step(cfg, fake_model_apply, compute_dtype=jnp.float32)
    frame = jnp.zeros((144, 256, 4), jnp.uint8)
    mh, mw = ema_shape(cfg, None, 144, 256)
    _, depth, state = step(frame, init_state(mh, mw))
    assert state.ema_depth.shape == (mh, mw)
    assert depth.shape == (72, 128)  # emitted depth still full-res by default
    # a mismatched carry shape resets instead of crashing (the reference's
    # DepthStabilizer shape-change reset, depth.py:1865-1894)
    _, depth2, state2 = step(frame, init_state(72, 128))
    assert state2.ema_depth.shape == (mh, mw)
    np.testing.assert_allclose(np.asarray(depth2), np.asarray(depth),
                               atol=1e-6)


def test_emit_depth_model_returns_model_res():
    """emit_depth='model' returns the model-res depth whose bilinear
    upsample IS the full-res map (zero information lost; what the XR sink
    ships)."""
    from desktop2stereo_tpu.ops.resize import resize as _resize

    frame = jnp.asarray(
        np.random.default_rng(3).integers(0, 255, (144, 256, 4), np.uint8))
    full_step = build_frame_step(make_cfg(), fake_model_apply,
                                 compute_dtype=jnp.float32)
    model_step = build_frame_step(make_cfg(emit_depth="model"),
                                  fake_model_apply,
                                  compute_dtype=jnp.float32)
    _, d_full, st = full_step(frame, init_state(72, 128))
    _, d_model, st2 = model_step(frame, init_state(72, 128))
    assert d_model.shape == st2.ema_depth.shape
    up = _resize(d_model[..., None], (72, 128), mode="bilinear")[..., 0]
    np.testing.assert_allclose(np.asarray(up), np.asarray(d_full),
                               atol=1e-5, rtol=1e-5)


class _RecordingSink:
    def __init__(self, wants_depth: bool):
        self.wants_depth = wants_depth
        self.depths = []

    def push(self, sbs_u8, depth, stats) -> None:
        self.depths.append(depth)

    def close(self) -> None:
        pass


@pytest.mark.parametrize("wants", [False, True])
def test_engine_sink_negotiated_depth(wants):
    """The engine fetches depth iff the sink consumes it — sinks that
    ignore depth must receive None (no d2h paid for it)."""
    cfg = make_cfg()
    program = ProgramCache(cfg, fake_model_apply, compute_dtype=jnp.float32)
    program.warmup((144, 256, 4))
    source = SyntheticSource(size=(144, 256), max_frames=6)
    sink = _RecordingSink(wants_depth=wants)
    engine = FrameEngine(source, program, sink, target_fps=0.0)
    engine.run(duration=30.0)
    assert sink.depths, "sink never received a frame"
    if wants:
        assert all(d is not None for d in sink.depths)
        assert all(isinstance(d, np.ndarray) for d in sink.depths)
    else:
        assert all(d is None for d in sink.depths)


def test_sink_wants_depth_declarations():
    """Depth consumers declare wants_depth; everyone else opts out (the
    engine skips a full extra frame of d2h per frame for them)."""
    from desktop2stereo_tpu.sinks.null import NullSink
    from desktop2stereo_tpu.sinks.png import PngSink
    from desktop2stereo_tpu.sinks.tee import TeeSink

    assert NullSink.wants_depth is False
    assert PngSink("/tmp/d2s_wd_test", save_depth=False).wants_depth is False
    assert PngSink("/tmp/d2s_wd_test", save_depth=True).wants_depth is True
    tee = TeeSink([NullSink(), PngSink("/tmp/d2s_wd_test", save_depth=True)])
    assert tee.wants_depth is True
    assert TeeSink([NullSink()]).wants_depth is False


def test_fused_tail_emit_model_matches_full(monkeypatch):
    """emit_depth='model' swaps the depth path to the composed
    upsample+pair-mean matmul (ops/resize.resize_halved) — the SBS pixels
    must match the emit='full' tail (same linear map, f32 rounding only).
    A smooth scene keeps warp gather boundaries stable under that rounding."""
    import functools

    import desktop2stereo_tpu.ops.pallas.dibr as dibr
    import desktop2stereo_tpu.pipeline.programs as P

    monkeypatch.setattr(P, "_stereo_on_tpu", lambda: True)
    monkeypatch.setattr(
        dibr, "dibr_render_pair_planar",
        functools.partial(dibr.dibr_render_pair_planar, interpret=True),
    )
    # smooth gradient scene (not noise): a 1e-6 depth drift must not flip
    # a gather cell, which on noise data would amplify to full color diffs
    yy, xx = np.mgrid[0:64, 0:96]
    frame = np.zeros((64, 96, 4), np.uint8)
    frame[..., 0] = (xx * 2) % 256
    frame[..., 1] = (yy * 3) % 256
    frame[..., 2] = 128

    full_step = build_frame_step(make_cfg(display_mode="Half-SBS"),
                                 fake_model_apply, compute_dtype=jnp.float32)
    model_step = build_frame_step(
        make_cfg(display_mode="Half-SBS", emit_depth="model"),
        fake_model_apply, compute_dtype=jnp.float32)
    f = jnp.asarray(frame)
    sbs_full, d_full, _ = full_step(f, init_state(64, 96))
    sbs_model, d_model, st = model_step(f, init_state(64, 96))
    assert d_model.shape == st.ema_depth.shape  # model-res depth emitted
    assert d_full.shape == (64, 96)
    np.testing.assert_allclose(np.asarray(sbs_model).astype(np.int32),
                               np.asarray(sbs_full).astype(np.int32), atol=1)
