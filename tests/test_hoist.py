"""ops/hoist.py: big trace-time constants become runtime arguments.

Inline HLO constants upload through the embedding-grade device path
(~70x slower than device_put on the dev tunnel, measured) and bloat the
persistent-cache entries; HoistedJit keeps resize weight tables out of
the program body.  These tests pin correctness + the actual hoisting."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desktop2stereo_tpu.ops.hoist import HoistedJit, hjit, hoist_const


def test_hoist_const_is_asarray_outside_trace():
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    out = hoist_const(w)
    assert isinstance(out, jax.Array)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_hoisted_jit_matches_plain_jit():
    W = np.random.default_rng(0).standard_normal((64, 128)).astype(np.float32)

    def f(x):
        w = hoist_const(W)
        return x @ w.T, (x * 2.0).sum()

    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 128)),
                    jnp.float32)
    got = hjit(f)(x)
    want = jax.jit(f)(x)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(got[1]), float(want[1]), rtol=1e-6)


def test_hoisted_jit_actually_hoists():
    """The weight table must appear as a PARAMETER of the compiled program,
    not an inline constant: the jitted callable takes (args, consts) and the
    consts tuple holds the table."""
    W = np.random.default_rng(0).standard_normal((256, 512)).astype(np.float32)

    def f(x):
        return x @ hoist_const(W).T

    h = HoistedJit(f)
    x = jnp.ones((4, 512), jnp.float32)
    h(x)
    (jf, consts), = h._cache.values()
    assert len(consts) == 1 and consts[0].shape == (256, 512)
    # and the lowered module is small — no 512-KB literal inside
    hlo = jf.lower((x,), consts).as_text()
    assert len(hlo) < 200_000, f"HLO still carries inline constants: {len(hlo)}"


def test_hoisted_jit_shape_specializes():
    W1 = np.eye(8, dtype=np.float32)

    calls = []

    def f(x):
        calls.append(x.shape)
        return x @ hoist_const(np.eye(x.shape[-1], dtype=np.float32) + W1[:x.shape[-1], :x.shape[-1]] * 0)

    h = hjit(f)
    a = h(jnp.ones((2, 8), jnp.float32))
    b = h(jnp.ones((2, 8), jnp.float32))   # cached: no new trace
    c = h(jnp.ones((3, 8), jnp.float32))   # new signature: new entry
    assert a.shape == (2, 8) and b.shape == (2, 8) and c.shape == (3, 8)
    assert len(h._cache) == 2


def test_resize_under_hoisted_jit_matches_eager():
    """The real integration: ops.resize's weight matrices hoist, results
    bit-match the eager path."""
    from desktop2stereo_tpu.ops.resize import resize

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((40, 72, 3)), jnp.float32)

    def f(img):
        return resize(img, (96, 168), mode="bicubic", antialias=True)

    want = np.asarray(f(x))
    got = np.asarray(hjit(f)(x))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_program_stages_are_hoisted():
    """The frame program's preprocess stage must carry its resize weights as
    consts, not inline."""
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig

    cfg = ProgramConfig(
        model_name="Depth-Anything-V2-Small", depth_resolution=126,
        output_height=72, display_mode="Half-SBS", ipd=0.064,
        depth_strength=2.0, convergence=0.0, foreground_scale=0.0,
        aa_strength=1.0, ema_alpha=0.9, temporal_smooth=True, quality="high")

    def fake_model(x):
        return x.mean(axis=-1)[:, ::2, ::2]

    cache = ProgramCache(cfg, fake_model, compute_dtype=jnp.float32)
    sbs, _ = cache(jnp.zeros((144, 256, 4), jnp.uint8))
    pre = cache._step.stages[0]
    assert isinstance(pre, HoistedJit)
    (jf, consts), = pre._cache.values()
    assert consts, "preprocess collected no hoisted constants"
    assert any(c.size > 1000 for c in consts), "weight tables not hoisted"
