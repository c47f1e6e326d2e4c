"""First-class tests for the multi-chip mesh (parallel/sharding.py).

The reference has no cluster story (SURVEY §2.4); DP/TP over a
("data","model") mesh is the TPU build's mandate.  These tests run on the
conftest-provisioned virtual 8-device CPU mesh and assert:

- TP-sharded ViT forward == unsharded forward (GSPMD all-reduces are exact
  on CPU, rel-err bound 1e-5),
- DP batch semantics of parallel_frame_apply (per-sample independence),
- the divisibility guard falls back to replication instead of crashing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from desktop2stereo_tpu.core.runtime import DATA_AXIS, MODEL_AXIS, make_mesh
from desktop2stereo_tpu.models.factory import build_model
from desktop2stereo_tpu.parallel.sharding import (
    _tp_spec_for,
    parallel_frame_apply,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


@pytest.fixture(scope="module")
def small_model():
    apply_fn, params, spec = build_model("Depth-Anything-V2-Small", init_size=56)
    return apply_fn, params, spec


def _pix(batch, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return jnp.asarray(rng.standard_normal((batch, 56, 56, 3)), jnp.float32)


@pytest.mark.parametrize("name,size", [
    ("Depth-Anything-V2-Small", 56),     # fused qkv + fc1/fc2
    pytest.param("DA3-SMALL", 56,        # qkv + RoPE + DualDPT decoder
                 marks=pytest.mark.slow),
])
def test_tp_sharded_matches_unsharded(name, size):
    apply_fn, params, _ = build_model(name, init_size=size)
    mesh = make_mesh(num_data=1, num_model=8)

    pixels = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, size, size, 3)),
        jnp.float32)
    ref = np.asarray(apply_fn(params, pixels))

    sharded = shard_params(params, mesh)
    run = parallel_frame_apply(apply_fn, mesh)
    out = np.asarray(run(sharded, pixels))

    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_dp_batch_matches_per_sample(small_model):
    apply_fn, params, _ = small_model
    mesh = make_mesh(num_data=4, num_model=2)

    pixels = _pix(4, rng_seed=1)
    sharded = shard_params(params, mesh)
    run = parallel_frame_apply(apply_fn, mesh)
    batched = np.asarray(run(sharded, pixels))

    for i in range(4):
        single = np.asarray(apply_fn(params, pixels[i : i + 1]))[0]
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_tp_specs_cover_attention_and_mlp(small_model):
    _, params, _ = small_model
    hit = {"col": 0, "row": 0, "repl": 0}

    def visit(path, leaf):
        spec = _tp_spec_for(jax.tree_util.keystr(path), leaf.shape)
        if spec == P(None, MODEL_AXIS) or spec == P(MODEL_AXIS):
            hit["col"] += 1
        elif spec == P(MODEL_AXIS, None):
            hit["row"] += 1
        else:
            hit["repl"] += 1

    jax.tree_util.tree_map_with_path(visit, params)
    # every transformer block contributes column (qkv/fc1) and row (proj/fc2)
    assert hit["col"] > 0 and hit["row"] > 0, hit


def test_divisibility_guard_replicates():
    # a leaf whose sharded dim does not divide the 8-way model axis must be
    # replicated, not crash
    mesh = make_mesh(num_data=1, num_model=8)
    params = {"backbone": {
        "attention": {"qkv": {"kernel": jnp.ones((6, 18))}},  # 18 % 8 != 0
        "mlp": {"fc1": {"kernel": jnp.ones((6, 24))}},        # 24 % 8 == 0
    }}
    placed = shard_params(params, mesh)
    qkv = placed["backbone"]["attention"]["qkv"]["kernel"]
    fc1 = placed["backbone"]["mlp"]["fc1"]["kernel"]
    assert qkv.sharding.spec == P()  # fell back to replication
    assert fc1.sharding.spec == P(None, MODEL_AXIS)


def test_tp_rules_scoped_to_encoder():
    """A decoder Dense reusing an encoder name (e.g. a camera head's fc1)
    must replicate — sharding one matmul between replicated neighbors
    would buy a per-frame all-gather for nothing."""
    mesh = make_mesh(num_data=1, num_model=8)
    params = {
        "backbone": {"layer_0": {"mlp": {"fc1": {"kernel": jnp.ones((8, 32))}}}},
        "cam_dec": {"fc1": {"kernel": jnp.ones((8, 32))}},
    }
    placed = shard_params(params, mesh)
    enc = placed["backbone"]["layer_0"]["mlp"]["fc1"]["kernel"]
    dec = placed["cam_dec"]["fc1"]["kernel"]
    assert enc.sharding.spec == P(None, MODEL_AXIS)
    assert dec.sharding.spec == P()


def test_data_sharded_output_layout(small_model):
    apply_fn, params, _ = small_model
    mesh = make_mesh(num_data=8, num_model=1)
    sharded = shard_params(params, mesh)
    run = parallel_frame_apply(apply_fn, mesh)
    out = run(sharded, _pix(8))
    assert out.sharding.spec[0] == DATA_AXIS


@pytest.mark.slow
def test_tp_sharded_quantized_matches_unsharded():
    """int8 trees TP-shard too: QuantDense leaves (kernel_q/scale/bias)
    inherit the parent module's Megatron role, and the XLA int8 path is
    GSPMD-exact (the per-tensor activation scale is a global max, reduced
    across shards)."""
    apply_fn, params, _ = build_model("Depth-Anything-V2-Small",
                                      init_size=56, quant="int8")
    mesh = make_mesh(num_data=1, num_model=8)

    pixels = _pix(1, rng_seed=2)
    ref = np.asarray(apply_fn(params, pixels))

    sharded = shard_params(params, mesh)
    # col-parallel qkv: int8 kernel sharded on output features, scale along
    qkv = sharded["params"]["backbone"]["layer_0"]["attention"]["qkv"]
    assert qkv["kernel_q"].dtype == jnp.int8
    assert qkv["kernel_q"].sharding.spec == P(None, MODEL_AXIS)
    assert qkv["scale"].sharding.spec == P(MODEL_AXIS)

    run = parallel_frame_apply(apply_fn, mesh)
    out = np.asarray(run(sharded, pixels))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sp_sharded_matches_unsharded(small_model):
    """Sequence-parallel (token-sharded residual stream over the model
    axis, Megatron-SP via GSPMD) composed with TP must be numerically
    identical to the single-device apply."""
    apply_fn, params, _ = small_model
    mesh = make_mesh(num_data=2, num_model=4)

    pixels = _pix(2, rng_seed=3)
    ref = np.asarray(apply_fn(params, pixels))

    sharded = shard_params(params, mesh)
    run = parallel_frame_apply(apply_fn, mesh, sequence_parallel=True)
    out = np.asarray(run(sharded, pixels))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_sp_hook_is_noop_outside_parallel_apply(small_model):
    """token_constraint must not leak: a plain single-device apply after an
    SP trace sees no sharding constraint (the contextvar is reset)."""
    from desktop2stereo_tpu.parallel import sharding as sh

    apply_fn, params, _ = small_model
    mesh = make_mesh(num_data=1, num_model=8)
    run = parallel_frame_apply(apply_fn, mesh, sequence_parallel=True)
    run(shard_params(params, mesh), _pix(1))  # traces with the hook set
    assert sh.current_context() is None
    # and the plain path still works (would raise if a stale NamedSharding
    # from a dead mesh were applied)
    np.asarray(apply_fn(params, _pix(1)))


from desktop2stereo_tpu.parallel.introspect import count_prims as _count_prims


def test_flash_kernel_survives_tp_trace():
    """Under TP/SP the Pallas flash kernel must stay in the graph via a
    head-sharded shard_map (VERDICT r02: force-disabling it left the ViT-G
    path without its hot kernels) — and still match the unsharded output."""
    from desktop2stereo_tpu.ops import attention as attn

    apply_fn, params, _ = build_model("Depth-Anything-V2-Small", init_size=56)
    mesh = make_mesh(num_data=2, num_model=2)  # heads=6 divide by 2
    pixels = _pix(2, rng_seed=4)
    ref = np.asarray(apply_fn(params, pixels))
    sharded = shard_params(params, mesh)

    prev = attn.FORCE_FLASH
    attn.FORCE_FLASH = True  # CPU mesh → interpret-mode kernel
    try:
        run = parallel_frame_apply(apply_fn, mesh)
        out = np.asarray(run(sharded, pixels))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        closed = jax.make_jaxpr(lambda p, x: run(p, x))(sharded, pixels)
        assert _count_prims(closed.jaxpr, "pallas_call") >= 12  # one per layer
        assert _count_prims(closed.jaxpr, "shard_map") >= 12
    finally:
        attn.FORCE_FLASH = prev


@pytest.mark.slow
def test_kernels_survive_pure_dp_trace():
    """A pure-DP mesh (tp==1) is still a GSPMD trace: the flash and quant
    kernels must enter the graph through shard_map (a bare pallas_call is
    opaque to GSPMD and would gather/replicate its operands per layer) —
    and match the unsharded run."""
    from desktop2stereo_tpu.ops import attention as attn

    apply_fn, params, _ = build_model("Depth-Anything-V2-Small", init_size=56)
    mesh = make_mesh(num_data=4, num_model=1)
    pixels = _pix(4, rng_seed=11)
    ref = np.asarray(apply_fn(params, pixels))
    sharded = shard_params(params, mesh)

    prev = attn.FORCE_FLASH
    attn.FORCE_FLASH = True  # CPU mesh → interpret-mode kernel
    try:
        run = parallel_frame_apply(apply_fn, mesh)
        out = np.asarray(run(sharded, pixels))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        closed = jax.make_jaxpr(lambda p, x: run(p, x))(sharded, pixels)
        n_pallas = _count_prims(closed.jaxpr, "pallas_call")
        n_smap = _count_prims(closed.jaxpr, "shard_map")
        assert n_pallas >= 12, f"flash dropped from the DP graph ({n_pallas})"
        assert n_smap >= n_pallas, "kernels must be wrapped, not bare"
        # and every pallas_call sits INSIDE a shard_map body, none at the
        # top level where GSPMD would see an opaque custom call
        assert _count_prims_top_level(closed.jaxpr, "pallas_call") == 0
    finally:
        attn.FORCE_FLASH = prev


def _count_prims_top_level(jaxpr, name: str) -> int:
    """Count matching prims NOT nested under a shard_map (recursing through
    pjit/scan bodies but stopping at shard_map boundaries)."""
    n = 0
    for eqn in jaxpr.eqns:
        if name in eqn.primitive.name:
            n += 1
        if "shard_map" in eqn.primitive.name:
            continue
        for v in eqn.params.values():
            leaves = jax.tree_util.tree_leaves(
                v, is_leaf=lambda x: hasattr(x, "eqns") or hasattr(x, "jaxpr"))
            for j in leaves:
                if hasattr(j, "jaxpr"):
                    n += _count_prims_top_level(j.jaxpr, name)
                elif hasattr(j, "eqns"):
                    n += _count_prims_top_level(j, name)
    return n


@pytest.mark.slow
def test_quant_kernel_survives_pure_dp_trace():
    """Same guarantee for the fused int8 kernel under DP-only: QuantDense
    must route through tp_quant_dense's shard_map whenever ANY parallel
    context is live, bit-identical to the GSPMD XLA formulation."""
    import desktop2stereo_tpu.ops.quant as quant

    apply_fn, params, _ = build_model("Depth-Anything-V2-Small",
                                      init_size=56, quant="int8")
    mesh = make_mesh(num_data=4, num_model=1)
    pixels = _pix(4, rng_seed=12)
    sharded = shard_params(params, mesh)

    orig = quant.tp_quant_dense
    quant.tp_quant_dense = lambda *a, **k: None  # GSPMD-XLA-only baseline
    try:
        out_xla = np.asarray(
            parallel_frame_apply(apply_fn, mesh)(sharded, pixels))
    finally:
        quant.tp_quant_dense = orig

    run = parallel_frame_apply(apply_fn, mesh)
    out = np.asarray(run(sharded, pixels))
    np.testing.assert_array_equal(out, out_xla)
    closed = jax.make_jaxpr(lambda p, x: run(p, x))(sharded, pixels)
    assert _count_prims(closed.jaxpr, "pallas_call") >= 36
    assert _count_prims_top_level(closed.jaxpr, "pallas_call") == 0


@pytest.mark.slow
def test_quant_kernel_survives_tp_and_sp_trace():
    """The fused int8 kernel runs per-shard under TP (col: F split; row: K
    split with an exact int32 psum) and is BIT-IDENTICAL to the GSPMD XLA
    int8 formulation on the same mesh; SP composes on top.

    vs the UNSHARDED model the comparison is tolerance-based: any
    partitioned compilation reorders a few f32 reductions, which flips
    borderline int8 round() ties downstream (~1% of elements within ~1e-2)
    — inherent to dynamic int8, present in the plain GSPMD path too, and
    within BASELINE's 1e-2 depth budget."""
    import desktop2stereo_tpu.ops.quant as quant

    apply_fn, params, _ = build_model("Depth-Anything-V2-Small",
                                      init_size=56, quant="int8")
    mesh = make_mesh(num_data=2, num_model=2)
    pixels = _pix(2, rng_seed=5)
    ref = np.asarray(apply_fn(params, pixels))
    sharded = shard_params(params, mesh)

    orig = quant.tp_quant_dense
    quant.tp_quant_dense = lambda *a, **k: None  # GSPMD-XLA-only baseline
    try:
        out_xla = np.asarray(
            parallel_frame_apply(apply_fn, mesh)(sharded, pixels))
    finally:
        quant.tp_quant_dense = orig

    run = parallel_frame_apply(apply_fn, mesh)
    out = np.asarray(run(sharded, pixels))
    np.testing.assert_array_equal(out, out_xla)  # kernel == XLA, bit-exact
    err = np.abs(out - ref)
    assert err.max() < 2e-2 and err.mean() < 1e-3, (err.max(), err.mean())
    closed = jax.make_jaxpr(lambda p, x: run(p, x))(sharded, pixels)
    # qkv + fc1 (col) + fc2 (row) per layer stay Pallas; proj falls back
    # (K/tp not lane-aligned for ViT-S)
    assert _count_prims(closed.jaxpr, "pallas_call") >= 36

    run_sp = parallel_frame_apply(apply_fn, mesh, sequence_parallel=True)
    out_sp = np.asarray(run_sp(sharded, pixels))
    err_sp = np.abs(out_sp - ref)
    assert err_sp.max() < 2e-2 and err_sp.mean() < 1e-3, (
        err_sp.max(), err_sp.mean())


def test_tp_quant_dense_row_col_match_oracle():
    """tp_quant_dense col/row decompositions vs the xla_quant_dense oracle
    at lane-aligned shapes (row requires K/tp % 128 == 0)."""
    from desktop2stereo_tpu.ops.quant import (
        quantize_weight,
        tp_quant_dense,
        xla_quant_dense,
    )
    from desktop2stereo_tpu.parallel.sharding import ParallelContext

    mesh = make_mesh(num_data=2, num_model=2)
    ctx = ParallelContext(mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    wq, s = quantize_weight(w)
    b = jnp.asarray(rng.standard_normal((512,)), jnp.float32)
    ref = np.asarray(xla_quant_dense(x, wq, s, b))
    col = tp_quant_dense(ctx, x, wq, s, b, "col")
    np.testing.assert_allclose(np.asarray(col), ref, rtol=1e-5, atol=1e-4)

    x2 = jnp.asarray(rng.standard_normal((2, 16, 512)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
    wq2, s2 = quantize_weight(w2)
    b2 = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    ref2 = np.asarray(xla_quant_dense(x2, wq2, s2, b2))
    row = tp_quant_dense(ctx, x2, wq2, s2, b2, "row")
    np.testing.assert_allclose(np.asarray(row), ref2, rtol=1e-5, atol=1e-4)

    # K/tp = 96 not lane-aligned → declines (caller falls back to XLA)
    x3 = jnp.asarray(rng.standard_normal((2, 16, 192)), jnp.float32)
    w3q, s3 = quantize_weight(jnp.asarray(
        rng.standard_normal((192, 256)), jnp.float32))
    assert tp_quant_dense(ctx, x3, w3q, s3, None, "row") is None


def test_parallel_context_is_thread_scoped(small_model):
    """Two configurations traced from two threads concurrently must each
    see their own ParallelContext (the round-2 globals raced here): both
    HLOs must be correct, verified by output parity."""
    import threading

    apply_fn, params, _ = small_model
    mesh = make_mesh(num_data=2, num_model=2)
    pixels = _pix(2, rng_seed=6)
    ref = np.asarray(apply_fn(params, pixels))
    sharded = shard_params(params, mesh)

    results = {}

    def trace_and_run(tag, sp):
        run = parallel_frame_apply(apply_fn, mesh, sequence_parallel=sp)
        results[tag] = np.asarray(run(sharded, pixels))

    threads = [
        threading.Thread(target=trace_and_run, args=("tp", False)),
        threading.Thread(target=trace_and_run, args=("sp", True)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    np.testing.assert_allclose(results["tp"], ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(results["sp"], ref, rtol=1e-5, atol=1e-5)
