"""Int8 quantized inference (ops/quant.py + --quant int8 wiring).

The reference ships INT8/FP8 as TensorRT engine options (reference
depth.py:1049-1118); here the analog is int8 x int8 -> int32 MXU matmuls in
the ViT blocks.  Random-weight fidelity is the strongest check the
zero-egress environment allows: the quantized model must track the float
model closely, and the machinery (tree transform, module wiring, CLI flag)
must be exact.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.ops.quant import (
    QuantDense,
    dynamic_quantize,
    quantize_tree,
    quantize_weight,
)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.float32)
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.shape == (32,)
    deq = q.astype(jnp.float32) * scale[None, :]
    # symmetric per-channel: error bounded by half an LSB per channel
    err = np.abs(np.asarray(deq - w))
    assert err.max() <= float(np.asarray(scale).max()) * 0.5 + 1e-7


def test_dynamic_quantize_range():
    x = jnp.asarray([[-3.0, 0.0, 1.5]], jnp.float32)
    q, s = dynamic_quantize(x)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(q), [[-127, 0, 64]], atol=1)
    np.testing.assert_allclose(float(s) * 127.0, 3.0, rtol=1e-6)


def test_quant_dense_tracks_float_dense():
    import flax.linen as nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 50, 96)), jnp.float32)
    dense = nn.Dense(64)
    fparams = dense.init(jax.random.PRNGKey(0), x)
    want = dense.apply(fparams, x)

    qtree = quantize_tree({"backbone": {"fc1": fparams["params"]}}
                          )["backbone"]["fc1"]
    got = QuantDense(64).apply({"params": qtree}, x)
    denom = float(jnp.abs(want).max())
    rel = float(jnp.abs(got - want).max()) / denom
    assert rel < 0.02, f"int8 dense rel-err {rel:.4f}"


def test_quantize_tree_scopes_to_backbone():
    """Only qkv/proj/fc1/fc2/... UNDER the backbone subtree convert; a
    decoder Dense sharing the name 'proj' must stay float."""
    k = jnp.ones((8, 4), jnp.float32)
    tree = {
        "backbone": {"layer_0": {"attention": {
            "qkv": {"kernel": k, "bias": jnp.zeros(4)},
            "proj": {"kernel": k, "bias": jnp.zeros(4)}}}},
        "neck": {"proj": {"kernel": k, "bias": jnp.zeros(4)}},
        "head": {"fc1": {"kernel": k, "bias": jnp.zeros(4)}},
    }
    out = quantize_tree(tree)
    assert out["backbone"]["layer_0"]["attention"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert out["backbone"]["layer_0"]["attention"]["proj"]["kernel_q"].dtype == jnp.int8
    assert "kernel" in out["neck"]["proj"]          # untouched
    assert "kernel" in out["head"]["fc1"]           # untouched


def test_quantized_model_tracks_float_model():
    """Full DA ViT-S: int8 model output must correlate >0.99 with the f32
    model on random weights (the zero-egress stand-in for a real-weight
    quality check)."""
    from desktop2stereo_tpu.models.factory import build_model

    apply_f, params_f, spec = build_model("Depth-Anything-V2-Small",
                                          init_size=70, rng_seed=3)
    apply_q, params_q, _ = build_model("Depth-Anything-V2-Small",
                                       init_size=70, rng_seed=3, quant="int8")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 70, 70, 3)), jnp.float32)
    df = np.asarray(apply_f(params_f, x)).ravel()
    dq = np.asarray(apply_q(params_q, x)).ravel()
    corr = float(np.corrcoef(df, dq)[0, 1])
    assert corr > 0.99, f"int8 model corr {corr:.4f}"
    rel = np.abs(dq - df).max() / max(np.abs(df).max(), 1e-6)
    assert rel < 0.1, f"int8 model rel-err {rel:.3f}"


def test_quant_rejected_for_nested():
    # NESTED runs two aligned branches; quant stays unsupported there
    from desktop2stereo_tpu.models.factory import build_model

    with pytest.raises(NotImplementedError, match="NESTED"):
        build_model("DA3NESTED-GIANT-LARGE", quant="int8", init_size=56)


@pytest.mark.parametrize("name,size,tol", [
    ("InfiniDepth-Small", 64, 0.99),
    ("dpt-large", 64, 0.99),
    ("dpt-hybrid-midas", 64, 0.99),
    ("dpt-beit-base-384", 64, 0.99),
    ("zoedepth-nyu", 64, 0.95),  # metric-bins head amplifies small deltas
])
@pytest.mark.slow
def test_quantized_family_tracks_float(name, size, tol):
    """Every remaining family under --quant int8: the ViT trunk runs int8,
    stems/decoders/metric heads stay float; outputs track the f32 model."""
    from desktop2stereo_tpu.models.factory import build_model

    apply_f, params_f, _ = build_model(name, init_size=size, rng_seed=3)
    apply_q, params_q, _ = build_model(name, init_size=size, rng_seed=3,
                                       quant="int8")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, size, size, 3)), jnp.float32)
    df = np.asarray(apply_f(params_f, x)).ravel()
    dq = np.asarray(apply_q(params_q, x)).ravel()
    corr = float(np.corrcoef(df, dq)[0, 1])
    assert corr > tol, f"int8 {name} corr {corr:.4f}"


def test_cli_has_quant_flag():
    from desktop2stereo_tpu.cli import build_parser

    args = build_parser().parse_args(["--quant", "int8"])
    assert args.quant == "int8"


def test_quantize_tree_multiple_scopes():
    k = jnp.ones((8, 4), jnp.float32)
    leaf = lambda: {"kernel": jnp.ones((8, 4), jnp.float32),
                    "bias": jnp.zeros(4)}
    tree = {
        "patch_encoder": {"l0": {"qkv": leaf()}},
        "image_encoder": {"l0": {"fc1": leaf()}},
        "decoder": {"fc1": leaf()},
    }
    out = quantize_tree(tree, scope=("patch_encoder", "image_encoder"))
    assert out["patch_encoder"]["l0"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert out["image_encoder"]["l0"]["fc1"]["kernel_q"].dtype == jnp.int8
    assert "kernel" in out["decoder"]["fc1"]


@pytest.mark.slow
def test_quantized_vda_tracks_float_model():
    """VDA streaming family under --quant int8: the dinov2 trunk runs int8
    while the temporal head stays float; outputs must track the f32 model."""
    from desktop2stereo_tpu.models.factory import build_model

    apply_f, params_f, _ = build_model("Video-Depth-Anything-Small",
                                       init_size=56, rng_seed=3)
    apply_q, params_q, _ = build_model("Video-Depth-Anything-Small",
                                       init_size=56, rng_seed=3, quant="int8")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 56, 56, 3)), jnp.float32)
    df = np.asarray(apply_f(params_f, x)).ravel()
    dq = np.asarray(apply_q(params_q, x)).ravel()
    corr = float(np.corrcoef(df, dq)[0, 1])
    assert corr > 0.99, f"int8 VDA corr {corr:.4f}"


@pytest.mark.slow
def test_quantized_depthpro_towers():
    """DepthPro's TWO ViT towers quantize (patch_encoder + image_encoder);
    the fusion decoder stays float.  Tiny config keeps CPU time sane."""
    from desktop2stereo_tpu.models.depthpro import DepthPro
    import desktop2stereo_tpu.models.depthpro as dp
    import jax

    kw = dict(patch_px=32, vit_hidden=32, vit_layers=2, vit_heads=4,
              vit_mlp=64, vit_patch=8, fusion=16, scaled_dims=(32, 32, 16),
              hook_ids=(1, 0), hook_dims=(16, 16))
    fmodel = DepthPro(**kw)
    qmodel = DepthPro(**kw, quant=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 128, 128, 3)), jnp.float32)
    orig_pad = dp.MERGE_PAD
    dp.MERGE_PAD = 1
    try:
        params = jax.jit(fmodel.init)(jax.random.key(0), x)
        qparams = quantize_tree(params,
                                scope=("patch_encoder", "image_encoder"))
        qt = qparams["params"]
        assert qt["patch_encoder"]["layer_0"]["attention"]["qkv"][
            "kernel_q"].dtype == jnp.int8
        assert qt["image_encoder"]["layer_0"]["attention"]["qkv"][
            "kernel_q"].dtype == jnp.int8
        df = np.asarray(fmodel.apply(params, x)).ravel()
        dq = np.asarray(qmodel.apply(qparams, x)).ravel()
        corr = float(np.corrcoef(df, dq)[0, 1])
        assert corr > 0.98, f"int8 DepthPro corr {corr:.4f}"
    finally:
        dp.MERGE_PAD = orig_pad


@pytest.mark.slow
def test_quantized_da3_tracks_float_model():
    """DA3 family under --quant int8 (alt-attention/QK-norm/RoPE trunk)."""
    from desktop2stereo_tpu.models.factory import build_model

    apply_f, params_f, _ = build_model("DA3-SMALL", init_size=56, rng_seed=3)
    apply_q, params_q, _ = build_model("DA3-SMALL", init_size=56, rng_seed=3,
                                       quant="int8")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 56, 56, 3)), jnp.float32)
    df = np.asarray(apply_f(params_f, x)).ravel()
    dq = np.asarray(apply_q(params_q, x)).ravel()
    corr = float(np.corrcoef(df, dq)[0, 1])
    assert corr > 0.99, f"int8 DA3 corr {corr:.4f}"


def test_quantize_tree_swiglu_names():
    # DA3 ViT-G SwiGLU matmuls (w12/w3) quantize under the backbone scope
    leaf = lambda: {"kernel": jnp.ones((8, 4), jnp.float32),
                    "bias": jnp.zeros(4)}
    tree = {"backbone": {"l0": {"mlp": {"w12": leaf(), "w3": leaf()}}}}
    out = quantize_tree(tree)
    assert out["backbone"]["l0"]["mlp"]["w12"]["kernel_q"].dtype == jnp.int8
    assert out["backbone"]["l0"]["mlp"]["w3"]["kernel_q"].dtype == jnp.int8


# --- fused Pallas kernel (ops/pallas/quant_matmul.py), interpret mode ------

from desktop2stereo_tpu.ops.quant import xla_quant_dense as _xla_quant_dense


@pytest.mark.parametrize("M,K,F,with_bias,dtype", [
    (777, 256, 384, True, jnp.float32),    # odd token count (ViT-L @294x518)
    (64, 128, 512, False, jnp.float32),    # bias-free (BEiT key projection)
    (300, 256, 272, True, jnp.bfloat16),   # lane-unaligned F (SwiGLU align8)
    (9, 128, 128, True, jnp.float32),      # single partial row tile
    (300, 128, 1100, True, jnp.float32),   # nf=3 feature tiles, last partial
])
def test_quant_matmul_kernel_matches_xla(M, K, F, with_bias, dtype):
    from desktop2stereo_tpu.ops.pallas.quant_matmul import quant_dense_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, M, K)) * 0.5, dtype)
    w = jnp.asarray(rng.standard_normal((K, F)) * 0.05, jnp.float32)
    from desktop2stereo_tpu.ops.quant import quantize_weight
    wq, wscale = quantize_weight(w)
    bias = (jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
            if with_bias else None)

    got = np.asarray(quant_dense_matmul(x, wq, wscale, bias, interpret=True),
                     np.float32)
    want = np.asarray(_xla_quant_dense(x, wq, wscale, bias), np.float32)
    assert got.shape == want.shape
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < tol, f"kernel vs XLA rel-err {err:.2e}"


def test_quant_dense_module_kernel_dispatch_and_fallback():
    """FORCE_KERNEL toggles the module's path; on CPU the forced Pallas
    attempt fails Mosaic lowering and must fall back to the identical XLA
    result instead of raising."""
    from desktop2stereo_tpu.ops.pallas import quant_matmul as qm

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 128)), jnp.float32)
    mod = QuantDense(64)
    w = jnp.asarray(rng.standard_normal((128, 64)) * 0.05, jnp.float32)
    wq, wscale = quantize_weight(w)
    params = {"params": {"kernel_q": wq, "scale": wscale,
                         "bias": jnp.zeros((64,), jnp.float32)}}
    want = np.asarray(mod.apply(params, x))  # default dispatch (XLA on CPU)

    qm.FORCE_KERNEL = True
    try:
        forced = np.asarray(mod.apply(params, x))
    finally:
        qm.FORCE_KERNEL = None
    assert np.allclose(want, forced)


def test_quant_matmul_kernel_row_scale_mode():
    """`row_scale` overrides the in-kernel abs-max (the row-parallel TP
    path feeds full-K scales).  Supplying the scales the kernel would have
    computed itself must reproduce the default mode exactly; supplying
    DIFFERENT scales must match the XLA formulation run at those scales."""
    from desktop2stereo_tpu.ops.pallas.quant_matmul import quant_dense_matmul

    rng = np.random.default_rng(5)
    M, K, F = 96, 256, 384
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, F)) * 0.05, jnp.float32)
    wq, ws = quantize_weight(w)
    b = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)

    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    base = np.asarray(quant_dense_matmul(x, wq, ws, b, interpret=True))
    ext = np.asarray(quant_dense_matmul(x, wq, ws, b, row_scale=sx,
                                        interpret=True))
    # separately-compiled epilogues may differ by 1 ULP (XLA is free to
    # rewrite xf/(max/127) as xf*(127/max) in one of them) — the quantized
    # integers themselves are checked bit-exactly in the int32 test below
    noop_err = np.abs(base - ext).max() / max(np.abs(base).max(), 1e-6)
    assert noop_err < 1e-6, f"self-computed row_scale drifted {noop_err:.2e}"

    # doubled scales (a wider-K shard's abs-max would look like this)
    sx2 = sx * 2.0
    got = np.asarray(quant_dense_matmul(x, wq, ws, b, row_scale=sx2,
                                        interpret=True))
    xq = np.clip(np.round(np.asarray(x) / np.asarray(sx2)), -127, 127)
    acc = xq.astype(np.int32) @ np.asarray(wq, np.int32)
    want = (acc.astype(np.float32)
            * (np.asarray(sx2) * np.asarray(ws)[None, :])
            + np.asarray(b)[None, :])
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 1e-5, f"row_scale mode vs oracle rel-err {err:.2e}"


def test_quant_matmul_kernel_int32_accumulator_exact():
    """`out_dtype=int32` returns RAW accumulators (the row-parallel psum
    path, ops/quant.py tp_quant_dense): must be BIT-IDENTICAL to the
    integer dot of the quantized activations — integer math has no
    associativity slack to hide behind."""
    from desktop2stereo_tpu.ops.pallas.quant_matmul import quant_dense_matmul

    rng = np.random.default_rng(6)
    M, K, F = 64, 128, 256
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (K, F)), jnp.int8)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8) / 127.0
    acc = np.asarray(quant_dense_matmul(
        x, wq, jnp.ones((F,), jnp.float32), row_scale=sx,
        interpret=True, out_dtype=jnp.int32))
    assert acc.dtype == np.int32
    xq = np.clip(np.round(np.asarray(x) / np.asarray(sx)), -127, 127)
    want = xq.astype(np.int32) @ np.asarray(wq, np.int32)
    assert np.array_equal(acc, want), "raw int32 accumulators must be exact"


def test_quant_matmul_kernel_under_vmap():
    """--batched multi-stream vmaps every stage; the kernel must batch
    (pallas batching rule) with per-sample activation scales, matching the
    per-sample runs exactly."""
    from desktop2stereo_tpu.ops.pallas.quant_matmul import quant_dense_matmul

    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.standard_normal((3, 64, 128)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32)
    wq, ws = quantize_weight(w)
    b = jnp.asarray(rng.standard_normal(256), jnp.float32)

    out_v = jax.vmap(
        lambda x: quant_dense_matmul(x, wq, ws, b, interpret=True))(xs)
    per = jnp.stack([quant_dense_matmul(xs[i], wq, ws, b, interpret=True)
                     for i in range(3)])
    assert float(jnp.abs(out_v - per).max()) == 0.0


@pytest.mark.slow
def test_cli_end_to_end_int8(tmp_path):
    """`--quant int8` through the real CLI: synthetic frames → quantized
    DA-V2-S → PNG sink (the surface a user actually runs)."""
    from desktop2stereo_tpu.cli import run

    out = tmp_path / "out"
    rc = run(["--source", "synthetic", "--frames", "3", "--sink", "png",
              "--out", str(out), "--model", "Depth-Anything-V2-Small",
              "--quant", "int8", "--size", "252x448", "--depth-res", "126",
              "--stats-every", "999"])
    assert rc == 0
    pngs = sorted(p.name for p in out.glob("sbs_*.png"))
    assert pngs, "no SBS frames written"


def test_parallel_frame_apply_routes_quant_through_shard_map(monkeypatch):
    """Under the SPMD wrapper the fused kernel must NOT be dispatched as a
    bare pallas_call (opaque to GSPMD: TP-sharded weights would be gathered
    per layer) — it goes through tp_quant_dense's shard_map decomposition
    instead, with the XLA formulation for shapes that don't divide."""
    import desktop2stereo_tpu.ops.quant as quant
    from desktop2stereo_tpu.core.runtime import make_mesh
    from desktop2stereo_tpu.parallel.sharding import (
        parallel_frame_apply, shard_params)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    roles = []
    orig = quant.tp_quant_dense

    def spy(ctx, x, kq, s, b, role):
        roles.append(role)
        return orig(ctx, x, kq, s, b, role)

    monkeypatch.setattr(quant, "tp_quant_dense", spy)

    from desktop2stereo_tpu.models.factory import build_model
    apply_fn, params, _ = build_model("Depth-Anything-V2-Small",
                                      init_size=56, quant="int8")
    mesh = make_mesh(num_data=1, num_model=8)
    sharded = shard_params(params, mesh)
    run = parallel_frame_apply(apply_fn, mesh)
    pixels = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 56, 56, 3)),
        jnp.float32)
    out = np.asarray(run(sharded, pixels))
    # every QuantDense consulted the shard_map router, both Megatron roles
    assert "col" in roles and "row" in roles, roles
    assert np.isfinite(out).all()


def test_mosaic_probe_gates_dispatch_on_cpu():
    """On a backend that can't lower the kernel (CPU), probe() is False
    and default dispatch must stay on the XLA path without raising."""
    import desktop2stereo_tpu.ops.pallas.quant_matmul as qm

    prev = qm._PROBE_OK
    qm._PROBE_OK = None
    try:
        assert qm.probe() is False  # Mosaic can't lower on CPU
    finally:
        qm._PROBE_OK = prev


# --- property-based invariants (hypothesis) ---------------------------------

from hypothesis import given, settings as hsettings, strategies as st


@given(rows=st.integers(1, 40), cols=st.integers(1, 40),
       scale_pow=st.integers(-6, 6), seed=st.integers(0, 2**31 - 1))
@pytest.mark.slow
@hsettings(max_examples=30, deadline=None)
def test_quantize_weight_error_bound_property(rows, cols, scale_pow, seed):
    """Reconstruction error ≤ half an LSB per channel at ANY magnitude."""
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((rows, cols)) * 10.0 ** scale_pow,
                    jnp.float32)
    q, scale = quantize_weight(w)
    deq = q.astype(jnp.float32) * scale[None, :]
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(scale)[None, :] * 0.5 + 1e-7
    assert (err <= bound).all()
    assert int(np.abs(np.asarray(q)).max()) <= 127


@given(rows=st.integers(1, 33), cols=st.integers(1, 65),
       seed=st.integers(0, 2**31 - 1))
@hsettings(max_examples=30, deadline=None)
def test_dynamic_quantize_rows_property(rows, cols, seed):
    """Per-row: |q| ≤ 127, scales positive, reconstruction ≤ 0.5 LSB/row,
    and an all-zero row yields zeros (clamped scale, no NaN)."""
    from desktop2stereo_tpu.ops.quant import dynamic_quantize_rows

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    x[0] = 0.0  # force a degenerate row
    q, s = dynamic_quantize_rows(jnp.asarray(x))
    q, s = np.asarray(q), np.asarray(s)
    assert s.shape == (rows, 1) and (s > 0).all()
    assert np.abs(q).max() <= 127
    assert (q[0] == 0).all()
    err = np.abs(q.astype(np.float32) * s - x)
    assert (err <= s * 0.5 + 1e-7).all()
