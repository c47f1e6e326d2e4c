"""DPT-BEiT parity vs HF transformers (DPTForDepthEstimation + BeitBackbone)
with tiny random configs — covers relative position bias (incl. table
interpolation for off-pretrain grids), keyless k projection, LayerScale."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.models.beit import BEIT_PRESETS, DPTBEiT
from desktop2stereo_tpu.models.convert_hf import convert_dpt_beit


NECK = (16, 32, 64, 64)
FUSION = 32


def build_torch_beit_dpt(torch, hidden, layers, heads, mlp, out_indices,
                         image_size=64, patch=16):
    from transformers import BeitConfig, DPTConfig, DPTForDepthEstimation

    backbone = BeitConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=mlp, image_size=image_size, patch_size=patch,
        use_relative_position_bias=True, use_absolute_position_embeddings=False,
        layer_scale_init_value=0.1,
        out_features=[f"stage{i + 1}" for i in out_indices],
        reshape_hidden_states=False,
    )
    cfg = DPTConfig(
        backbone_config=backbone, is_hybrid=False, readout_type="project",
        neck_hidden_sizes=list(NECK), fusion_hidden_size=FUSION,
    )
    model = DPTForDepthEstimation(cfg)
    model.eval()
    return model


class _TinySpec:
    name = "beit-tiny-test"
    variant = "vitb"
    patch_size = 16
    neck_channels = NECK
    fusion_channels = FUSION


def run_parity(torch, H, W, tol=3e-4):
    dims = (64, 4, 4, 128, (0, 1, 2, 3), 4)  # pretrain window 4 (64/16)
    BEIT_PRESETS[_TinySpec.name] = dims
    try:
        torch.manual_seed(0)
        tmodel = build_torch_beit_dpt(torch, *dims[:5])
        params = {"params": convert_dpt_beit(tmodel.state_dict(), _TinySpec)}
        jmodel = DPTBEiT.from_spec(_TinySpec)

        rng = np.random.default_rng(6)
        x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(
                pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2)
            ).predicted_depth.numpy()
        got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
        assert got.shape == want.shape, (got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-6)
        rel = np.abs(got - want).max() / scale
        assert rel < tol, f"rel err {rel:.2e}"
    finally:
        BEIT_PRESETS.pop(_TinySpec.name, None)


def test_dpt_beit_parity_pretrain_window(torch):
    run_parity(torch, 64, 64)


def test_dpt_beit_parity_offgrid_window(torch):
    """96x96 → 6x6 window vs 4x4 pretrain: exercises the MiDaS-v3.1
    relative-position-table interpolation."""
    run_parity(torch, 96, 96)


@pytest.mark.slow
def test_beit_stream_fns_precomputed_bias_parity():
    """first/step (bias carried as model state) ≡ the in-graph-bias apply —
    the per-shape precompute must not change numerics."""
    from desktop2stereo_tpu.models.beit import DPTBEiT
    from desktop2stereo_tpu.models.factory import build_bound

    bound, spec = build_bound("dpt-beit-base-384", init_size=64)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 96, 128, 3)),
                    jnp.float32)
    out1, state = bound.first(bound.params, x)
    out2, state2 = bound.step(bound.params, x, state)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)
    ref = DPTBEiT.from_spec(spec).apply(bound.params, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert len(state) == 12  # one bias per layer
