"""ZoeDepth parity vs HF transformers (single- and multi-config metric-bins
heads) with tiny random configs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.models.beit import BEIT_PRESETS
from desktop2stereo_tpu.models.zoedepth import ZOE_PRESETS, ZoeDepth
from desktop2stereo_tpu.models.convert_hf import convert_zoedepth

NECK = (16, 32, 64, 64)
FUSION = 32


def build_torch_zoe(torch, hidden, layers, heads, mlp, out_indices, multi,
                    image_size=64, patch=16):
    from transformers import BeitConfig, ZoeDepthConfig, ZoeDepthForDepthEstimation

    backbone = BeitConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=mlp, image_size=image_size, patch_size=patch,
        use_relative_position_bias=True, use_absolute_position_embeddings=False,
        layer_scale_init_value=0.1,
        out_features=[f"stage{i + 1}" for i in out_indices],
        reshape_hidden_states=False,
    )
    bins = [{"n_bins": 64, "min_depth": 1e-3, "max_depth": 10.0, "name": "nyu"}]
    kwargs = {}
    if multi:
        bins = [
            {"n_bins": 64, "min_depth": 1e-3, "max_depth": 10.0, "name": "nyu"},
            {"n_bins": 64, "min_depth": 1e-3, "max_depth": 80.0, "name": "kitti"},
        ]
        kwargs = dict(
            num_patch_transformer_layers=4, patch_transformer_hidden_size=128,
            patch_transformer_intermediate_size=1024,
            patch_transformer_num_attention_heads=4,
        )
    cfg = ZoeDepthConfig(
        backbone_config=backbone, readout_type="project",
        neck_hidden_sizes=list(NECK), fusion_hidden_size=FUSION,
        bin_configurations=bins, bin_centers_type="softplus",
        bottleneck_features=FUSION, **kwargs,
    )
    model = ZoeDepthForDepthEstimation(cfg)
    model.eval()
    return model


class _TinySpec:
    variant = "vitl"
    patch_size = 16
    neck_channels = NECK
    fusion_channels = FUSION


def run_parity(torch, multi, H=64, W=64, tol=5e-4):
    name = "zoe-tiny-multi" if multi else "zoe-tiny"
    dims = (64, 4, 4, 128, (0, 1, 2, 3), 4)
    BEIT_PRESETS[name] = dims
    configs = (
        [("nyu", 64, 1e-3, 10.0), ("kitti", 64, 1e-3, 80.0)] if multi
        else [("nyu", 64, 1e-3, 10.0)]
    )
    ZOE_PRESETS[name] = (configs, multi)
    _TinySpec.name = name
    try:
        torch.manual_seed(0)
        tmodel = build_torch_zoe(torch, *dims[:5], multi)
        params = {"params": convert_zoedepth(tmodel.state_dict(), _TinySpec)}
        jmodel = ZoeDepth.from_spec(_TinySpec)

        rng = np.random.default_rng(8)
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
        BEIT_PRESETS.pop(name, None)
        ZOE_PRESETS.pop(name, None)


def test_zoedepth_single_head_parity(torch):
    run_parity(torch, multi=False)


@pytest.mark.slow
def test_zoedepth_multi_head_parity(torch):
    run_parity(torch, multi=True)
