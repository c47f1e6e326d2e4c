"""DepthPro parity vs HF transformers with a tiny multi-scale config."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.models.depthpro import DepthPro
from desktop2stereo_tpu.models.convert_hf import convert_depthpro


def build_torch_depthpro(torch):
    from transformers import DepthProConfig, DepthProForDepthEstimation, Dinov2Config

    vit = dict(hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
               intermediate_size=64, image_size=32, patch_size=8)
    cfg = DepthProConfig(
        image_model_config=Dinov2Config(**vit), patch_model_config=Dinov2Config(**vit),
        fov_model_config=Dinov2Config(**vit),
        patch_size=32, fusion_hidden_size=16,
        scaled_images_ratios=[0.25, 0.5, 1],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[32, 32, 16],
        intermediate_hook_ids=[2, 1], intermediate_feature_dims=[16, 16],
        use_fov_model=False, merge_padding_value=1,
    )
    model = DepthProForDepthEstimation(cfg)
    model.eval()
    return model


def test_depthpro_parity(torch):
    torch.manual_seed(0)
    tmodel = build_torch_depthpro(torch)
    params = {"params": convert_depthpro(tmodel.state_dict(), None, num_layers=4)}
    import desktop2stereo_tpu.models.depthpro as dp

    jmodel = DepthPro(
        patch_px=32, vit_hidden=32, vit_layers=4, vit_heads=4, vit_mlp=128,
        vit_patch=8, fusion=16, scaled_dims=(32, 32, 16), hook_ids=(2, 1),
        hook_dims=(16, 16),
    )
    orig_pad = dp.MERGE_PAD
    dp.MERGE_PAD = 1
    try:
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(
                pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2)
            ).predicted_depth.numpy()
        got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
        assert got.shape == want.shape, (got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-6)
        rel = np.abs(got - want).max() / scale
        assert rel < 1e-3, f"rel err {rel:.2e}"
    finally:
        dp.MERGE_PAD = orig_pad


@pytest.mark.slow
def test_depthpro_nondivisible_tile_parity(torch):
    """The real DepthPro runs DINOv2/14 on 384px tiles (384 % 14 != 0): the
    HF conv patchify drops the sub-patch remainder.  Tile 24 with patch 7
    exercises the same crop (21px used, 3px dropped)."""
    from transformers import DepthProConfig, DepthProForDepthEstimation, Dinov2Config

    torch.manual_seed(1)
    vit = dict(hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
               intermediate_size=64, image_size=24, patch_size=7)
    cfg = DepthProConfig(
        image_model_config=Dinov2Config(**vit), patch_model_config=Dinov2Config(**vit),
        fov_model_config=Dinov2Config(**vit),
        patch_size=24, fusion_hidden_size=16,
        scaled_images_ratios=[0.25, 0.5, 1],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[32, 32, 16],
        intermediate_hook_ids=[2, 1], intermediate_feature_dims=[16, 16],
        use_fov_model=False, merge_padding_value=1,
    )
    tmodel = DepthProForDepthEstimation(cfg)
    tmodel.eval()
    params = {"params": convert_depthpro(tmodel.state_dict(), None, num_layers=4)}
    import desktop2stereo_tpu.models.depthpro as dp

    jmodel = DepthPro(
        patch_px=24, vit_hidden=32, vit_layers=4, vit_heads=4, vit_mlp=128,
        vit_patch=7, fusion=16, scaled_dims=(32, 32, 16), hook_ids=(2, 1),
        hook_dims=(16, 16),
    )
    orig_pad = dp.MERGE_PAD
    dp.MERGE_PAD = 1
    try:
        rng = np.random.default_rng(8)
        x = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(
                pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2)
            ).predicted_depth.numpy()
        got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
        assert got.shape == want.shape, (got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-6)
        rel = np.abs(got - want).max() / scale
        assert rel < 1e-3, f"rel err {rel:.2e}"
    finally:
        dp.MERGE_PAD = orig_pad
