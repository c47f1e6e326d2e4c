"""DPT-Hybrid parity vs HF transformers (BiT stem + ViT + hybrid neck)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.models.dpt_hybrid import DPTHybrid
from desktop2stereo_tpu.models.convert_hf import convert_dpt_hybrid


def build_torch_hybrid(torch, image_size=64):
    from transformers import BitConfig, DPTConfig, DPTForDepthEstimation

    bit = BitConfig(
        embedding_size=8, hidden_sizes=[16, 32, 64], depths=[1, 2, 1],
        layer_type="bottleneck", out_features=["stage1", "stage2", "stage3"],
        global_padding="SAME", embedding_dynamic_padding=True, num_groups=4,
    )
    cfg = DPTConfig(
        is_hybrid=True, backbone_config=bit, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=4, intermediate_size=64,
        image_size=image_size, patch_size=16, backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[16, 32, 32, 32], fusion_hidden_size=16,
        readout_type="project",
        backbone_featmap_shape=[1, 64, image_size // 16, image_size // 16],
        neck_ignore_stages=[0, 1],
    )
    model = DPTForDepthEstimation(cfg)
    model.eval()
    return model


def test_dpt_hybrid_parity(torch):
    torch.manual_seed(0)
    tmodel = build_torch_hybrid(torch)
    params = {"params": convert_dpt_hybrid(
        tmodel.state_dict(), None, depths=(1, 2, 1), num_layers=4)}
    jmodel = DPTHybrid(
        patch_size=16, bit_depths=(1, 2, 1), bit_hidden=(16, 32, 64),
        bit_embed=8, bit_groups=4, vit_hidden=32, vit_layers=4, vit_heads=4,
        vit_mlp=64, vit_out=(2, 3), neck_channels=(16, 32, 32, 32), fusion=16,
        pretrain_grid=4,
    )

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2)
        ).predicted_depth.numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-6)
    rel = np.abs(got - want).max() / scale
    assert rel < 5e-4, f"rel err {rel:.2e}"
