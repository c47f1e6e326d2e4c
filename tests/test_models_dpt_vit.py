"""Classic DPT (non-hybrid ViT, Intel/dpt-large family) parity vs HF
transformers DPTForDepthEstimation with tiny random configs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.models.dpt_vit import DPTViT
from desktop2stereo_tpu.models.convert_hf import convert_dpt_vit, param_count
from desktop2stereo_tpu.core.registry import ModelSpec


def build_torch_dpt(torch, hidden, layers, heads, mlp, out_indices, neck, fusion,
                    image_size=64, patch=16):
    from transformers import DPTConfig, DPTForDepthEstimation

    cfg = DPTConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=mlp, image_size=image_size, patch_size=patch,
        backbone_out_indices=list(out_indices), readout_type="project",
        neck_hidden_sizes=list(neck), fusion_hidden_size=fusion,
        is_hybrid=False,
    )
    model = DPTForDepthEstimation(cfg)
    model.eval()
    return model


class _TinySpec:
    variant = "tiny"
    patch_size = 16
    neck_channels = (16, 32, 64, 64)
    fusion_channels = 32


def run_parity(torch, H, W, tol=3e-4):
    import desktop2stereo_tpu.models.dpt_vit as mod

    dims = dict(hidden=64, layers=4, heads=4, mlp=128, out=(0, 1, 2, 3))
    # register a tiny preset so converter + from_spec agree
    mod.DPT_VIT_PRESETS["tiny"] = (dims["hidden"], dims["layers"], dims["heads"],
                                   dims["mlp"], dims["out"])
    try:
        torch.manual_seed(0)
        tmodel = build_torch_dpt(
            torch, dims["hidden"], dims["layers"], dims["heads"], dims["mlp"],
            dims["out"], _TinySpec.neck_channels, _TinySpec.fusion_channels,
        )
        params = {"params": convert_dpt_vit(tmodel.state_dict(), _TinySpec)}
        jmodel = DPTViT(
            hidden_size=dims["hidden"], num_layers=dims["layers"],
            num_heads=dims["heads"], mlp_dim=dims["mlp"], out_indices=dims["out"],
            neck_channels=_TinySpec.neck_channels,
            fusion_channels=_TinySpec.fusion_channels,
            patch_size=16, pretrain_grid=4,  # 64/16
        )

        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(
                pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
                interpolate_pos_encoding=True,
            ).predicted_depth.numpy()
        got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
        assert got.shape == want.shape, (got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-6)
        rel = np.abs(got - want).max() / scale
        assert rel < tol, f"rel err {rel:.2e}"
    finally:
        mod.DPT_VIT_PRESETS.pop("tiny", None)


def test_dpt_vit_parity_square(torch):
    run_parity(torch, 64, 64)


def test_dpt_vit_parity_posinterp(torch):
    """80x80 → 5x5 grid (vs 4x4 pretrain table): exercises pos-embed bilinear
    interpolation and the odd-grid fusion path.  (Square only: HF's
    non-hybrid DPT assumes square token grids, and the reference always
    feeds this family fixed-square inputs — reference depth.py:531-538.)"""
    run_parity(torch, 80, 80)
