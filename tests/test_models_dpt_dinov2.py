"""DPT-DINOv2 (facebook/dpt-dinov2-*) parity vs HF transformers
DPTForDepthEstimation with a Dinov2 backbone.

This family is HF DPT-with-backbone (readout-project neck + classic DPT
head over Dinov2Backbone token sequences, modeling_dpt.py backbone path) —
NOT DepthAnything, which it was mis-routed through before r05.  Tiny
random config, shared weights through the converter, rel-err gate — the
same strongest-checkpoint-free guarantee as every other family.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from desktop2stereo_tpu.models.convert_hf import convert_dpt_dinov2
from desktop2stereo_tpu.models.dpt_vit import DPTDinov2

HID, LAYERS, HEADS, MLP = 32, 6, 2, 128  # Dinov2Config uses mlp_ratio=4
NECK = (8, 16, 24, 24)
FUSION = 16
PATCH = 14


class _TinySpec:
    variant = "tiny"
    patch_size = PATCH
    neck_channels = NECK
    fusion_channels = FUSION
    dims = (HID, LAYERS, HEADS, MLP)


def _torch_model(torch):
    from transformers import Dinov2Config, DPTConfig, DPTForDepthEstimation

    bb = Dinov2Config(
        hidden_size=HID, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        mlp_ratio=4, patch_size=PATCH, image_size=518,
        # last four blocks — the DINOv2 depth-adaptation convention the
        # flax module hardcodes (out_indices are 1-based stage ids)
        out_indices=[LAYERS - 3, LAYERS - 2, LAYERS - 1, LAYERS],
        apply_layernorm=True, reshape_hidden_states=False,
    )
    cfg = DPTConfig(
        backbone_config=bb, is_hybrid=False, readout_type="project",
        neck_hidden_sizes=list(NECK), fusion_hidden_size=FUSION,
    )
    torch.manual_seed(3)
    m = DPTForDepthEstimation(cfg)
    m.eval()
    return m


@pytest.mark.parametrize("hw", [(70, 70), (56, 84)])
def test_dpt_dinov2_parity(torch, hw):
    H, W = hw
    tmodel = _torch_model(torch)
    params = {"params": convert_dpt_dinov2(tmodel.state_dict(), _TinySpec)}
    jmodel = DPTDinov2(
        hidden_size=HID, num_layers=LAYERS, num_heads=HEADS, mlp_dim=MLP,
        neck_channels=NECK, fusion_channels=FUSION, patch_size=PATCH,
    )
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2),
        ).predicted_depth.numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-6)
    rel = np.abs(got - want).max() / scale
    assert rel < 5e-4, f"rel err {rel:.2e}"


def test_dpt_dinov2_factory_builds_and_runs():
    """Registry route: the dpt_dinov2 family builds the DPT architecture
    (readout params present) and runs through the factory surface."""
    import jax

    from desktop2stereo_tpu.models.factory import build_model

    fn, params, spec = build_model("dpt-dinov2-small-nyu", init_size=56)
    assert "decoder" in params["params"]
    assert "readout_0" in params["params"]["decoder"]
    out = fn(params, jnp.zeros((1, 56, 56, 3), jnp.float32))
    assert out.ndim == 3 and np.all(np.isfinite(np.asarray(out)))
