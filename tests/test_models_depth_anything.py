"""End-to-end parity: HF DepthAnythingForDepthEstimation (random weights)
vs our flax DepthAnything after weight conversion.

No pretrained checkpoints exist in this environment (zero egress), so parity
is proven structurally: a torch model with *random* weights must produce the
same depth map after conversion — this catches any architecture or converter
error a fixed checkpoint would.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.depth_anything import DepthAnything
from desktop2stereo_tpu.models.convert_hf import convert_depth_anything, param_count


def build_torch_da(hidden, layers, heads, mlp, out_indices, neck, fusion, head_hidden,
                   metric=False, max_depth=1.0):
    from transformers import DepthAnythingConfig, DepthAnythingForDepthEstimation, Dinov2Config

    bb = Dinov2Config(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=mlp, patch_size=14, image_size=518,
        out_indices=list(out_indices), apply_layernorm=True,
        reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=fusion, patch_size=14,
        reassemble_hidden_size=hidden, neck_hidden_sizes=list(neck),
        head_hidden_size=head_hidden,
        depth_estimation_type="metric" if metric else "relative",
        max_depth=max_depth,
    )
    model = DepthAnythingForDepthEstimation(cfg)
    model.eval()
    return model


def make_spec(variant, hidden, layers, heads, mlp, out_layers, neck, fusion,
              metric=False, max_depth=1.0):
    # bypass the registry for custom tiny dims
    import desktop2stereo_tpu.core.registry as R

    spec = ModelSpec(name="test", family="depth_anything", variant=variant,
                     hf_repo="none", metric=metric, max_depth=max_depth)
    return spec


def run_parity(hidden, layers, heads, mlp, out_layers, neck, fusion, head_hidden,
               H, W, metric=False, max_depth=1.0, tol=2e-4):
    torch.manual_seed(0)
    tmodel = build_torch_da(hidden, layers, heads, mlp,
                            [i + 1 for i in out_layers], neck, fusion, head_hidden,
                            metric, max_depth)

    jmodel = DepthAnything(
        hidden_size=hidden, num_layers=layers, num_heads=heads, mlp_dim=mlp,
        out_layers=tuple(out_layers), neck_channels=tuple(neck),
        fusion_channels=fusion, head_channels=head_hidden,
        metric=metric, max_depth=max_depth,
    )
    spec = make_spec("vits", hidden, layers, heads, mlp, out_layers, neck, fusion)
    params = {"params": convert_depth_anything(tmodel.state_dict(), spec)}

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(pixel_values=torch.from_numpy(x).permute(0, 3, 1, 2)).predicted_depth.numpy()
    out = np.asarray(jmodel.apply(params, jnp.asarray(x)))

    assert out.shape == ref.shape, (out.shape, ref.shape)
    scale = max(np.abs(ref).max(), 1e-6)
    rel = np.abs(out - ref).max() / scale
    assert rel < tol, f"rel err {rel:.2e}"
    return rel


def test_parity_tiny_da():
    """4-layer 64-dim toy — fast structural check incl. pos-embed interp
    (70x84 input → 5x6 grid vs 37x37 table)."""
    run_parity(64, 4, 4, 256, (0, 1, 2, 3), (16, 32, 64, 64), 32, 16, 70, 84)


def test_parity_tiny_da_metric():
    run_parity(64, 4, 4, 256, (0, 1, 2, 3), (16, 32, 64, 64), 32, 16, 70, 70,
               metric=True, max_depth=20.0)


@pytest.mark.slow
def test_parity_vits_shape_at_266():
    """Real ViT-S dims (the reference's default model class) at 266x266
    (19x19 grid, exercises interpolation + all 12 layers)."""
    run_parity(384, 12, 6, 1536, (2, 5, 8, 11), (48, 96, 192, 384), 64, 32,
               266, 266, tol=5e-4)


@pytest.mark.slow
def test_converted_tree_matches_init_tree():
    """Converter output must be structurally identical to a fresh init."""
    torch.manual_seed(0)
    tmodel = build_torch_da(64, 4, 4, 256, [1, 2, 3, 4], (16, 32, 64, 64), 32, 16)
    spec = make_spec("vits", 64, 4, 4, 256, (0, 1, 2, 3), (16, 32, 64, 64), 32)
    conv = convert_depth_anything(tmodel.state_dict(), spec)

    jmodel = DepthAnything(
        hidden_size=64, num_layers=4, num_heads=4, mlp_dim=256,
        out_layers=(0, 1, 2, 3), neck_channels=(16, 32, 64, 64),
        fusion_channels=32, head_channels=16,
    )
    init = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 70, 70, 3)))["params"]

    conv_paths = {jax.tree_util.keystr(k): v.shape for k, v in jax.tree.leaves_with_path(conv)}
    init_paths = {jax.tree_util.keystr(k): tuple(v.shape) for k, v in jax.tree.leaves_with_path(init)}
    assert set(conv_paths) == set(init_paths), (
        set(conv_paths) ^ set(init_paths))
    for k in conv_paths:
        assert tuple(conv_paths[k]) == tuple(init_paths[k]), (k, conv_paths[k], init_paths[k])
    assert param_count(conv) == param_count(init)


def test_lane_padded_head_convs_match_nn_conv():
    """DPTHead's lane-padded conv2/conv3 (zero-padded channel dims for the
    TPU conv path) must be EXACT vs the narrow nn.Conv formulation, with
    identical param shapes (converter compatibility)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from desktop2stereo_tpu.models.dpt import DPTHead

    head = DPTHead(fusion_channels=64, head_channels=32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 12, 16, 64)),
                    jnp.float32)
    params = head.init(jax.random.PRNGKey(1), x, (6, 8))
    p = params["params"]
    # param shapes stay the NARROW nn.Conv shapes
    assert p["conv2"]["kernel"].shape == (3, 3, 32, 32)
    assert p["conv3"]["kernel"].shape == (1, 1, 32, 1)
    got = head.apply(params, x, (6, 8))

    # narrow reference formulation on the same weights
    def narrow(x):
        def conv(x, w, b, pad):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), pad, dimension_numbers=dn) + b

        from desktop2stereo_tpu.ops.resize import resize

        y = conv(x, p["conv1"]["kernel"], p["conv1"]["bias"],
                 [(1, 1), (1, 1)])
        y = resize(y, (6 * 14, 8 * 14), mode="bilinear", align_corners=True)
        y = jax.nn.relu(conv(y, p["conv2"]["kernel"], p["conv2"]["bias"],
                             [(1, 1), (1, 1)]))
        y = jax.nn.relu(conv(y, p["conv3"]["kernel"], p["conv3"]["bias"],
                             [(0, 0), (0, 0)]))
        return y[..., 0]

    want = narrow(x)
    # identical math; backends may vectorize the padded conv's reduction
    # differently (last-ulp f32 drift on CPU; measured 0.0 on TPU)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)
