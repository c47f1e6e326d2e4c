"""Depth-Anything-3 parity tests against the upstream reference torch code
(loaded read-only via tests/reference_loader.py, skipped if absent).

Covers the anyview path (alternating local/global attention, QK-norm, 2D
RoPE, camera token, cat_token features, DualDPT with separate aux chain,
camera decoder) and the mono path (plain DINOv2 + DPT + sky head),
with shared random weights flowing through convert_da3.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.registry import ModelSpec
from desktop2stereo_tpu.models.da3 import DepthAnything3, da3_depth_apply, sky_to_max_depth
from desktop2stereo_tpu.models.convert_hf import convert_da3

from tests.reference_loader import load_reference_da3

VITS = dict(hidden_size=384, num_layers=12, num_heads=6, mlp_dim=1536)
H = W = 70  # 5x5 patch grid — exercises pos-embed interpolation from 37x37


def build_reference_anyview(torch):
    ref = load_reference_da3()
    torch.manual_seed(0)
    vit = ref.vt.vit_small(
        img_size=518, patch_size=14, alt_start=4, qknorm_start=4, rope_start=4,
        cat_token=True, ffn_layer="mlp",
    )
    head = ref.dualdpt.DualDPT(dim_in=768, features=64, out_channels=(48, 96, 192, 384))
    cam = ref.cam_dec.CameraDec(dim_in=768)
    for m in (vit, head, cam):
        m.eval()
    return vit, head, cam


def combined_state_dict(vit, head, cam=None):
    sd = {}
    for k, v in vit.state_dict().items():
        sd["backbone.pretrained." + k] = v
    for k, v in head.state_dict().items():
        sd["head." + k] = v
    if cam is not None:
        for k, v in cam.state_dict().items():
            sd["cam_dec." + k] = v
    return sd


def test_da3_anyview_parity(torch):
    vit, head, cam = build_reference_anyview(torch)
    spec = ModelSpec(name="DA3-SMALL", family="da3", variant="vits",
                     hf_repo="none", metric=True)
    params = {"params": convert_da3(combined_state_dict(vit, head, cam), spec)}
    jmodel = DepthAnything3(variant="vits", mode="anyview", **VITS)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).unsqueeze(1)  # [B,S,3,H,W]

    with torch.no_grad():
        feats, _ = vit.get_intermediate_layers(xt, [5, 7, 9, 11])
        ref_out = head(list(feats), H, W, patch_start_idx=0)
        ref_pose = cam(feats[-1][1])

    out = jmodel.apply(params, jnp.asarray(x))

    for key, ref_t in (
        ("depth", ref_out["depth"]),
        ("depth_conf", ref_out["depth_conf"]),
        ("ray", ref_out["ray"]),
        ("ray_conf", ref_out["ray_conf"]),
    ):
        got = np.asarray(out[key])
        want = ref_t.numpy()
        assert got.shape == want.shape, (key, got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-6)
        rel = np.abs(got - want).max() / scale
        assert rel < 5e-4, f"{key}: rel err {rel:.2e}"

    pose = np.asarray(out["pose_enc"])
    np.testing.assert_allclose(pose, ref_pose.numpy(), atol=1e-4, rtol=1e-3)


def test_da3_mono_parity(torch):
    ref = load_reference_da3()
    torch.manual_seed(1)
    vit = ref.vt.vit_small(img_size=518, patch_size=14, cat_token=False,
                           ffn_layer="mlp")
    head = ref.dpt.DPT(dim_in=384, features=64, out_channels=(48, 96, 192, 384),
                       norm_type="idt", use_sky_head=True)
    vit.eval(); head.eval()

    spec = ModelSpec(name="DA3MONO-SMALL-TEST", family="da3", variant="vits",
                     hf_repo="none", metric=True)
    params = {"params": convert_da3(combined_state_dict(vit, head), spec)}
    jmodel = DepthAnything3(variant="vits", mode="mono", **VITS)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).unsqueeze(1)

    # mono preset uses DA-style out layers; for 12-layer vits test use last 4
    with torch.no_grad():
        feats, _ = vit.get_intermediate_layers(xt, [4, 7, 9, 11])
        ref_out = head(list(feats), H, W, patch_start_idx=0)

    # patch the out_layers via a local subclass of our module config
    import desktop2stereo_tpu.models.da3 as da3_mod
    orig = da3_mod.DA3_MONO_OUT_LAYERS
    da3_mod.DA3_MONO_OUT_LAYERS = (4, 7, 9, 11)
    try:
        out = jmodel.apply(params, jnp.asarray(x))
    finally:
        da3_mod.DA3_MONO_OUT_LAYERS = orig

    for key in ("depth", "sky"):
        got = np.asarray(out[key])
        want = ref_out[key].numpy()
        assert got.shape == want.shape, (key, got.shape, want.shape)
        scale = max(np.abs(want).max(), 1e-6)
        rel = np.abs(got - want).max() / scale
        assert rel < 5e-4, f"{key}: rel err {rel:.2e}"


def test_da3_multiview_runs():
    """S=2 multi-view: cross-view (global) attention spans both views."""
    jmodel = DepthAnything3(variant="vits", mode="anyview", **VITS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 42, 42, 3)),
                    jnp.float32)
    params = jmodel.init(jax.random.PRNGKey(0), x)
    out = jmodel.apply(params, x)
    assert out["depth"].shape == (1, 2, 42, 42)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_sky_to_max_depth():
    depth = jnp.asarray(np.linspace(1.0, 10.0, 100).reshape(10, 10), jnp.float32)
    sky = jnp.zeros((10, 10)).at[:2, :].set(1.0)  # first two rows are sky
    fixed = sky_to_max_depth(depth[None], sky[None])[0]
    non_sky_vals = np.asarray(depth)[2:]
    assert np.all(np.asarray(fixed)[:2, :] >= non_sky_vals.max() - 0.5)
    np.testing.assert_allclose(np.asarray(fixed)[2:], non_sky_vals)

    # ≤10 sky pixels → untouched (reference da3.py:174-176 early return)
    sky_few = jnp.zeros((10, 10)).at[0, :].set(1.0)
    same = sky_to_max_depth(depth[None], sky_few[None])[0]
    np.testing.assert_allclose(np.asarray(same), np.asarray(depth))
