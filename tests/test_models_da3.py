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


@pytest.mark.slow
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


def test_sky_fill_is_per_batch_element():
    """Device-batched multi-stream: one stream's depth stats must not set
    another stream's sky fill (stats reduce per batch row)."""
    rng = np.random.default_rng(0)
    near = rng.uniform(0.5, 1.5, (12, 12)).astype(np.float32)    # stream A ~1
    far = rng.uniform(90.0, 110.0, (12, 12)).astype(np.float32)  # stream B ~100
    sky = np.zeros((12, 12), np.float32)
    sky[:3, :] = 1.0  # 36 sky pixels each
    depth = jnp.asarray(np.stack([near, far]))
    fixed = np.asarray(sky_to_max_depth(depth, jnp.asarray(np.stack([sky, sky]))))
    # stream A sky pixels filled from A's own q99 (~1.5), never B's ~110
    assert fixed[0, :3].max() < 2.0
    assert fixed[1, :3].min() > 90.0


def test_nested_align_scale_is_per_batch_element():
    from desktop2stereo_tpu.models.da3 import nested_align

    rng = np.random.default_rng(1)
    B, S, Hh, Ww = 2, 1, 12, 12
    base = rng.uniform(1.0, 2.0, (Hh, Ww)).astype(np.float32)
    # anyview depth identical across streams; metric branch says stream 0 is
    # 10x closer than stream 1 → per-stream scales must differ ~10x
    depth = jnp.asarray(np.stack([base, base]))[:, None]
    m_depth = jnp.asarray(np.stack([base * 1.0, base * 10.0]))[:, None]
    conf = jnp.ones((B, S, Hh, Ww), jnp.float32)
    sky = jnp.zeros((B, S, Hh, Ww), jnp.float32)
    # pose_enc with fov giving focal≈300 so metric scaling ≈ identity
    fov = 2.0 * np.arctan((Hh / 2.0) / 300.0)
    pose = np.zeros((B, S, 9), np.float32)
    pose[..., 3:7] = [0, 0, 0, 1.0]
    pose[..., 7] = fov
    pose[..., 8] = 2.0 * np.arctan((Ww / 2.0) / 300.0)
    out = {"depth": depth, "depth_conf": conf, "pose_enc": jnp.asarray(pose)}
    m_out = {"depth": m_depth, "sky": sky}
    aligned = np.asarray(nested_align(out, m_out, (Hh, Ww)))
    ratio = aligned[1] / np.maximum(aligned[0], 1e-9)
    np.testing.assert_allclose(ratio, 10.0, rtol=0.05)
