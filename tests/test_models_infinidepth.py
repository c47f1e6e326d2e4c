"""InfiniDepth parity against the reference torch implementation (DINOv3
backbone + BasicEncoder + ImplicitHead), with shared random weights through
convert_infinidepth.  Reference loaded read-only; skipped if absent.
"""

import os
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.registry import get_spec
from desktop2stereo_tpu.models.infinidepth import InfiniDepth as JInfiniDepth
from desktop2stereo_tpu.models.convert_hf import convert_infinidepth, param_count

from tests.reference_loader import REFERENCE_ROOT, _install_stubs

H = W = 64  # 4x4 patch grid at patch 16


def load_reference_infinidepth(torch, encoder="vits16"):
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "models", "InfiniDepth")):
        pytest.skip("reference tree not available")
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.InfiniDepth.model.model import InfiniDepth

    torch.manual_seed(0)
    m = InfiniDepth(model_path=None, encoder=encoder)
    m.eval()
    # pretrained=False leaves the k-bias masks as NaN placeholders; real
    # checkpoints carry [1...,0...,1...] (q/v kept, k masked) — set that.
    D = m.pretrained.embed_dim
    mask = torch.cat([torch.ones(D), torch.zeros(D), torch.ones(D)])
    for blk in m.pretrained.blocks:
        blk.attn.qkv.bias_mask.copy_(mask)
    return m


@pytest.mark.parametrize("encoder,name", [
    ("vits16", "InfiniDepth-Small"),
    ("vits16plus", "InfiniDepth-SmallPlus"),
])
def test_infinidepth_parity(torch, encoder, name):
    ref = load_reference_infinidepth(torch, encoder)
    spec = get_spec(name)
    params = {"params": convert_infinidepth(ref.state_dict(), spec)}
    jmodel = JInfiniDepth.from_spec(spec)

    rng = np.random.default_rng(3)
    x = rng.random((1, H, W, 3)).astype(np.float32)  # RGB in [0,1]
    with torch.no_grad():
        want = ref.forward_dense(
            torch.from_numpy(x).permute(0, 3, 1, 2), force_fp32=True
        )[0, 0].numpy()

    got = np.asarray(jmodel.apply(params, jnp.asarray(x)))[0]
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    rel = np.abs(got - want).max() / scale
    assert rel < 5e-4, f"rel err {rel:.2e}"


@pytest.mark.slow
def test_infinidepth_converted_tree_matches_init(torch):
    ref = load_reference_infinidepth(torch, "vits16")
    spec = get_spec("InfiniDepth-Small")
    conv = convert_infinidepth(ref.state_dict(), spec)
    jmodel = JInfiniDepth.from_spec(spec)
    init = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    conv_paths = {jax.tree_util.keystr(k): tuple(np.shape(v))
                  for k, v in jax.tree.leaves_with_path(conv)}
    init_paths = {jax.tree_util.keystr(k): tuple(v.shape)
                  for k, v in jax.tree.leaves_with_path(init)}
    assert set(conv_paths) == set(init_paths), sorted(set(conv_paths) ^ set(init_paths))[:10]
    for k in conv_paths:
        assert conv_paths[k] == init_paths[k], (k, conv_paths[k], init_paths[k])
    assert param_count(conv) == param_count(init)
