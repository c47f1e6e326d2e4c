"""Real-weight ingestion: the on-disk safetensors → factory → flax path.

The round-1 converter suite proved parity on in-memory torch state_dicts;
this file proves the DISK pipeline the reference exercises with actual HF
checkpoints (reference depth.py:498-526, 1649) — the strongest equivalent a
zero-egress environment allows:

  torch model (real ViT-S dims, random weights)
    → safetensors file on disk
    → factory.find_checkpoint / build_model(checkpoint=...)
    → flax apply == torch forward
  plus tools/convert.verify and the CLI's --checkpoint wiring.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
import jax.numpy as jnp
import torch

import desktop2stereo_tpu.models.factory as factory
from desktop2stereo_tpu.core.registry import get_spec

MODEL = "Depth-Anything-V2-Small"


@pytest.fixture(scope="module")
def torch_vits_checkpoint(tmp_path_factory):
    """A real-shape (ViT-S 384/12/6/1536) torch DepthAnything checkpoint
    saved as safetensors on disk, exactly like a converted HF download."""
    from transformers import (
        DepthAnythingConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    spec = get_spec(MODEL)
    hidden, layers, heads, mlp = spec.dims
    bb = Dinov2Config(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=mlp, patch_size=spec.patch_size, image_size=518,
        out_indices=[i + 1 for i in spec.dpt_layers], apply_layernorm=True,
        reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=spec.fusion_channels,
        patch_size=spec.patch_size, reassemble_hidden_size=hidden,
        neck_hidden_sizes=list(spec.neck_channels), head_hidden_size=32,
        depth_estimation_type="relative",
    )
    torch.manual_seed(3)
    tmodel = DepthAnythingForDepthEstimation(cfg)
    tmodel.eval()

    ckpt_dir = tmp_path_factory.mktemp("ckpt") / MODEL
    ckpt_dir.mkdir()
    path = str(ckpt_dir / "model.safetensors")
    from safetensors.torch import save_file

    save_file(
        {k: v.contiguous() for k, v in tmodel.state_dict().items()}, path
    )
    return tmodel, path


def _torch_forward(tmodel, x_nhwc: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return tmodel(
            pixel_values=torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
        ).predicted_depth.numpy()


def test_explicit_checkpoint_path_loads_and_matches(torch_vits_checkpoint):
    tmodel, path = torch_vits_checkpoint
    apply_fn, params, spec = factory.build_model(MODEL, checkpoint=path)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 126, 126, 3)).astype(np.float32)
    ref = _torch_forward(tmodel, x)
    out = np.asarray(apply_fn(params, jnp.asarray(x)))

    assert out.shape == ref.shape
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 2e-4, f"disk-loaded weights diverge: rel {rel:.2e}"


def test_find_checkpoint_discovers_cache_dir(torch_vits_checkpoint, monkeypatch):
    _, path = torch_vits_checkpoint
    cache_root = os.path.dirname(os.path.dirname(path))  # …/ckpt
    monkeypatch.setattr(factory, "DEFAULT_WEIGHTS_DIRS", (cache_root,))

    spec = get_spec(MODEL)
    found = factory.find_checkpoint(spec)
    assert found == path

    # build_model with no explicit checkpoint must pick it up (no random init)
    apply_fn, params, _ = factory.build_model(MODEL)
    leaves = [np.asarray(l) for l in jnp_tree_leaves(params)]
    assert any(l.size > 1000 for l in leaves)


def jnp_tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_convert_verify_runs(torch_vits_checkpoint, monkeypatch, capsys):
    _, path = torch_vits_checkpoint
    cache_root = os.path.dirname(os.path.dirname(path))
    monkeypatch.setattr(factory, "DEFAULT_WEIGHTS_DIRS", (cache_root,))

    from desktop2stereo_tpu.tools import convert as convert_tool

    convert_tool.verify(MODEL)
    out = capsys.readouterr().out
    assert "OK" in out and MODEL in out


def test_cli_checkpoint_flag_end_to_end(torch_vits_checkpoint, tmp_path):
    """--checkpoint wiring: CLI run with the on-disk file, 3 frames → PNG."""
    _, path = torch_vits_checkpoint
    from desktop2stereo_tpu.cli import run

    out_dir = tmp_path / "frames"
    rc = run([
        "--source", "synthetic", "--frames", "3", "--sink", "png",
        "--model", MODEL, "--checkpoint", path, "--depth-res", "126",
        "--size", "126x224", "--out", str(out_dir), "--stats-every", "0",
        "--quality", "fast",
    ])
    assert rc == 0
    written = list(out_dir.glob("*.png"))
    assert written, "PNG sink wrote no frames"


def test_reserialize_roundtrip(torch_vits_checkpoint, tmp_path):
    """reserialize(): torch .bin folder → safetensors (reference convert.py
    behavior), then the factory loads the result."""
    tmodel, _ = torch_vits_checkpoint
    model_dir = tmp_path / "torch_folder"
    tmodel.save_pretrained(str(model_dir), safe_serialization=False)
    assert (model_dir / "pytorch_model.bin").exists()

    from desktop2stereo_tpu.tools.convert import reserialize

    reserialize(str(model_dir))
    st = model_dir / "model.safetensors"
    assert st.exists()

    apply_fn, params, _ = factory.build_model(MODEL, checkpoint=str(st))
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    ref = _torch_forward(tmodel, x)
    out = np.asarray(apply_fn(params, jnp.asarray(x)))
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 2e-4


def test_sharded_safetensors_checkpoint_loads(tmp_path):
    """Large checkpoints ship ONLY as model-0000N-of-0000M.safetensors
    (+ index json); find_checkpoint/to_numpy_state_dict must discover and
    merge the shard set (r05 — previously they silently fell back to
    random init)."""
    import json

    from safetensors.numpy import save_file

    from desktop2stereo_tpu.models.convert_hf import to_numpy_state_dict
    from desktop2stereo_tpu.models.factory import _resolve_in_dir

    d = tmp_path / "snap"
    d.mkdir()
    a = {"enc.w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    b = {"dec.w": np.ones((4,), np.float32) * 2}
    save_file(a, str(d / "model-00001-of-00002.safetensors"))
    save_file(b, str(d / "model-00002-of-00002.safetensors"))
    idx = {"weight_map": {"enc.w": "model-00001-of-00002.safetensors",
                          "dec.w": "model-00002-of-00002.safetensors"}}
    (d / "model.safetensors.index.json").write_text(json.dumps(idx))

    hit = _resolve_in_dir(str(d))
    assert hit is not None and hit.endswith("index.json")
    sd = to_numpy_state_dict(hit)
    assert set(sd) == {"enc.w", "dec.w"}
    np.testing.assert_array_equal(sd["enc.w"], a["enc.w"])

    # a single shard path also merges the whole set
    sd2 = to_numpy_state_dict(str(d / "model-00001-of-00002.safetensors"))
    assert set(sd2) == {"enc.w", "dec.w"}

    # shard set WITHOUT an index json still resolves
    (d / "model.safetensors.index.json").unlink()
    hit2 = _resolve_in_dir(str(d))
    assert hit2 is not None and "model-00001" in hit2
