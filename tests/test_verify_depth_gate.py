"""The real-weight depth parity gate (tools/convert.py --verify-depth).

The gate exists so that the moment egress is granted, ONE command proves
BASELINE's "depth within 1e-2 rel-err of the reference with real
checkpoints" (reference depth.py:1897-2025).  Until then these tests prove
the gate MACHINERY end-to-end on a real-shape random-weight checkpoint:

  save_pretrained dir (config.json + safetensors)
    -> transformers AutoModel forward through the reference's AST-extracted
       predict_depth numerics
    -> vs the flax pipeline with the same converted weights
    -> JSON verdict with pass=True

plus the no-reference-tree fallback oracle and the skipped-by-default
real-checkpoint invocation (set D2S_REAL_CHECKPOINT=<hf snapshot dir>).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

MODEL = "Depth-Anything-V2-Small"


@pytest.fixture(scope="module")
def pretrained_dir(tmp_path_factory):
    """Real-shape ViT-S DepthAnything checkpoint as a full save_pretrained
    folder — what a HF snapshot looks like on disk (config.json included,
    which --verify-depth's AutoModel load needs).  Built by the same
    `--make-random-snapshot` production path the flagship artifact used
    (artifacts/verify_depth_flagship_r05.json), so the builder itself is
    under test."""
    from desktop2stereo_tpu.tools.convert import make_random_snapshot

    out = make_random_snapshot(
        MODEL, str(tmp_path_factory.mktemp("hf_snapshot")), seed=7)
    assert os.path.exists(os.path.join(out, "config.json"))
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    return out


@pytest.fixture()
def small_image(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(21)
    img = rng.integers(0, 255, (180, 320, 3), dtype=np.uint8)
    p = tmp_path / "scene.png"
    Image.fromarray(img).save(p)
    return str(p)


def test_gate_passes_on_converted_weights(pretrained_dir, small_image):
    """Full gate: reference-AST oracle vs flax pipeline at shared weights."""
    from desktop2stereo_tpu.tools.convert import verify_depth

    v = verify_depth(MODEL, checkpoint=pretrained_dir, image=small_image,
                     depth_resolution=126)
    assert v["pass"], f"gate failed: rel_err_max={v['rel_err_max']:.3e}"
    expected_oracle = ("reference-ast"
                       if os.path.exists("/root/reference/depth.py")
                       else "raw-forward")
    assert v["oracle"] == expected_oracle
    assert v["shape"] == [180, 320] or v["oracle"] == "raw-forward"
    # gate machinery should be far inside the 1e-2 budget at fp32/CPU —
    # headroom is what makes a future real-weight failure meaningful
    assert v["rel_err_max"] < 2e-3


def test_gate_fallback_oracle_without_reference_tree(
        pretrained_dir, small_image, monkeypatch):
    """On an egress machine with no /root/reference, the gate still runs:
    raw transformers predicted_depth vs the flax model output."""
    from desktop2stereo_tpu.tools import convert as convert_tool

    monkeypatch.setattr(convert_tool, "REFERENCE_DEPTH_PY",
                        "/nonexistent/depth.py")
    v = convert_tool.verify_depth(MODEL, checkpoint=pretrained_dir,
                                  image=small_image, depth_resolution=126)
    assert v["oracle"] == "raw-forward"
    assert v["pass"], f"raw oracle failed: rel_err_max={v['rel_err_max']:.3e}"


def test_gate_fails_on_wrong_weights(pretrained_dir, small_image, monkeypatch):
    """A gate that cannot fail proves nothing: corrupt the flax tree and the
    verdict must flip."""
    import jax

    from desktop2stereo_tpu.models import factory
    from desktop2stereo_tpu.tools.convert import verify_depth

    real_build = factory.build_model

    def corrupted(name, **kw):
        apply_fn, params, spec = real_build(name, **kw)
        params = jax.tree.map(lambda p: p * 1.5 + 0.01, params)
        return apply_fn, params, spec

    monkeypatch.setattr(factory, "build_model", corrupted)
    v = verify_depth(MODEL, checkpoint=pretrained_dir, image=small_image,
                     depth_resolution=126)
    assert not v["pass"]


@pytest.mark.skipif(not os.environ.get("D2S_REAL_CHECKPOINT"),
                    reason="real published weights need egress; set "
                           "D2S_REAL_CHECKPOINT=<hf snapshot dir> to run the "
                           "BASELINE parity gate")
def test_gate_on_real_published_checkpoint():
    """THE BASELINE gate (depth within 1e-2 of the reference, real weights).
    Runs at full 518 on assets/cats.jpg the moment a checkpoint exists."""
    from desktop2stereo_tpu.tools.convert import verify_depth

    ckpt = os.environ["D2S_REAL_CHECKPOINT"]
    model = os.environ.get("D2S_REAL_MODEL", MODEL)
    v = verify_depth(model, checkpoint=ckpt, depth_resolution=518)
    assert v["pass"], f"REAL-WEIGHT parity failed: {v}"
