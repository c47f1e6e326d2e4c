"""Checkpoint tooling: fetch/convert model weights into the local cache.

The reference's convert.py re-serializes a HF folder to safetensors
(reference convert.py:14-24) and the app pulls checkpoints from the HF hub
with a mirror fallback (reference depth.py:498-526, utils.py:670-696).
Here the same jobs for the TPU framework:

  python -m desktop2stereo_tpu.tools.convert --model Depth-Anything-V2-Small
      downloads the registry model's HF repo (hub cache) so the factory
      finds `model.safetensors` (factory.find_checkpoint scans the hub dir).

  python -m desktop2stereo_tpu.tools.convert --model-path ./SomeModel
      re-serializes a local torch checkpoint folder to safetensors
      (reference convert.py behavior).

  ... --verify  additionally converts the weights into the flax tree and
      reports the parameter count (catches converter/naming drift early).
"""

from __future__ import annotations

import argparse
import os
import sys


def pick_endpoint() -> str:
    """HF endpoint with CN-mirror fallback (reference utils.py:670-696)."""
    import urllib.request

    if os.environ.get("HF_ENDPOINT"):
        return os.environ["HF_ENDPOINT"]
    try:
        urllib.request.urlopen("https://huggingface.co", timeout=3)
        return "https://huggingface.co"
    except Exception:
        return "https://hf-mirror.com"


def download(model_name: str) -> str:
    from desktop2stereo_tpu.core.registry import get_spec

    spec = get_spec(model_name)
    os.environ.setdefault("HF_ENDPOINT", pick_endpoint())
    from huggingface_hub import snapshot_download

    path = snapshot_download(spec.hf_repo, allow_patterns=["*.safetensors", "*.json"])
    print(f"[convert] {model_name}: {spec.hf_repo} -> {path}")
    return path


def reserialize(model_path: str) -> None:
    """Local torch checkpoint folder → safetensors (reference convert.py)."""
    import torch
    from transformers import AutoModelForDepthEstimation

    model = AutoModelForDepthEstimation.from_pretrained(
        model_path, low_cpu_mem_usage=True, trust_remote_code=True,
        torch_dtype=torch.float32,
    )
    model.save_pretrained(model_path, safe_serialization=True)
    print(f"[convert] re-serialized {model_path} to safetensors")


def verify(model_name: str) -> None:
    from desktop2stereo_tpu.models.factory import build_model, find_checkpoint
    from desktop2stereo_tpu.core.registry import get_spec
    from desktop2stereo_tpu.models.convert_hf import param_count

    spec = get_spec(model_name)
    ckpt = find_checkpoint(spec)
    if ckpt is None:
        raise SystemExit(f"no checkpoint found for {model_name}")
    _, params, _ = build_model(model_name)
    print(f"[convert] {model_name}: {ckpt} -> "
          f"{param_count(params) / 1e6:.1f}M params OK")


def main() -> None:
    p = argparse.ArgumentParser(prog="d2s-convert")
    p.add_argument("--model", help="registry model name to download")
    p.add_argument("--model-path", help="local torch folder to re-serialize")
    p.add_argument("--verify", action="store_true",
                   help="convert into the flax tree and report params")
    args = p.parse_args()
    if args.model_path:
        reserialize(args.model_path)
    if args.model:
        download(args.model)
        if args.verify:
            verify(args.model)
    if not args.model and not args.model_path:
        p.print_help()
        sys.exit(1)


if __name__ == "__main__":
    main()
