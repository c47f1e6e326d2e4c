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

  ... --verify-depth  the REAL-WEIGHT numerical parity gate: runs the
      reference's own predict_depth numerics (AST-extracted from
      /root/reference/depth.py when that tree is present) and this
      framework's flax pipeline on the same image with the checkpoint's
      weights, and asserts max rel-err <= 1e-2 (BASELINE.md tolerance).
      Emits one JSON verdict line; exit code 1 on failure.  The moment
      egress exists, `--model X --verify-depth` is the single command
      between "checkpoint downloaded" and "BASELINE parity proven"
      (reference depth.py:1897-2025).
"""

from __future__ import annotations

import argparse
import json
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


def make_random_snapshot(model_name: str, out_dir: str,
                         seed: int = 7) -> str:
    """Full HF-format snapshot (config.json + model.safetensors) of the
    registry model at its REAL architecture with seeded random weights.

    On an egress-dead harness this is the strongest stand-in for a hub
    download: every byte of the --verify-depth gate (AutoModel load, weight
    conversion, both forward paths) runs at production geometry, so the
    only thing left unproven is the weight VALUES (VERDICT r04 item 4).
    Families limited to those AutoModelForDepthEstimation can host."""
    import torch
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)

    from desktop2stereo_tpu.core.registry import get_spec

    spec = get_spec(model_name)
    if spec.family not in ("depth_anything",):
        raise NotImplementedError(
            f"--make-random-snapshot supports the depth_anything family "
            f"(AutoModel-hosted); got {spec.family!r}")
    hidden, layers, heads, mlp = spec.dims
    bb = Dinov2Config(
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=mlp,
        patch_size=spec.patch_size, image_size=518,
        out_indices=[i + 1 for i in spec.dpt_layers], apply_layernorm=True,
        reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=spec.fusion_channels,
        patch_size=spec.patch_size, reassemble_hidden_size=hidden,
        neck_hidden_sizes=list(spec.neck_channels), head_hidden_size=32,
        depth_estimation_type="relative",
    )
    torch.manual_seed(seed)
    tmodel = DepthAnythingForDepthEstimation(cfg)
    tmodel.eval()
    out = os.path.join(out_dir, model_name)
    tmodel.save_pretrained(out, safe_serialization=True)
    n = sum(p.numel() for p in tmodel.parameters())
    print(f"[convert] random snapshot {model_name} ({n / 1e6:.1f}M params) "
          f"-> {out}")
    return out


def probe_egress() -> dict:
    """Record whether the HF hub is reachable — the artifact's provenance
    for why weights are random (re-probed every round per VERDICT r04)."""
    import socket

    status = {}
    for host in ("huggingface.co", "hf-mirror.com"):
        try:
            socket.getaddrinfo(host, 443)
            status[host] = "dns-ok"
        except OSError as e:
            status[host] = f"dns-dead ({e.__class__.__name__})"
    return status


REFERENCE_DEPTH_PY = "/root/reference/depth.py"


def _load_image(path: str | None) -> "np.ndarray":
    """uint8 RGB [H,W,3].  Explicit path > reference assets/cats.jpg (the
    BASELINE configs[0] input) > deterministic synthetic 1080p scene."""
    import numpy as np

    if path is None:
        cats = "/root/reference/assets/cats.jpg"
        path = cats if os.path.exists(cats) else None
    if path is not None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    # deterministic synthetic: gradients + rectangles at distinct depths so a
    # depth model produces structured (not flat) output
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([xx / w, yy / h, (xx + yy) / (w + h)], axis=-1)
    for i, (y0, x0, s, v) in enumerate(
            [(100, 200, 300, 0.9), (500, 900, 400, 0.2), (650, 300, 250, 0.6)]):
        img[y0:y0 + s, x0:x0 + s, i % 3] = v
    return (img * 255).astype(np.uint8)


def _reference_predict_depth_ns(metric: bool, fg: float, aa: float):
    """The reference's own numerics, AST-extracted (cannot drift).  Returns
    None when /root/reference isn't on this machine."""
    if not os.path.exists(REFERENCE_DEPTH_PY):
        return None
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import torch

    from tests.reference_loader import load_reference_functions

    return load_reference_functions(
        "depth.py",
        ["_resize_patch_aligned_t", "post_process_depth", "normalize",
         "apply_gamma", "apply_foreground_scale", "anti_alias",
         "_aa_kernel_cache", "_percentile_bounds_no_lerp",
         "_percentile_bounds_sort"],
        globals_extra={
            # IS_CUDA=True selects the reference's bicubic+antialias resize
            # branch — the preprocessing this framework mirrors (its other
            # branches are DirectML/XPU workarounds, depth.py:670-674);
            # everything extracted still executes on CPU tensors.
            "IS_XPU": False, "IS_CUDA": True,
            "DEVICE": torch.device("cpu"),
            "is_metric": lambda: metric,
            "FOREGROUND_SCALE": fg, "AA_STRENGTH": aa,
        },
    )


def verify_depth(model_name: str, checkpoint: str | None = None,
                 image: str | None = None, tol: float = 1e-2,
                 depth_resolution: int = 518,
                 foreground_scale: float = 0.0,
                 aa_strength: float = 1.0) -> dict:
    """Real-weight parity gate: reference predict_depth vs the flax pipeline.

    Mirrors reference depth.py:1897-2025 minus temporal smoothing: patch-
    aligned resize -> /255 -> family normalize -> model -> post_process_depth
    -> bilinear resize back to the input resolution.  Both sides run fp32 on
    CPU (TPU f32 matmuls silently run bf16, ~1e-2 — would eat the tolerance).

    Oracle ladder: with /root/reference present, the torch side IS the
    reference source (AST-extracted); without it (a real egress machine),
    falls back to comparing raw transformers predicted_depth, which still
    gates the converted weights — the post ops are parity-proven separately.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":
        # config.update is ineffective once another backend initialized
        # (CLAUDE.md: force CPU BEFORE other jax use); a TPU run would
        # silently do bf16 f32-matmuls (~1e-2) and eat the whole tolerance
        raise SystemExit(
            "--verify-depth needs a CPU-only JAX process but the "
            f"{jax.default_backend()!r} backend is already initialized; "
            "run it as a standalone command")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from desktop2stereo_tpu.core.registry import get_spec
    from desktop2stereo_tpu.models import factory
    import importlib

    # ops/__init__ re-exports functions named like their submodules
    # (resize, normalize) — fetch the MODULES explicitly
    depth_post = importlib.import_module("desktop2stereo_tpu.ops.depth_post")
    norm_ops = importlib.import_module("desktop2stereo_tpu.ops.normalize")
    resize = importlib.import_module("desktop2stereo_tpu.ops.resize")

    spec = get_spec(model_name)
    if spec.family not in ("depth_anything", "dpt_dinov2", "dpt", "dpt_beit",
                           "dpt_hybrid", "zoedepth"):
        raise NotImplementedError(
            f"--verify-depth drives torch via transformers AutoModel; family "
            f"{spec.family!r} has no AutoModel loader (use the family parity "
            "tests instead)")

    ckpt = checkpoint or factory.find_checkpoint(spec)
    if ckpt is None:
        raise SystemExit(f"no checkpoint found for {model_name}")
    if os.path.isdir(ckpt):
        ckpt_dir = ckpt
        ckpt = os.path.join(ckpt_dir, "model.safetensors")  # flax loader wants the file
        if not os.path.exists(ckpt):
            raise SystemExit(f"{ckpt_dir} has no model.safetensors")
    else:
        ckpt_dir = os.path.dirname(ckpt)

    img = _load_image(image)
    h, w = img.shape[:2]

    # ---- torch side: real weights through transformers ---------------------
    from transformers import AutoModelForDepthEstimation

    tmodel = AutoModelForDepthEstimation.from_pretrained(
        ckpt_dir, trust_remote_code=False, torch_dtype=torch.float32)
    tmodel.eval()

    mean, std = norm_ops.norm_constants(spec.norm_family)
    ns = _reference_predict_depth_ns(spec.metric, foreground_scale, aa_strength)
    oracle = "reference-ast" if ns is not None else "raw-forward"

    t_in = torch.from_numpy(img.copy()).permute(2, 0, 1)[None]  # [1,3,H,W] u8
    if ns is not None:
        t_res = ns["_resize_patch_aligned_t"](
            t_in, depth_resolution, spec.patch_size).to(torch.float32) / 255.0
    else:
        # identical math via this repo's parity-tested resize, then shared
        import torch.nn.functional as Fn

        nh, nw = resize.patch_aligned_size(h, w, depth_resolution,
                                           spec.patch_size)
        t_res = Fn.interpolate(t_in.float(), size=(nh, nw), mode="bicubic",
                               align_corners=False, antialias=True) / 255.0
    t_mean = torch.tensor(mean).view(1, 3, 1, 1)
    t_std = torch.tensor(std).view(1, 3, 1, 1)
    t_norm = (t_res - t_mean) / t_std
    with torch.no_grad():
        t_raw = tmodel(pixel_values=t_norm).predicted_depth  # [1,h,w]
    if ns is not None:
        import torch.nn.functional as Fn

        t_depth = ns["post_process_depth"](t_raw)
        t_depth = Fn.interpolate(t_depth[None, None], size=(h, w),
                                 mode="bilinear", align_corners=False)[0, 0]
        ref_out = t_depth.numpy()
    else:
        ref_out = t_raw[0].numpy()

    # ---- flax side: the framework's own pipeline numerics ------------------
    apply_fn, params, _ = factory.build_model(model_name, checkpoint=ckpt)
    x = jnp.asarray(img, jnp.float32)[None]  # [1,H,W,3] RGB
    x = resize.resize_patch_aligned(x, depth_resolution, spec.patch_size) / 255.0
    x = norm_ops.normalize_for_model(x, spec.norm_family)
    raw = apply_fn(params, x)  # [1,h,w]
    if ns is not None:
        d = depth_post.post_process_depth(
            raw[0], metric=spec.metric, foreground_scale=foreground_scale,
            aa_strength=aa_strength)
        d = resize.resize(d[..., None], (h, w), mode="bilinear",
                          antialias=False)[..., 0]
        got = np.asarray(d)
    else:
        got = np.asarray(raw[0])

    rel_max = float(np.abs(got - ref_out).max()
                    / max(float(np.abs(ref_out).max()), 1e-6))
    rel_mean = float(np.abs(got - ref_out).mean()
                     / max(float(np.abs(ref_out).mean()), 1e-6))
    verdict = {
        "gate": "verify-depth",
        "model": model_name,
        "checkpoint": ckpt,
        "image": image or "auto",
        "oracle": oracle,
        "depth_resolution": depth_resolution,
        "shape": list(ref_out.shape),
        "rel_err_max": rel_max,
        "rel_err_mean": rel_mean,
        "tol": tol,
        "pass": bool(rel_max <= tol),
        "egress": probe_egress(),  # why these weights are(n't) real
    }
    print(json.dumps(verdict))
    return verdict


def main() -> None:
    p = argparse.ArgumentParser(prog="d2s-convert")
    p.add_argument("--model", help="registry model name to download")
    p.add_argument("--model-path", help="local torch folder to re-serialize")
    p.add_argument("--verify", action="store_true",
                   help="convert into the flax tree and report params")
    p.add_argument("--verify-depth", action="store_true",
                   help="real-weight depth parity gate vs the reference "
                        "numerics (JSON verdict; exit 1 on fail)")
    p.add_argument("--checkpoint", help="explicit checkpoint file/dir for "
                                        "--verify-depth (else local caches)")
    p.add_argument("--image", help="test image for --verify-depth "
                                   "(default: reference cats.jpg, else synthetic)")
    p.add_argument("--tol", type=float, default=1e-2,
                   help="--verify-depth max rel-err tolerance")
    p.add_argument("--depth-res", type=int, default=518,
                   help="--verify-depth model input resolution")
    p.add_argument("--skip-download", action="store_true",
                   help="with --verify-depth: use local caches, no hub pull")
    p.add_argument("--make-random-snapshot", metavar="DIR",
                   help="write a full HF-format snapshot of --model at its "
                        "real architecture with seeded random weights into "
                        "DIR (egress-dead stand-in for the hub download; "
                        "feed it back via --checkpoint)")
    p.add_argument("--seed", type=int, default=7,
                   help="--make-random-snapshot weight seed")
    args = p.parse_args()
    if args.make_random_snapshot:
        if not args.model:
            raise SystemExit("--make-random-snapshot needs --model")
        path = make_random_snapshot(args.model, args.make_random_snapshot,
                                    seed=args.seed)
        if not args.verify_depth:
            return
        args.checkpoint = path
    if args.verify_depth:
        # force CPU before ANYTHING initializes a jax backend (--verify
        # builds the flax tree first and would otherwise pin the TPU)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.model_path:
        reserialize(args.model_path)
    if args.model:
        if not (args.verify_depth and (args.skip_download or args.checkpoint)):
            download(args.model)
        if args.verify:
            verify(args.model)
        if args.verify_depth:
            verdict = verify_depth(args.model, checkpoint=args.checkpoint,
                                   image=args.image, tol=args.tol,
                                   depth_resolution=args.depth_res)
            if not verdict["pass"]:
                sys.exit(1)
    if not args.model and not args.model_path:
        p.print_help()
        sys.exit(1)


if __name__ == "__main__":
    main()
