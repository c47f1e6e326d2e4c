"""Model registry: friendly name → family + architecture description.

Covers the reference's MODEL_MAPPING catalogue (reference utils.py:732-817)
but instead of mapping to HuggingFace repo ids alone, each entry carries the
structural facts the TPU build needs to construct the network without
instantiating torch: family, ViT variant, patch size, normalization family,
metric-ness, and which HF repo the weights convert from.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

# ViT variant dims: (hidden, layers, heads, mlp_dim)
VIT_VARIANTS = {
    "vits": (384, 12, 6, 1536),
    "vitsplus": (384, 12, 6, 2304),  # dinov3 vits16plus: ffn_ratio 6, SwiGLU
    "vitb": (768, 12, 12, 3072),
    "vitl": (1024, 24, 16, 4096),
    "vitg": (1536, 40, 24, 6144),  # dinov2 giant uses SwiGLU ffn
}

# Which encoder layers feed the DPT neck, per variant
# (reference models/video_depth_anything/vda2_s.py:53-57 and the DA family's
# HF configs: vits/vitb take the last 4 of 12, vitl [4,11,17,23], vitg
# [9,19,29,39]; 0-indexed layer outputs).
DPT_LAYER_IDS = {
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
    "vitg": (9, 19, 29, 39),
}

# DPT neck channel pyramid per variant (HF DepthAnythingConfig.neck_hidden_sizes)
NECK_CHANNELS = {
    "vits": (48, 96, 192, 384),
    "vitb": (96, 192, 384, 768),
    "vitl": (256, 512, 1024, 1024),
    "vitg": (384, 768, 1536, 1536),
}
FUSION_CHANNELS = {"vits": 64, "vitb": 128, "vitl": 256, "vitg": 384}


@dataclass(frozen=True)
class ModelSpec:
    name: str
    family: str          # "depth_anything" | "vda" | "da3" | "infinidepth" | "dpt" | "zoedepth" | "depthpro"
    variant: str         # vits/vitb/vitl/vitg
    hf_repo: str
    patch_size: int = 14
    metric: bool = False
    max_depth: float = 1.0            # metric models scale sigmoid output
    norm_family: str = "imagenet"     # "imagenet" (DA) or "half" (DPT/ZoeDepth/DepthPro, mean=std=0.5)
    # Per-model resolution menu (reference settings.yaml:5-314); None = any
    # patch-aligned resolution.
    resolutions: Optional[Tuple[int, ...]] = None
    square_only: bool = False         # DepthPro-style fixed square input
    # Model-quirk analog of the reference's FORCE_FP32_KEYWORDS
    # (reference utils.py:234-238): ZoeDepth's metric-bins head loses its
    # attractor precision below f32, so these models opt out of bf16 compute.
    force_fp32: bool = False

    @property
    def dims(self) -> Tuple[int, int, int, int]:
        return VIT_VARIANTS[self.variant]

    @property
    def dpt_layers(self) -> Tuple[int, ...]:
        return DPT_LAYER_IDS[self.variant]

    @property
    def neck_channels(self) -> Tuple[int, ...]:
        return NECK_CHANNELS[self.variant]

    @property
    def fusion_channels(self) -> int:
        return FUSION_CHANNELS[self.variant]


def _da(name: str, variant: str, repo: str, metric: bool = False, max_depth: float = 1.0) -> ModelSpec:
    return ModelSpec(name=name, family="depth_anything", variant=variant, hf_repo=repo,
                     metric=metric, max_depth=max_depth)


_SIZE = {"small": "vits", "base": "vitb", "large": "vitl", "giant": "vitg"}

MODEL_REGISTRY: Dict[str, ModelSpec] = {}


def _register(spec: ModelSpec) -> None:
    MODEL_REGISTRY[spec.name] = spec


# --- Depth-Anything V2 (relative + metric) --------------------------------
for size in ("Small", "Base", "Large"):
    v = _SIZE[size.lower()]
    _register(_da(f"Depth-Anything-V2-{size}", v, f"depth-anything/Depth-Anything-V2-{size}-hf"))
    _register(_da(f"Depth-Anything-V2-Metric-Outdoor-{size}", v,
                  f"depth-anything/Depth-Anything-V2-Metric-Outdoor-{size}-hf",
                  metric=True, max_depth=80.0))
    _register(_da(f"Depth-Anything-V2-Metric-Indoor-{size}", v,
                  f"depth-anything/Depth-Anything-V2-Metric-Indoor-{size}-hf",
                  metric=True, max_depth=20.0))

# --- Depth-Anything V1 (LiheYoung) -----------------------------------------
for size in ("small", "base", "large"):
    _register(_da(f"depth-anything-{size}", _SIZE[size], f"LiheYoung/depth-anything-{size}-hf"))
_register(_da("depth-anything-indoor-large", "vitl", "lc700x/depth-anything-indoor-large-hf", metric=True))
_register(_da("depth-anything-outdoor-large", "vitl", "lc700x/depth-anything-outdoor-large-hf", metric=True))

# --- Distill-Any-Depth ------------------------------------------------------
for size in ("Small", "Base", "Large"):
    repo_owner = "lc700x" if size == "Base" else "xingyang1"
    _register(_da(f"Distill-Any-Depth-{size}", _SIZE[size.lower()],
                  f"{repo_owner}/Distill-Any-Depth-{size}-hf"))

# --- DPT-DINOv2 (KITTI / NYU; metric) --------------------------------------
for size in ("small", "base", "large", "giant"):
    for ds in ("kitti", "nyu"):
        _register(ModelSpec(
            name=f"dpt-dinov2-{size}-{ds}", family="dpt_dinov2", variant=_SIZE[size],
            hf_repo=f"facebook/dpt-dinov2-{size}-{ds}", metric=True,
            norm_family="half", max_depth=1.0))

# --- Video-Depth-Anything (streaming temporal) ------------------------------
for size in ("Small", "Base", "Large"):
    _register(ModelSpec(
        name=f"Video-Depth-Anything-{size}", family="vda", variant=_SIZE[size.lower()],
        hf_repo=f"depth-anything/Video-Depth-Anything-{size}"))
    _register(ModelSpec(
        name=f"Metric-Video-Depth-Anything-{size}", family="vda", variant=_SIZE[size.lower()],
        hf_repo=f"depth-anything/Metric-Video-Depth-Anything-{size}", metric=True))

# --- Depth-Anything 3 -------------------------------------------------------
for size in ("SMALL", "BASE", "LARGE", "GIANT"):
    _register(ModelSpec(
        name=f"DA3-{size}", family="da3", variant=_SIZE[size.lower()],
        hf_repo=f"depth-anything/DA3-{size}", metric=True))
_register(ModelSpec(name="DA3METRIC-LARGE", family="da3", variant="vitl",
                    hf_repo="depth-anything/DA3METRIC-LARGE", metric=True))
_register(ModelSpec(name="DA3MONO-LARGE", family="da3", variant="vitl",
                    hf_repo="depth-anything/DA3MONO-LARGE", metric=True))
_register(ModelSpec(name="DA3NESTED-GIANT-LARGE", family="da3", variant="vitg",
                    hf_repo="depth-anything/DA3NESTED-GIANT-LARGE-1.1", metric=True))

# --- InfiniDepth (DINOv3 + implicit head) -----------------------------------
# norm_family "none": the model normalizes internally from RGB [0,1]
# (reference depth.py:1945); SmallPlus = dinov3 vits16plus (384d SwiGLU).
for size, variant in (("Small", "vits"), ("SmallPlus", "vitsplus"), ("Base", "vitb"), ("Large", "vitl")):
    _register(ModelSpec(
        name=f"InfiniDepth-{size}", family="infinidepth", variant=variant,
        hf_repo=f"lc700x/InfiniDepth-{size}", patch_size=16, norm_family="none"))

# --- Other DPT/BEiT/ZoeDepth/DepthPro families ------------------------------
_register(ModelSpec(name="dpt-hybrid-midas", family="dpt_hybrid", variant="vitb",
                    hf_repo="lc700x/dpt-hybrid-midas-hf", norm_family="half", patch_size=16))
_register(ModelSpec(name="dpt-large", family="dpt", variant="vitl",
                    hf_repo="Intel/dpt-large", norm_family="half", patch_size=16))
# the reference author's retrained dpt-large (same architecture, different
# weights; reference utils.py:808)
_register(ModelSpec(name="dpt-large-redesign", family="dpt", variant="vitl",
                    hf_repo="lc700x/dpt-large-redesign-hf", norm_family="half",
                    patch_size=16))
_register(ModelSpec(name="dpt-beit-base-384", family="dpt_beit", variant="vitb",
                    hf_repo="Intel/dpt-beit-base-384", norm_family="half", patch_size=16))
_register(ModelSpec(name="dpt-beit-large-512", family="dpt_beit", variant="vitl",
                    hf_repo="Intel/dpt-beit-large-512", norm_family="half", patch_size=16))
# ZoeDepth rides on BEiT-large-384: neck (256,512,1024,1024), fusion 256
# the metric-bins head promotes itself to f32 internally (models/
# zoedepth.py), so the BEiT trunk rides the session compute dtype
for ds in ("nyu-kitti", "nyu", "kitti"):
    _register(ModelSpec(name=f"zoedepth-{ds}", family="zoedepth", variant="vitl",
                        hf_repo=f"Intel/zoedepth-{ds}", metric=True, norm_family="half", patch_size=16))
_register(ModelSpec(name="DepthPro-Large", family="depthpro", variant="vitl",
                    hf_repo="apple/DepthPro-hf", metric=True, norm_family="half",
                    square_only=True, resolutions=(1536,)))
_register(_da("depth-ai", "vitl", "lc700x/depth-ai-hf", metric=True))


# --- Per-model resolution menus ---------------------------------------------
# The GUI's per-model depth-resolution dropdown (reference settings.yaml:
# 5-314).  Four menu shapes cover every listed model; families the reference
# leaves unlisted (classic DPT/BEiT/ZoeDepth) get a patch-16 ladder.
_DA_MENU = (196, 238, 294, 336, 392, 448, 518)      # patch-14 DA/VDA/Distill
_DA3_MENU = (182, 224, 280, 322, 378, 434, 504)     # patch-14 DA3 spread
_INFINI_MENU = (192, 240, 304, 336, 384, 448, 512)  # patch-16 InfiniDepth
_P16_MENU = (256, 320, 384, 448, 512)               # classic DPT-era models

_FAMILY_MENUS = {
    "depth_anything": _DA_MENU, "dpt_dinov2": _DA_MENU, "vda": _DA_MENU,
    "da3": _DA3_MENU, "infinidepth": _INFINI_MENU,
    "dpt": _P16_MENU, "dpt_hybrid": _P16_MENU, "dpt_beit": _P16_MENU,
    "zoedepth": _P16_MENU,
}
for _name, _spec in list(MODEL_REGISTRY.items()):
    if _spec.resolutions is None and _spec.family in _FAMILY_MENUS:
        MODEL_REGISTRY[_name] = dataclasses.replace(
            _spec, resolutions=_FAMILY_MENUS[_spec.family])


def get_spec(name: str) -> ModelSpec:
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(MODEL_REGISTRY)}") from None


def is_metric(name: str) -> bool:
    """Mirrors the reference's keyword sniff (reference depth.py:666-669)."""
    return get_spec(name).metric


def effective_compute_dtype(spec: ModelSpec, policy_dtype, quiet: bool = False):
    """The model-quirk table applied to the runtime dtype policy (reference
    utils.py:234-238 FORCE_FP32_KEYWORDS): force-fp32 models override the
    platform's bf16 default.  Single source of truth for the CLI, the AOT
    compiler, and the depth debug harness — their numbers must agree."""
    import jax.numpy as jnp

    if spec.force_fp32 and policy_dtype != jnp.float32:
        if not quiet:
            print(f"[d2s] {spec.name}: forcing fp32 compute (model quirk)")
        return jnp.float32
    return policy_dtype
