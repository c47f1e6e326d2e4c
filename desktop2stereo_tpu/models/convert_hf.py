"""HF checkpoint → desktop2stereo_tpu parameter conversion.

The reference loads every DA-family model through `transformers`
(reference depth.py:1645-1662); here the same safetensors weights are mapped
into our flax trees.  The converters consume a {name: np.ndarray} dict so
they work from a live torch state_dict (tests) or a safetensors file on disk
(production) without importing torch on the TPU host.

Key transforms (torch → flax):
- Linear  (out,in)          → kernel (in,out)
- Conv2d  (out,in,kh,kw)    → kernel (kh,kw,in,out)
- ConvT2d (in,out,f,f)      → kept (in,out,f,f) for ConvTransposeSameStride
- patch conv (D,3,p,p)      → (p·p·3, D) matching PatchEmbed's (di,dj,c) order
- q/k/v Linears             → one fused qkv kernel (D, 3D)
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from desktop2stereo_tpu.core.registry import ModelSpec

Params = Dict[str, Any]


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "kernel": np.ascontiguousarray(sd[prefix + ".weight"].T),
        "bias": sd[prefix + ".bias"],
    }


def _conv(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> Params:
    out: Params = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if bias:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def to_numpy_state_dict(obj: Any) -> Dict[str, np.ndarray]:
    """torch state_dict / safetensors path → {key: float32 ndarray}.

    A path may also be a SHARDED checkpoint: the index json
    (model.safetensors.index.json) or any one shard
    (model-0000N-of-0000M.safetensors) loads and merges the whole set —
    large checkpoints (DA3-GIANT class) ship only in this layout."""
    if isinstance(obj, (str,)):
        from safetensors.numpy import load_file

        base = os.path.basename(obj)
        if base.endswith(".index.json"):
            import json as _json

            with open(obj) as f:
                idx = _json.load(f)
            d = os.path.dirname(obj)
            shards = sorted(set(idx.get("weight_map", {}).values()))
            out: Dict[str, np.ndarray] = {}
            for s in shards:
                out.update({k: np.asarray(v, dtype=np.float32)
                            for k, v in load_file(os.path.join(d, s)).items()})
            return out
        m = re.match(r"model-\d+-of-\d+\.safetensors$", base)
        if m:
            import glob as _glob

            out = {}
            for s in sorted(_glob.glob(os.path.join(
                    os.path.dirname(obj) or ".",
                    "model-*-of-*.safetensors"))):
                out.update({k: np.asarray(v, dtype=np.float32)
                            for k, v in load_file(s).items()})
            return out
        return {k: np.asarray(v, dtype=np.float32) for k, v in load_file(obj).items()}
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().float().numpy()
        out[k] = np.asarray(v, dtype=np.float32)
    return out


def convert_dinov2_backbone(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    use_swiglu: bool = False,
    prefix: str = "backbone.",
) -> Params:
    """HF Dinov2Backbone state dict slice → Dinov2Encoder params."""
    D = sd[prefix + "embeddings.cls_token"].shape[-1]
    pw = sd[prefix + "embeddings.patch_embeddings.projection.weight"]  # (D,3,p,p)
    patch_kernel = np.ascontiguousarray(
        pw.transpose(2, 3, 1, 0).reshape(-1, D)  # (p,p,3,D) → (p·p·3, D)
    )
    params: Params = {
        "embeddings": {
            "cls_token": sd[prefix + "embeddings.cls_token"],
            "position_embeddings": sd[prefix + "embeddings.position_embeddings"],
            "patch_embeddings": {
                "kernel": patch_kernel,
                "bias": sd[prefix + "embeddings.patch_embeddings.projection.bias"],
            },
        },
        "layernorm": _layernorm(sd, prefix + "layernorm"),
    }
    for i in range(num_layers):
        lp = f"{prefix}encoder.layer.{i}."
        if lp + "norm1.weight" not in sd:
            break  # converted encoder may be truncated to max(out_layers)
        qw = sd[lp + "attention.attention.query.weight"]
        kw = sd[lp + "attention.attention.key.weight"]
        vw = sd[lp + "attention.attention.value.weight"]
        qkv_kernel = np.ascontiguousarray(np.concatenate([qw, kw, vw], axis=0).T)
        qkv_bias = np.concatenate([
            sd[lp + "attention.attention.query.bias"],
            sd[lp + "attention.attention.key.bias"],
            sd[lp + "attention.attention.value.bias"],
        ])
        if use_swiglu:
            mlp = {
                "weights_in": _linear(sd, lp + "mlp.weights_in"),
                "weights_out": _linear(sd, lp + "mlp.weights_out"),
            }
        else:
            mlp = {
                "fc1": _linear(sd, lp + "mlp.fc1"),
                "fc2": _linear(sd, lp + "mlp.fc2"),
            }
        params[f"layer_{i}"] = {
            "norm1": _layernorm(sd, lp + "norm1"),
            "norm2": _layernorm(sd, lp + "norm2"),
            "attention": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "proj": _linear(sd, lp + "attention.output.dense"),
            },
            "layer_scale1": sd[lp + "layer_scale1.lambda1"],
            "layer_scale2": sd[lp + "layer_scale2.lambda1"],
            "mlp": mlp,
        }
    return params


def convert_dpt_neck(sd: Mapping[str, np.ndarray], prefix: str = "neck.") -> Params:
    params: Params = {}
    for i in range(4):
        rp = f"{prefix}reassemble_stage.layers.{i}."
        layer: Params = {"projection": _conv(sd, rp + "projection")}
        if rp + "resize.weight" in sd:
            w = sd[rp + "resize.weight"]
            if i == 3:
                # stage 3 downsamples with a stride-2 Conv2d (out,in,3,3)
                layer["resize"] = _conv(sd, rp + "resize")
            else:
                # ConvTranspose2d (in,out,f,f) kept as-is
                layer["resize"] = {"kernel": w, "bias": sd[rp + "resize.bias"]}
        params[f"reassemble_{i}"] = layer
        params[f"conv_{i}"] = _conv(sd, f"{prefix}convs.{i}", bias=False)
    for j in range(4):
        fp = f"{prefix}fusion_stage.layers.{j}."
        layer = {
            "projection": _conv(sd, fp + "projection"),
            "res2": {
                "conv1": _conv(sd, fp + "residual_layer2.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer2.convolution2"),
            },
        }
        if j > 0:
            # fusion layer 0 never receives a residual (HF calls it with
            # residual=None), so its residual_layer1 weights are dead in the
            # torch graph too — skip them to keep trees identical.
            layer["res1"] = {
                "conv1": _conv(sd, fp + "residual_layer1.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer1.convolution2"),
            }
        params[f"fusion_{j}"] = layer
    return params


def convert_dpt_head(sd: Mapping[str, np.ndarray], prefix: str = "head.") -> Params:
    return {
        "conv1": _conv(sd, prefix + "conv1"),
        "conv2": _conv(sd, prefix + "conv2"),
        "conv3": _conv(sd, prefix + "conv3"),
    }


def convert_depth_anything(state_dict: Any, spec: ModelSpec) -> Params:
    """Full HF DepthAnythingForDepthEstimation checkpoint → our param tree."""
    sd = to_numpy_state_dict(state_dict)
    _, num_layers, _, _ = spec.dims
    return {
        "backbone": convert_dinov2_backbone(
            sd, num_layers, use_swiglu=(spec.variant == "vitg")
        ),
        "neck": convert_dpt_neck(sd),
        "head": convert_dpt_head(sd),
    }


def convert_dinov2_original(
    sd: Mapping[str, np.ndarray],
    num_layers: int,
    prefix: str = "pretrained.",
) -> Params:
    """Original (non-HF) DINOv2 naming → Dinov2Encoder params.

    This is the naming the VDA checkpoints use (reference
    models/video_depth_anything/dinov2.py): blocks.{i}.attn.qkv (already
    fused), ls1/ls2.gamma LayerScale, final `norm`.
    """
    D = sd[prefix + "cls_token"].shape[-1]
    pw = sd[prefix + "patch_embed.proj.weight"]  # (D,3,p,p)
    params: Params = {
        "embeddings": {
            "cls_token": sd[prefix + "cls_token"],
            "position_embeddings": sd[prefix + "pos_embed"],
            "patch_embeddings": {
                "kernel": np.ascontiguousarray(pw.transpose(2, 3, 1, 0).reshape(-1, D)),
                "bias": sd[prefix + "patch_embed.proj.bias"],
            },
        },
        "layernorm": _layernorm(sd, prefix + "norm"),
    }
    for i in range(num_layers):
        lp = f"{prefix}blocks.{i}."
        if lp + "norm1.weight" not in sd:
            break
        params[f"layer_{i}"] = {
            "norm1": _layernorm(sd, lp + "norm1"),
            "norm2": _layernorm(sd, lp + "norm2"),
            "attention": {
                "qkv": _linear(sd, lp + "attn.qkv"),
                "proj": _linear(sd, lp + "attn.proj"),
            },
            "layer_scale1": sd[lp + "ls1.gamma"],
            "layer_scale2": sd[lp + "ls2.gamma"],
            "mlp": {
                "fc1": _linear(sd, lp + "mlp.fc1"),
                "fc2": _linear(sd, lp + "mlp.fc2"),
            },
        }
    return params


def _convert_temporal_module(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    """head.motion_modules.{m}.temporal_transformer.* → TemporalTransformer
    params (reference motion_module.py:68-190)."""
    tt = prefix + "temporal_transformer."
    params: Params = {
        "norm": _layernorm(sd, tt + "norm"),  # GroupNorm: weight/bias → scale/bias
        "proj_in": _linear(sd, tt + "proj_in"),
        "proj_out": _linear(sd, tt + "proj_out"),
    }
    bp = tt + "transformer_blocks.0."
    for a in range(2):
        ap = f"{bp}attention_blocks.{a}."
        params[f"attn_{a}"] = {
            "to_q": {"kernel": np.ascontiguousarray(sd[ap + "to_q.weight"].T)},
            "to_k": {"kernel": np.ascontiguousarray(sd[ap + "to_k.weight"].T)},
            "to_v": {"kernel": np.ascontiguousarray(sd[ap + "to_v.weight"].T)},
            "to_out": _linear(sd, ap + "to_out.0"),
        }
        params[f"norm_{a}"] = _layernorm(sd, f"{bp}norms.{a}")
    params["ff_norm"] = _layernorm(sd, bp + "ff_norm")
    params["ff_proj"] = _linear(sd, bp + "ff.net.0.proj")
    params["ff_out"] = _linear(sd, bp + "ff.net.2")
    return params


def convert_vda(state_dict: Any, spec: ModelSpec) -> Params:
    """Video-Depth-Anything checkpoint (original naming: pretrained.* +
    head.*) → VideoDepthAnything param tree."""
    sd = to_numpy_state_dict(state_dict)
    # some releases nest everything under "model."
    if not any(k.startswith("pretrained.") for k in sd) and any(
        k.startswith("model.pretrained.") for k in sd
    ):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    _, num_layers, _, _ = spec.dims

    head: Params = {}
    for i in range(4):
        layer: Params = {"projection": _conv(sd, f"head.projects.{i}")}
        if i != 2:
            rp = f"head.resize_layers.{i}"
            if i == 3:
                layer["resize"] = _conv(sd, rp)
            else:
                layer["resize"] = {
                    "kernel": sd[rp + ".weight"],  # ConvT (in,out,f,f) as-is
                    "bias": sd[rp + ".bias"],
                }
        head[f"reassemble_{i}"] = layer
        head[f"conv_{i}"] = _conv(sd, f"head.scratch.layer{i + 1}_rn", bias=False)

    # fusion_{0..3} ↔ refinenet{4..1} (coarsest first, like the HF neck)
    for j, rn in enumerate((4, 3, 2, 1)):
        fp = f"head.scratch.refinenet{rn}."
        layer = {
            "projection": _conv(sd, fp + "out_conv"),
            "res2": {
                "conv1": _conv(sd, fp + "resConfUnit2.conv1"),
                "conv2": _conv(sd, fp + "resConfUnit2.conv2"),
            },
        }
        if j > 0:  # refinenet4 never receives a residual; its unit1 is dead
            layer["res1"] = {
                "conv1": _conv(sd, fp + "resConfUnit1.conv1"),
                "conv2": _conv(sd, fp + "resConfUnit1.conv2"),
            }
        head[f"fusion_{j}"] = layer

    for m in range(4):
        head[f"temporal_{m}"] = _convert_temporal_module(
            sd, f"head.motion_modules.{m}."
        )

    head["head_conv1"] = _conv(sd, "head.scratch.output_conv1")
    head["head_conv2"] = _conv(sd, "head.scratch.output_conv2.0")
    head["head_conv3"] = _conv(sd, "head.scratch.output_conv2.2")

    return {
        "backbone": convert_dinov2_original(sd, num_layers),
        "head": head,
    }


def _convert_da3_backbone(sd: Mapping[str, np.ndarray], spec: ModelSpec,
                          anyview: bool, prefix: str) -> Params:
    """DA3 DinoVisionTransformer naming → DA3Backbone params (reference
    model/dinov2/vision_transformer.py; blocks.{i}.attn.{qkv,proj,q_norm,
    k_norm}, ls1/ls2.gamma, mlp.{fc1,fc2}|{w12,w3})."""
    hidden, num_layers, _, _ = spec.dims
    pw = sd[prefix + "patch_embed.proj.weight"]  # (D,3,p,p)
    params: Params = {
        "cls_token": sd[prefix + "cls_token"],
        "pos_embed": sd[prefix + "pos_embed"],
        "patch_kernel": np.ascontiguousarray(
            pw.transpose(2, 3, 1, 0).reshape(-1, hidden)
        ),
        "patch_bias": sd[prefix + "patch_embed.proj.bias"],
        "norm": _layernorm(sd, prefix + "norm"),
    }
    if anyview:
        params["camera_token"] = sd[prefix + "camera_token"]
    for i in range(num_layers):
        lp = f"{prefix}blocks.{i}."
        attn: Params = {
            "qkv": _linear(sd, lp + "attn.qkv"),
            "proj": _linear(sd, lp + "attn.proj"),
        }
        if lp + "attn.q_norm.weight" in sd:  # qk_norm blocks only
            attn["q_norm"] = _layernorm(sd, lp + "attn.q_norm")
            attn["k_norm"] = _layernorm(sd, lp + "attn.k_norm")
        if lp + "mlp.w12.weight" in sd:  # vitg SwiGLU
            mlp = {"w12": _linear(sd, lp + "mlp.w12"), "w3": _linear(sd, lp + "mlp.w3")}
        else:
            mlp = {"fc1": _linear(sd, lp + "mlp.fc1"), "fc2": _linear(sd, lp + "mlp.fc2")}
        params[f"layer_{i}"] = {
            "norm1": _layernorm(sd, lp + "norm1"),
            "norm2": _layernorm(sd, lp + "norm2"),
            "attention": attn,
            "layer_scale1": sd[lp + "ls1.gamma"],
            "layer_scale2": sd[lp + "ls2.gamma"],
            "mlp": mlp,
        }
    return params


def _convert_da3_fusion_chain(sd: Mapping[str, np.ndarray], prefix: str,
                              aux: bool) -> Params:
    """refinenet{4..1}(_aux) → fusion(_aux)_{0..3}; refinenet4 has no
    resConfUnit1 (DA3 builds it with has_residual=False)."""
    tag = "_aux" if aux else ""
    chain: Params = {}
    for j, rnum in enumerate((4, 3, 2, 1)):
        fp = f"{prefix}refinenet{rnum}{tag}."
        layer: Params = {
            "projection": _conv(sd, fp + "out_conv"),
            "res2": {
                "conv1": _conv(sd, fp + "resConfUnit2.conv1"),
                "conv2": _conv(sd, fp + "resConfUnit2.conv2"),
            },
        }
        if j > 0:
            layer["res1"] = {
                "conv1": _conv(sd, fp + "resConfUnit1.conv1"),
                "conv2": _conv(sd, fp + "resConfUnit1.conv2"),
            }
        chain[f"fusion{tag}_{j}"] = layer
    return chain


def convert_da3(state_dict: Any, spec: ModelSpec) -> Params:
    """DepthAnything3 checkpoint (PyTorchModelHubMixin: model.backbone.
    pretrained.* / model.head.* / model.cam_dec.*) → our param tree."""
    sd = to_numpy_state_dict(state_dict)
    for p in ("model.", ""):
        if any(k.startswith(p + "backbone.") for k in sd):
            sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
            break
    anyview = "MONO" not in spec.name.upper() and not (
        "METRIC" in spec.name.upper() and "NESTED" not in spec.name.upper()
    )

    head: Params = {"reassemble": {}}
    hp = "head."
    if anyview:
        head["reassemble"]["norm"] = _layernorm(sd, hp + "norm")
    for i in range(4):
        head["reassemble"][f"project_{i}"] = _conv(sd, f"{hp}projects.{i}")
        if i in (0, 1):
            head["reassemble"][f"resize_{i}"] = {
                "kernel": sd[f"{hp}resize_layers.{i}.weight"],
                "bias": sd[f"{hp}resize_layers.{i}.bias"],
            }
        elif i == 3:
            head["reassemble"]["resize_3"] = _conv(sd, f"{hp}resize_layers.3")
        head[f"conv_{i}"] = _conv(sd, f"{hp}scratch.layer{i + 1}_rn", bias=False)

    sp = hp + "scratch."
    head["main"] = _convert_da3_fusion_chain(sd, sp, aux=False)
    head["head_conv1"] = _conv(sd, sp + "output_conv1")
    head["head_conv2"] = _conv(sd, sp + "output_conv2.0")
    head["head_conv3"] = _conv(sd, sp + "output_conv2.2")

    if anyview:
        head["aux"] = _convert_da3_fusion_chain(sd, sp, aux=True)
        for k in range(5):
            head[f"aux_conv1_{k}"] = _conv(sd, f"{sp}output_conv1_aux.3.{k}")
        head["aux_conv2"] = _conv(sd, sp + "output_conv2_aux.3.0")
        head["aux_ln"] = _layernorm(sd, sp + "output_conv2_aux.3.2")
        head["aux_conv3"] = _conv(sd, sp + "output_conv2_aux.3.5")
    else:
        head["sky_conv2"] = _conv(sd, sp + "sky_output_conv2.0")
        head["sky_conv3"] = _conv(sd, sp + "sky_output_conv2.2")

    params: Params = {
        "backbone": _convert_da3_backbone(sd, spec, anyview, "backbone.pretrained."),
        "head": head,
    }
    if anyview and "cam_dec.fc_t.weight" in sd:
        params["cam_dec"] = {
            "fc0": _linear(sd, "cam_dec.backbone.0"),
            "fc1": _linear(sd, "cam_dec.backbone.2"),
            "fc_t": _linear(sd, "cam_dec.fc_t"),
            "fc_qvec": _linear(sd, "cam_dec.fc_qvec"),
            "fc_fov": _linear(sd, "cam_dec.fc_fov.0"),
        }
    return params


def convert_infinidepth(state_dict: Any, spec: ModelSpec) -> Params:
    """InfiniDepth checkpoint (pretrained.* dinov3 + basic_encoder.* +
    depth_implicit_head.*) → our param tree (reference model/model.py:63-118
    load path)."""
    from desktop2stereo_tpu.models.infinidepth import DINOV3_CONFIGS, ENCODER_BY_NAME

    sd = to_numpy_state_dict(state_dict)
    if any(k.startswith("model.pretrained.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    encoder = ENCODER_BY_NAME.get(spec.name, "vitl16")
    D, depth, _, _, swiglu = DINOV3_CONFIGS[encoder]

    bp = "pretrained."
    pw = sd[bp + "patch_embed.proj.weight"]
    backbone: Params = {
        "cls_token": sd[bp + "cls_token"],
        "storage_tokens": sd[bp + "storage_tokens"],
        "patch_kernel": np.ascontiguousarray(pw.transpose(2, 3, 1, 0).reshape(-1, D)),
        "patch_bias": sd[bp + "patch_embed.proj.bias"],
        "norm": _layernorm(sd, bp + "norm"),
    }
    for i in range(depth):
        lp = f"{bp}blocks.{i}."
        qkv_w = np.ascontiguousarray(sd[lp + "attn.qkv.weight"].T)
        qkv_b = sd.get(lp + "attn.qkv.bias")
        mask = sd.get(lp + "attn.qkv.bias_mask")
        if qkv_b is not None and mask is not None:
            # mask_k_bias: the k-section bias is masked out at runtime
            # (reference dinov3/layers/attention.py:45-55) — fold it here.
            qkv_b = qkv_b * np.nan_to_num(mask, nan=1.0)
        if swiglu:
            mlp = {
                "w1": _linear(sd, lp + "mlp.w1"),
                "w2": _linear(sd, lp + "mlp.w2"),
                "w3": _linear(sd, lp + "mlp.w3"),
            }
        else:
            mlp = {"fc1": _linear(sd, lp + "mlp.fc1"), "fc2": _linear(sd, lp + "mlp.fc2")}
        backbone[f"layer_{i}"] = {
            "norm1": _layernorm(sd, lp + "norm1"),
            "norm2": _layernorm(sd, lp + "norm2"),
            "qkv": {"kernel": qkv_w, **({"bias": qkv_b} if qkv_b is not None else {})},
            "proj": _linear(sd, lp + "attn.proj"),
            "layer_scale1": sd[lp + "ls1.gamma"],
            "layer_scale2": sd[lp + "ls2.gamma"],
            **mlp,  # Dinov3Block creates fc1/fc2 (or w1/w2/w3) flat
        }

    be = "basic_encoder."
    basic: Params = {
        "conv1": _conv(sd, be + "conv1"),
        "conv2": _conv(sd, be + "conv2"),
        "conv3": _conv(sd, be + "conv3"),
    }
    for li in range(1, 5):
        for bi in range(2):
            blk: Params = {
                "conv1": _conv(sd, f"{be}layer{li}.{bi}.conv1"),
                "conv2": _conv(sd, f"{be}layer{li}.{bi}.conv2"),
            }
            dkey = f"{be}layer{li}.{bi}.downsample.0.weight"
            if dkey in sd:
                blk["downsample"] = _conv(sd, f"{be}layer{li}.{bi}.downsample.0")
            basic[f"layer{li}_{bi}"] = blk

    hp = "depth_implicit_head.out_layer.layers."
    head: Params = {
        "mlp_0": _linear(sd, hp + "0"),
        "mlp_1": _linear(sd, hp + "2"),
        "mlp_2": _linear(sd, hp + "4"),
        "mlp_out": _linear(sd, hp + "6"),
    }
    return {"backbone": backbone, "basic_encoder": basic, "head": head}


def convert_dpt_vit(state_dict: Any, spec: ModelSpec) -> Params:
    """HF DPTForDepthEstimation (non-hybrid ViT, e.g. Intel/dpt-large) →
    DPTViT params."""
    from desktop2stereo_tpu.models.dpt_vit import DPT_VIT_PRESETS

    sd = to_numpy_state_dict(state_dict)
    D, num_layers, _, _, _ = DPT_VIT_PRESETS[spec.variant]

    ep = "dpt.embeddings."
    pw = sd[ep + "patch_embeddings.projection.weight"]  # (D,3,p,p)
    params: Params = {
        "cls_token": sd[ep + "cls_token"],
        "position_embeddings": sd[ep + "position_embeddings"],
        "patch_kernel": np.ascontiguousarray(pw.transpose(2, 3, 1, 0).reshape(-1, D)),
        "patch_bias": sd[ep + "patch_embeddings.projection.bias"],
    }
    for i in range(num_layers):
        lp = f"dpt.encoder.layer.{i}."
        qw = sd[lp + "attention.attention.query.weight"]
        kw = sd[lp + "attention.attention.key.weight"]
        vw = sd[lp + "attention.attention.value.weight"]
        params[f"layer_{i}"] = {
            "norm1": _layernorm(sd, lp + "layernorm_before"),
            "norm2": _layernorm(sd, lp + "layernorm_after"),
            "qkv": {
                "kernel": np.ascontiguousarray(np.concatenate([qw, kw, vw], axis=0).T),
                "bias": np.concatenate([
                    sd[lp + "attention.attention.query.bias"],
                    sd[lp + "attention.attention.key.bias"],
                    sd[lp + "attention.attention.value.bias"],
                ]),
            },
            "proj": _linear(sd, lp + "attention.output.dense"),
            "fc1": _linear(sd, lp + "intermediate.dense"),
            "fc2": _linear(sd, lp + "output.dense"),
        }

    params["decoder"] = convert_classic_dpt_decoder(sd)
    return params


def _convert_beit_backbone(sd: Mapping[str, np.ndarray], D: int, num_layers: int,
                           prefix: str = "backbone.") -> Params:
    pw = sd[prefix + "embeddings.patch_embeddings.projection.weight"]
    backbone: Params = {
        "cls_token": sd[prefix + "embeddings.cls_token"],
        "patch_kernel": np.ascontiguousarray(pw.transpose(2, 3, 1, 0).reshape(-1, D)),
        "patch_bias": sd[prefix + "embeddings.patch_embeddings.projection.bias"],
    }
    for i in range(num_layers):
        lp = f"{prefix}encoder.layer.{i}."
        ap = lp + "attention.attention."
        backbone[f"layer_{i}"] = {
            "norm1": _layernorm(sd, lp + "layernorm_before"),
            "norm2": _layernorm(sd, lp + "layernorm_after"),
            "query": _linear(sd, ap + "query"),
            "key": {"kernel": np.ascontiguousarray(sd[ap + "key.weight"].T)},
            "value": _linear(sd, ap + "value"),
            "relative_position_bias": {
                "relative_position_bias_table": sd[ap + "relative_position_bias.relative_position_bias_table"],
            },
            "proj": _linear(sd, lp + "attention.output.dense"),
            "fc1": _linear(sd, lp + "intermediate.dense"),
            "fc2": _linear(sd, lp + "output.dense"),
            "lambda_1": sd[lp + "lambda_1"],
            "lambda_2": sd[lp + "lambda_2"],
        }
    return backbone


def convert_dpt_dinov2(state_dict: Any, spec: ModelSpec) -> Params:
    """HF DPTForDepthEstimation + Dinov2Backbone (facebook/dpt-dinov2-*)
    → DPTDinov2 params: the dinov2 trunk converts with the same layout as
    DepthAnything's (prefix "backbone."), the readout-project neck/head
    with the classic-DPT decoder mapping."""
    sd = to_numpy_state_dict(state_dict)
    _, num_layers, _, _ = spec.dims
    return {
        "backbone": convert_dinov2_backbone(sd, num_layers,
                                            prefix="backbone."),
        "decoder": convert_classic_dpt_decoder(sd),
    }


def convert_dpt_beit(state_dict: Any, spec: ModelSpec) -> Params:
    """HF DPTForDepthEstimation + BeitBackbone (Intel/dpt-beit-*) →
    DPTBEiT params."""
    from desktop2stereo_tpu.models.beit import BEIT_PRESETS

    sd = to_numpy_state_dict(state_dict)
    D, num_layers, _, _, _, _ = BEIT_PRESETS[spec.name if spec.name in BEIT_PRESETS else "zoedepth"]
    return {
        "backbone": _convert_beit_backbone(sd, D, num_layers),
        "decoder": convert_classic_dpt_decoder(sd),
    }


def _convert_projector(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {"conv1": _conv(sd, prefix + "conv1"), "conv2": _conv(sd, prefix + "conv2")}


def convert_zoedepth(state_dict: Any, spec: ModelSpec) -> Params:
    """HF ZoeDepthForDepthEstimation (Intel/zoedepth-*) → ZoeDepth params."""
    from desktop2stereo_tpu.models.beit import BEIT_PRESETS
    from desktop2stereo_tpu.models.zoedepth import ZOE_PRESETS

    sd = to_numpy_state_dict(state_dict)
    preset = spec.name if spec.name in ZOE_PRESETS else "zoedepth-nyu"
    configs, multi = ZOE_PRESETS[preset]
    D, num_layers, _, _, _, _ = BEIT_PRESETS.get(preset, BEIT_PRESETS["zoedepth"])

    decoder = convert_classic_dpt_decoder(sd, head_prefix=None)
    decoder["head_conv1"] = _conv(sd, "relative_head.conv1")
    decoder["head_conv2"] = _conv(sd, "relative_head.conv2")
    decoder["head_conv3"] = _conv(sd, "relative_head.conv3")

    mh: Params = {"conv2": _conv(sd, "metric_head.conv2")}
    if not multi:
        mh["seed_bin_regressor"] = _convert_projector(sd, "metric_head.seed_bin_regressor.")
        mh["seed_projector"] = _convert_projector(sd, "metric_head.seed_projector.")
        for i in range(4):
            mh[f"projector_{i}"] = _convert_projector(sd, f"metric_head.projectors.{i}.")
            mh[f"attractor_{i}"] = _convert_projector(sd, f"metric_head.attractors.{i}.")
        mh["conditional_log_binomial"] = {
            "mlp_conv1": _conv(sd, "metric_head.conditional_log_binomial.mlp.0"),
            "mlp_conv2": _conv(sd, "metric_head.conditional_log_binomial.mlp.2"),
        }
    else:
        mh["seed_projector"] = _convert_projector(sd, "metric_head.seed_projector.")
        for i in range(4):
            mh[f"projector_{i}"] = _convert_projector(sd, f"metric_head.projectors.{i}.")
        for name, *_ in configs:
            mh[f"seed_bin_regressor_{name}"] = _convert_projector(
                sd, f"metric_head.seed_bin_regressors.{name}.")
            for i in range(4):
                mh[f"attractor_{name}_{i}"] = _convert_projector(
                    sd, f"metric_head.attractors.{name}.{i}.")
            mh[f"conditional_log_binomial_{name}"] = {
                "mlp_conv1": _conv(sd, f"metric_head.conditional_log_binomial.{name}.mlp.0"),
                "mlp_conv2": _conv(sd, f"metric_head.conditional_log_binomial.{name}.mlp.2"),
            }
        pt: Params = {
            "embedding": _conv(sd, "metric_head.patch_transformer.embedding_convPxP"),
        }
        for li in range(4):
            tp = f"metric_head.patch_transformer.transformer_encoder.{li}."
            pt[f"q_{li}"] = _linear(sd, tp + "self_attn.query")
            pt[f"k_{li}"] = _linear(sd, tp + "self_attn.key")
            pt[f"v_{li}"] = _linear(sd, tp + "self_attn.value")
            pt[f"out_{li}"] = _linear(sd, tp + "self_attn.out_proj")
            pt[f"fc1_{li}"] = _linear(sd, tp + "linear1")
            pt[f"fc2_{li}"] = _linear(sd, tp + "linear2")
            pt[f"norm1_{li}"] = _layernorm(sd, tp + "norm1")
            pt[f"norm2_{li}"] = _layernorm(sd, tp + "norm2")
        mh["patch_transformer"] = pt
        mh["classifier_fc1"] = _linear(sd, "metric_head.mlp_classifier.linear1")
        mh["classifier_fc2"] = _linear(sd, "metric_head.mlp_classifier.linear2")

    return {
        "backbone": _convert_beit_backbone(sd, D, num_layers),
        "decoder": decoder,
        "metric_head": mh,
    }


def convert_classic_dpt_decoder(
    sd: Mapping[str, np.ndarray], head_prefix: Optional[str] = "head.head.",
) -> Params:
    """HF DPTNeck (readout-project) + DPTDepthEstimationHead →
    ClassicDPTDecoder params (shared by dpt-large, dpt-beit and the
    ZoeDepth relative head; pass head_prefix=None to skip the head)."""
    np_ = "neck."
    dec: Params = {}
    for i in range(4):
        dec[f"readout_{i}"] = _linear(sd, f"{np_}reassemble_stage.readout_projects.{i}.0")
        rp = f"{np_}reassemble_stage.layers.{i}."
        layer: Params = {"projection": _conv(sd, rp + "projection")}
        if rp + "resize.weight" in sd:
            if i == 3:
                layer["resize"] = _conv(sd, rp + "resize")
            else:
                layer["resize"] = {
                    "kernel": sd[rp + "resize.weight"],
                    "bias": sd[rp + "resize.bias"],
                }
        dec[f"reassemble_{i}"] = layer
        dec[f"conv_{i}"] = _conv(sd, f"{np_}convs.{i}", bias=False)
    for j in range(4):
        fp = f"{np_}fusion_stage.layers.{j}."
        layer = {
            "projection": _conv(sd, fp + "projection"),
            "res2": {
                "conv1": _conv(sd, fp + "residual_layer2.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer2.convolution2"),
            },
        }
        if j > 0:
            layer["res1"] = {
                "conv1": _conv(sd, fp + "residual_layer1.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer1.convolution2"),
            }
        dec[f"fusion_{j}"] = layer

    if head_prefix is not None:
        dec["head_conv1"] = _conv(sd, head_prefix + "0")
        dec["head_conv2"] = _conv(sd, head_prefix + "2")
        dec["head_conv3"] = _conv(sd, head_prefix + "4")
    return dec


def convert_dpt_hybrid(state_dict: Any, spec: ModelSpec,
                       depths=(3, 4, 9), num_layers: int = 12) -> Params:
    """HF DPTForDepthEstimation(is_hybrid=True) → DPTHybrid params."""
    sd = to_numpy_state_dict(state_dict)

    def gn(prefix):
        return {"norm": _layernorm(sd, prefix)}  # GroupNorm: weight/bias → scale/bias

    bp = "dpt.embeddings.backbone.bit."
    bit: Params = {
        "stem": {
            "conv": {"kernel": np.ascontiguousarray(
                sd[bp + "embedder.convolution.weight"].transpose(2, 3, 1, 0))},
            "norm": gn(bp + "embedder.norm"),
        },
    }
    for s, depth in enumerate(depths):
        for l in range(depth):
            lp = f"{bp}encoder.stages.{s}.layers.{l}."
            layer: Params = {}
            for ci in (1, 2, 3):
                layer[f"conv{ci}"] = {"kernel": np.ascontiguousarray(
                    sd[lp + f"conv{ci}.weight"].transpose(2, 3, 1, 0))}
                layer[f"norm{ci}"] = gn(lp + f"norm{ci}")
            if lp + "downsample.conv.weight" in sd:
                layer["downsample_conv"] = {"kernel": np.ascontiguousarray(
                    sd[lp + "downsample.conv.weight"].transpose(2, 3, 1, 0))}
                layer["downsample_norm"] = gn(lp + "downsample.norm")
            bit[f"stage{s}_layer{l}"] = layer

    params: Params = {
        "bit": bit,
        "projection": _conv(sd, "dpt.embeddings.projection"),
        "cls_token": sd["dpt.embeddings.cls_token"],
        "position_embeddings": sd["dpt.embeddings.position_embeddings"],
    }
    for i in range(num_layers):
        lp = f"dpt.encoder.layer.{i}."
        qw = sd[lp + "attention.attention.query.weight"]
        kw = sd[lp + "attention.attention.key.weight"]
        vw = sd[lp + "attention.attention.value.weight"]
        params[f"layer_{i}"] = {
            "norm1": _layernorm(sd, lp + "layernorm_before"),
            "norm2": _layernorm(sd, lp + "layernorm_after"),
            "qkv": {
                "kernel": np.ascontiguousarray(np.concatenate([qw, kw, vw], 0).T),
                "bias": np.concatenate([
                    sd[lp + "attention.attention.query.bias"],
                    sd[lp + "attention.attention.key.bias"],
                    sd[lp + "attention.attention.value.bias"],
                ]),
            },
            "proj": _linear(sd, lp + "attention.output.dense"),
            "fc1": _linear(sd, lp + "intermediate.dense"),
            "fc2": _linear(sd, lp + "output.dense"),
        }

    for si in (2, 3):
        params[f"readout_{si}"] = _linear(
            sd, f"neck.reassemble_stage.readout_projects.{si}.0")
        rp = f"neck.reassemble_stage.layers.{si}."
        layer = {"projection": _conv(sd, rp + "projection")}
        if rp + "resize.weight" in sd:  # stage 3 stride-2 conv
            layer["resize"] = _conv(sd, rp + "resize")
        params[f"reassemble_{si}"] = layer
    for i in range(4):
        params[f"conv_{i}"] = _conv(sd, f"neck.convs.{i}", bias=False)
    for j in range(4):
        fp = f"neck.fusion_stage.layers.{j}."
        layer = {
            "projection": _conv(sd, fp + "projection"),
            "res2": {
                "conv1": _conv(sd, fp + "residual_layer2.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer2.convolution2"),
            },
        }
        if j > 0:
            layer["res1"] = {
                "conv1": _conv(sd, fp + "residual_layer1.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer1.convolution2"),
            }
        params[f"fusion_{j}"] = layer
    params["head_conv1"] = _conv(sd, "head.head.0")
    params["head_conv2"] = _conv(sd, "head.head.2")
    params["head_conv3"] = _conv(sd, "head.head.4")
    return params


def convert_depthpro(state_dict: Any, spec: ModelSpec, num_layers: int = 24,
                     n_scaled: int = 3, n_hooks: int = 2) -> Params:
    """HF DepthProForDepthEstimation → DepthPro params (FOV branch weights
    are skipped; the stereo pipeline consumes depth only)."""
    sd = to_numpy_state_dict(state_dict)

    params: Params = {
        "patch_encoder": convert_dinov2_backbone(
            sd, num_layers, prefix="depth_pro.encoder.patch_encoder.model."),
        "image_encoder": convert_dinov2_backbone(
            sd, num_layers, prefix="depth_pro.encoder.image_encoder.model."),
    }

    up = "depth_pro.neck.feature_upsample."

    def upsample_block(prefix: str, n_layers: int, bias: bool) -> Params:
        block: Params = {}
        for li in range(n_layers):
            w = sd[f"{prefix}layers.{li}.weight"]
            if w.ndim == 4 and w.shape[2] == 1 and w.shape[3] == 1:
                # 1x1 projection Conv2d (out,in,1,1)
                entry: Params = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
            else:
                # ConvTranspose2d (in,out,2,2) kept as-is
                entry = {"kernel": w}
            if bias and f"{prefix}layers.{li}.bias" in sd:
                entry["bias"] = sd[f"{prefix}layers.{li}.bias"]
            block[f"layers_{li}"] = entry
        return block

    params["image_block"] = upsample_block(up + "image_block.", 1, bias=True)
    for i in range(n_scaled):
        params[f"scaled_{i}"] = upsample_block(up + f"scaled_images.{i}.", 2, bias=False)
    for i in range(n_hooks):
        params[f"intermediate_{i}"] = upsample_block(
            up + f"intermediate.{i}.", 3 + i, bias=False)
    params["fuse_image_low_res"] = _conv(sd, "depth_pro.neck.fuse_image_with_low_res")
    for i in range(4):
        key = f"depth_pro.neck.feature_projection.projections.{i}.weight"
        if key in sd:
            params[f"projection_{i}"] = _conv(
                sd, f"depth_pro.neck.feature_projection.projections.{i}", bias=False)

    n_fusion = n_scaled + n_hooks
    for j in range(n_fusion - 1):
        fp = f"fusion_stage.intermediate.{j}."
        layer: Params = {
            "res2": {
                "conv1": _conv(sd, fp + "residual_layer2.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer2.convolution2"),
            },
            "deconv": {"kernel": sd[fp + "deconv.weight"]},
            "projection": _conv(sd, fp + "projection"),
        }
        if j > 0:  # first fusion layer never receives a residual
            layer["res1"] = {
                "conv1": _conv(sd, fp + "residual_layer1.convolution1"),
                "conv2": _conv(sd, fp + "residual_layer1.convolution2"),
            }
        params[f"fusion_{j}"] = layer
    fp = "fusion_stage.final."
    params["fusion_final"] = {
        "res1": {
            "conv1": _conv(sd, fp + "residual_layer1.convolution1"),
            "conv2": _conv(sd, fp + "residual_layer1.convolution2"),
        },
        "res2": {
            "conv1": _conv(sd, fp + "residual_layer2.convolution1"),
            "conv2": _conv(sd, fp + "residual_layer2.convolution2"),
        },
        "projection": _conv(sd, fp + "projection"),
    }

    params["head_conv1"] = _conv(sd, "head.layers.0")
    params["head_deconv"] = {
        "kernel": sd["head.layers.1.weight"],
        "bias": sd["head.layers.1.bias"],
    }
    params["head_conv2"] = _conv(sd, "head.layers.2")
    params["head_conv3"] = _conv(sd, "head.layers.4")
    return params


def param_count(params: Params) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
