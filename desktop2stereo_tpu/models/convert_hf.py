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

import re
from typing import Any, Dict, Mapping

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
    """torch state_dict / safetensors path → {key: float32 ndarray}."""
    if isinstance(obj, (str,)):
        from safetensors.numpy import load_file

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


def param_count(params: Params) -> int:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
