"""Model factory: registry name → (apply_fn, params).

Plays the role of the reference's DepthModelWrapper loader
(reference depth.py:1539-1662): resolve the family, find weights
(local safetensors / HF cache dir / random init for benchmarking), and
return a pure apply function ready to be closed over by the jitted frame
program.  No torch import on this path — conversion reads safetensors
directly.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from desktop2stereo_tpu.models.init_util import jit_init

from desktop2stereo_tpu.core.registry import ModelSpec, get_spec

ApplyFn = Callable[[jax.Array], jax.Array]

# Reference keeps converted checkpoints in ./models (reference utils.py:836)
DEFAULT_WEIGHTS_DIRS = ("./models", os.path.expanduser("~/.cache/desktop2stereo_tpu/models"))

# Families whose ViT encoder runs int8 under --quant int8 (the TRT INT8
# engine analog, reference depth.py:1049-1118).  Every family qualifies:
# the conv stems / DPT decoders / metric heads stay float everywhere.
QUANT_FAMILIES = frozenset(
    {"depth_anything", "dpt_dinov2", "vda", "depthpro", "da3",
     "infinidepth", "dpt", "dpt_beit", "dpt_hybrid", "zoedepth"})


def _resolve_in_dir(d: str) -> Optional[str]:
    """model.safetensors in `d`, or the shard set of a SHARDED checkpoint
    (models above ~5 GB ship as model-0000N-of-0000M.safetensors with an
    index json and NO single file — DA3-GIANT/NESTED class): returns the
    index json if present, else the first shard (the converter globs its
    siblings)."""
    single = os.path.join(d, "model.safetensors")
    if os.path.exists(single):
        return single
    idx = os.path.join(d, "model.safetensors.index.json")
    if os.path.exists(idx):
        return idx
    import glob as _glob

    shards = sorted(_glob.glob(os.path.join(d, "model-*-of-*.safetensors")))
    return shards[0] if shards else None


def find_checkpoint(spec: ModelSpec) -> Optional[str]:
    """Locate a local safetensors checkpoint for the spec — single-file OR
    sharded (cache-first, like the reference's HF local-cache lookup,
    reference depth.py:498-526)."""
    repo_flat = spec.hf_repo.replace("/", "--")
    dirs = []
    for d in DEFAULT_WEIGHTS_DIRS:
        dirs += [os.path.join(d, repo_flat), os.path.join(d, spec.name)]
        flat = os.path.join(d, f"{spec.name}.safetensors")
        if os.path.exists(flat):
            return flat
    hf_cache = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    hub_dir = os.path.join(hf_cache, "hub", f"models--{repo_flat}", "snapshots")
    if os.path.isdir(hub_dir):
        for snap in sorted(os.listdir(hub_dir)):
            dirs.append(os.path.join(hub_dir, snap))
    for d in dirs:
        if os.path.isdir(d):
            hit = _resolve_in_dir(d)
            if hit is not None:
                return hit
    return None


def build_model(
    name: str,
    checkpoint: Optional[str] = None,
    param_dtype=jnp.float32,
    rng_seed: int = 0,
    init_size: Optional[int] = None,
    quant: str = "none",
) -> Tuple[ApplyFn, Any, ModelSpec]:
    """Returns (apply_fn, params, spec).  apply_fn(pixels_nhwc) -> depth[B,h,w].

    Weights resolution order: explicit `checkpoint` → local caches → random
    init (benchmark/CI mode, prints a warning).

    quant="int8" (QUANT_FAMILIES): encoder block matmuls run
    int8×int8→int32 on the MXU (2× the bf16 rate on v5e) with weights
    quantized at load — the reference's TRT INT8 engine analog
    (reference depth.py:1049-1118 builder flags).
    """
    spec = get_spec(name)
    if quant not in ("none", "int8"):
        raise ValueError(f"unknown quant mode {quant!r} (none|int8)")

    if spec.family == "dpt_dinov2":
        # facebook/dpt-dinov2-* are DPTForDepthEstimation with a Dinov2
        # backbone — readout-project neck + classic DPT head, NOT the
        # DepthAnything decoder (mis-routed pre-r05; parity-tested vs the
        # torch module in tests/test_models_dpt_dinov2.py)
        from desktop2stereo_tpu.models.dpt_vit import build_dpt_dinov2

        return build_dpt_dinov2(spec, checkpoint=checkpoint,
                                param_dtype=param_dtype, rng_seed=rng_seed,
                                init_size=init_size, quant=quant)

    if spec.family == "depth_anything":
        from desktop2stereo_tpu.models.depth_anything import DepthAnything
        from desktop2stereo_tpu.models.convert_hf import convert_depth_anything

        use_quant = quant == "int8"
        model = DepthAnything.from_spec(spec, quant=use_quant)
        ckpt = checkpoint or find_checkpoint(spec)
        if ckpt is not None:
            params = {"params": convert_depth_anything(ckpt, spec)}
        else:
            size = init_size or (spec.patch_size * 10)
            # init with the FLOAT model — quantize_tree produces the
            # int8 kernel_q/scale structure the quant model consumes
            float_model = DepthAnything.from_spec(spec) if use_quant else model
            params = jit_init(float_model,
                              jnp.zeros((1, size, size, 3), jnp.float32),
                              rng_seed=rng_seed)
            print(f"[models] no checkpoint found for {name}; using random init")
        params = jax.tree.map(lambda p: jnp.asarray(p, param_dtype), params)
        if use_quant:
            from desktop2stereo_tpu.ops.quant import quantize_tree

            params = quantize_tree(params)
        return model.apply, params, spec

    if quant != "none" and spec.family not in QUANT_FAMILIES:
        raise NotImplementedError(
            f"--quant {quant} is implemented for families "
            f"{sorted(QUANT_FAMILIES)}; {name} is family {spec.family!r}")

    if spec.family == "vda":
        from desktop2stereo_tpu.models.vda import build_vda

        return build_vda(spec, checkpoint, param_dtype, rng_seed,
                         init_size=init_size, quant=quant == "int8")

    if spec.family == "da3":
        from desktop2stereo_tpu.models.da3 import build_da3, build_da3_nested

        if "NESTED" in spec.name.upper():
            if quant != "none":
                raise NotImplementedError(
                    "--quant is not supported for the NESTED preset "
                    "(two aligned branches); use DA3METRIC/DA3-* instead")
            return build_da3_nested(spec, checkpoint, param_dtype, rng_seed, init_size)
        return build_da3(spec, checkpoint, param_dtype, rng_seed, init_size,
                         quant=quant == "int8")

    use_quant = quant == "int8"
    if spec.family == "infinidepth":
        from desktop2stereo_tpu.models.infinidepth import build_infinidepth

        return build_infinidepth(spec, checkpoint, param_dtype, rng_seed,
                                 init_size, quant=use_quant)

    if spec.family == "dpt":
        from desktop2stereo_tpu.models.dpt_vit import build_dpt_vit

        return build_dpt_vit(spec, checkpoint, param_dtype, rng_seed,
                             init_size, quant=use_quant)

    if spec.family == "dpt_beit":
        from desktop2stereo_tpu.models.beit import build_dpt_beit

        return build_dpt_beit(spec, checkpoint, param_dtype, rng_seed,
                              init_size, quant=use_quant)

    if spec.family == "dpt_hybrid":
        from desktop2stereo_tpu.models.dpt_hybrid import build_dpt_hybrid

        return build_dpt_hybrid(spec, checkpoint, param_dtype, rng_seed,
                                init_size, quant=use_quant)

    if spec.family == "zoedepth":
        from desktop2stereo_tpu.models.zoedepth import build_zoedepth

        return build_zoedepth(spec, checkpoint, param_dtype, rng_seed,
                              init_size, quant=use_quant)

    if spec.family == "depthpro":
        from desktop2stereo_tpu.models.depthpro import build_depthpro

        return build_depthpro(spec, checkpoint, param_dtype, rng_seed,
                              init_size, quant=quant == "int8")

    raise NotImplementedError(f"model family {spec.family!r} ({name}) is not implemented")


def build_bound(
    name: str,
    checkpoint: Optional[str] = None,
    param_dtype=jnp.float32,
    rng_seed: int = 0,
    init_size: Optional[int] = None,
    quant: str = "none",
):
    """Registry name → (BoundModel, spec) for the frame program.

    The BoundModel carries params EXPLICITLY so the frame program passes
    them as jit arguments (closing them over embeds the weights as HLO
    constants and blows compile time, see programs.BoundModel).  Streaming
    models (VDA) expose first/step carrying the rolling-window state
    (plays the role of the reference's per-model wrapper dispatch,
    reference depth.py:1763-1781).
    """
    spec = get_spec(name)
    from desktop2stereo_tpu.pipeline.programs import BoundModel

    if quant != "none" and spec.family not in QUANT_FAMILIES:
        raise NotImplementedError(
            f"--quant {quant} is implemented for families "
            f"{sorted(QUANT_FAMILIES)}; {name} is family {spec.family!r}")

    if spec.family == "vda":
        from desktop2stereo_tpu.models.vda import (
            VideoDepthAnything,
            build_vda,
            make_vda_fns,
        )

        use_quant = quant == "int8"
        _, params, spec = build_vda(spec, checkpoint, param_dtype, rng_seed,
                                    init_size, quant=use_quant)
        model = VideoDepthAnything.from_spec(spec, quant=use_quant)
        _, first, step = make_vda_fns(model)
        return BoundModel(params=params, first=first, step=step), spec

    if spec.family == "dpt_beit":
        # BEiT's per-layer rel-pos bias construction costs ~0.3 ms/layer on
        # device; compute once per capture shape and carry as model state.
        from desktop2stereo_tpu.models.beit import (
            DPTBEiT,
            build_dpt_beit,
            make_beit_stream_fns,
        )

        use_quant = quant == "int8"
        _, params, spec = build_dpt_beit(spec, checkpoint, param_dtype,
                                         rng_seed, init_size, quant=use_quant)
        model = DPTBEiT.from_spec(spec, quant=use_quant)
        first, step = make_beit_stream_fns(model, spec, spec.name)
        return BoundModel(params=params, first=first, step=step), spec

    if spec.family == "zoedepth":
        from desktop2stereo_tpu.models.zoedepth import (
            ZoeDepth,
            build_zoedepth,
            make_zoe_stream_fns,
        )

        use_quant = quant == "int8"
        _, params, spec = build_zoedepth(spec, checkpoint, param_dtype,
                                         rng_seed, init_size, quant=use_quant)
        model = ZoeDepth.from_spec(spec, quant=use_quant)
        first, step = make_zoe_stream_fns(model, spec)
        return BoundModel(params=params, first=first, step=step), spec

    apply_fn, params, spec = build_model(name, checkpoint, param_dtype,
                                         rng_seed, init_size, quant=quant)
    return BoundModel.stateless(apply_fn, params), spec
