"""Where do the model stage's milliseconds go?  Encoder (ViT-L trunk) vs
DPT neck vs DPT head at the flagship 294x518 input — the int8 result
(model_ms 6.0 vs bf16 6.8 when int8 doubles MATMUL rate) says the encoder
matmuls are a minority; this measures the actual split so optimization
lands where the time is."""
import numpy as np

from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache

setup_compilation_cache()
policy = detect_policy()

import jax
import jax.numpy as jnp

from desktop2stereo_tpu.core.registry import get_spec
from desktop2stereo_tpu.models.depth_anything import DepthAnything
from desktop2stereo_tpu.models.dinov2 import Dinov2Encoder
from desktop2stereo_tpu.models.dpt import DPTHead, DPTNeck

try:
    from benchmarks._timing import timeit
except ImportError:
    from _timing import timeit

MH, MW = 294, 518
spec = get_spec("Depth-Anything-V2-Large")
model = DepthAnything.from_spec(spec)

rng = jax.random.PRNGKey(0)
pixels = jnp.asarray(
    np.random.default_rng(0).standard_normal((1, MH, MW, 3)),
    policy.compute_dtype)
params = model.init(rng, jnp.zeros((1, 126, 126, 3), policy.compute_dtype))

enc = Dinov2Encoder(
    hidden_size=model.hidden_size, num_layers=model.num_layers,
    num_heads=model.num_heads, mlp_dim=model.mlp_dim,
    out_layers=model.out_layers, patch_size=model.patch_size,
    use_swiglu=model.use_swiglu)
neck = DPTNeck(neck_channels=model.neck_channels,
               fusion_channels=model.fusion_channels)
head = DPTHead(fusion_channels=model.fusion_channels,
               head_channels=model.head_channels,
               patch_size=model.patch_size, metric=model.metric,
               max_depth=model.max_depth)

ep = {"params": params["params"]["backbone"]}
np_ = {"params": params["params"]["neck"]}
hp_ = {"params": params["params"]["head"]}

gh, gw = MH // 14, MW // 14


@jax.jit
def run_full(p, px):
    return model.apply(p, px)


@jax.jit
def run_enc(p, px):
    return enc.apply(p, px)


@jax.jit
def run_neck(p, feats):
    grids = [f[:, 1:].reshape(1, gh, gw, model.hidden_size) for f in feats]
    return neck.apply(p, grids)


@jax.jit
def run_head(p, fused):
    return head.apply(p, fused, (gh, gw))


feats = run_enc(ep, pixels)
fused = run_neck(np_, feats)

timeit("FULL model 294x518", run_full, params, pixels)
timeit("encoder (ViT-L trunk)", run_enc, ep, pixels)
timeit("neck (reassemble+fusion)", run_neck, np_, feats)
timeit("head (upsample convs)", run_head, hp_, fused[-1])
out = run_head(hp_, fused[-1])
print("head out:", out.shape, out.dtype)

# attention-dispatch A/B: the default size heuristic sends N=778 to the XLA
# path (materialized [1,16,778,778] f32 logits, ~155 MB of HBM traffic per
# layer); force the flash kernel and compare IN-GRAPH, where fusion and
# layouts are real
import desktop2stereo_tpu.ops.attention as attn_mod

attn_mod.FORCE_FLASH = True
run_enc_flash = jax.jit(lambda p, px: enc.apply(p, px))
f1 = run_enc_flash(ep, pixels)
attn_mod.FORCE_FLASH = None
timeit("encoder, flash-forced attn", run_enc_flash, ep, pixels)
import numpy as _np

d = max(float(_np.abs(_np.asarray(a, _np.float32) - _np.asarray(b, _np.float32)).max())
        for a, b in zip(feats, f1))
print("encoder xla-vs-flash maxdiff:", d)
