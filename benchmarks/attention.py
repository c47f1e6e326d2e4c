"""Attention micro-bench at the ViT-L/4K shape: XLA vs the Pallas flash
kernel (which picks its own query block via _pick_block_q — there is no
block-size knob to sweep anymore), single layer and a 24-layer chain."""
import jax
import jax.numpy as jnp
import numpy as np

from desktop2stereo_tpu.core.runtime import setup_compilation_cache
import desktop2stereo_tpu.ops.attention as A
import desktop2stereo_tpu.ops.pallas.flash_attention as F

try:
    from benchmarks._timing import timeit
except ImportError:  # run as `python benchmarks/attention.py`
    from _timing import timeit

setup_compilation_cache()

B, N, H, hd = 1, 778, 16, 64
rng = np.random.default_rng(0)
q = jax.device_put(rng.standard_normal((B, N, H, hd), np.float32)).astype(jnp.bfloat16)
k = jax.device_put(rng.standard_normal((B, N, H, hd), np.float32)).astype(jnp.bfloat16)
v = jax.device_put(rng.standard_normal((B, N, H, hd), np.float32)).astype(jnp.bfloat16)

xla = jax.jit(lambda q, k, v: A.xla_attention(q, k, v))
fl = jax.jit(lambda q, k, v: F.flash_attention(q, k, v))
timeit("xla_attention (1 layer)", xla, q, k, v, n1=30, n2=120)
timeit("flash_attention (1 layer)", fl, q, k, v, n1=30, n2=120)


# 24 sequential layers (closer to in-graph behavior)
def chain(fn):
    def run(q, k, v):
        out = q
        for _ in range(24):
            out = fn(out, k, v)
        return out
    return jax.jit(run)


timeit("xla x24", chain(A.xla_attention), q, k, v, n1=5, n2=20)
timeit("flash x24", chain(F.flash_attention), q, k, v, n1=5, n2=20)

# the DepthPro tile batch: many short sequences, where the XLA path's
# materialized B*H*N^2 logits are the bottleneck
qb = jax.device_put(rng.standard_normal((36, 730, 16, 64), np.float32)).astype(jnp.bfloat16)
timeit("xla  36x730 (DepthPro tiles)", xla, qb, qb, qb, n1=10, n2=40)
timeit("flash 36x730 (DepthPro tiles)", fl, qb, qb, qb, n1=10, n2=40)
