"""Attention micro-bench at the ViT-L/4K shape: XLA vs flash block configs,
plus the whole encoder both ways."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from desktop2stereo_tpu.core.runtime import setup_compilation_cache
import desktop2stereo_tpu.ops.attention as A
import desktop2stereo_tpu.ops.pallas.flash_attention as F

setup_compilation_cache()

B, N, H, hd = 1, 778, 16, 64
rng = np.random.default_rng(0)
q = jax.device_put(rng.standard_normal((B, N, H, hd), np.float32).astype(np.float32)).astype(jnp.bfloat16)
k = jax.device_put(rng.standard_normal((B, N, H, hd), np.float32)).astype(jnp.bfloat16)
v = jax.device_put(rng.standard_normal((B, N, H, hd), np.float32)).astype(jnp.bfloat16)

scalar = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))

def timeit(name, fn, *args, n1=30, n2=120):
    def run(n):
        t0 = time.perf_counter()
        out = args[0]
        for _ in range(n):
            out = fn(*args)
        float(scalar(out))
        return time.perf_counter() - t0
    fn(*args); run(8)
    ms = (run(n2) - run(n1)) / (n2 - n1) * 1000
    print(f"{name:34s} {ms:7.3f} ms")
    return ms

xla = jax.jit(lambda q, k, v: A.xla_attention(q, k, v))
timeit("xla_attention (1 layer)", xla, q, k, v)

for bq in (128, 256, 512):
    F.BLOCK_Q = bq
    fl = jax.jit(lambda q, k, v, _bq=bq: F.flash_attention(q, k, v))
    timeit(f"flash BLOCK_Q={bq}", fl, q, k, v)

# 24 sequential layers (closer to in-graph behavior)
def chain(fn):
    def run(q, k, v):
        out = q
        for _ in range(24):
            out = fn(out, k, v)
        return out
    return jax.jit(run)

timeit("xla x24", chain(A.xla_attention), q, k, v, n1=5, n2=20)
F.BLOCK_Q = 256
timeit("flash(256) x24", chain(lambda a, b, c: F.flash_attention(a, b, c)), q, k, v, n1=5, n2=20)
F.BLOCK_Q = 128
