"""Int8 dense micro-benchmark: bf16 XLA vs 3-pass XLA int8 vs fused kernel.

Measures the QuantDense matmul at ViT-L/G layer shapes three ways:
  bf16      — plain nn.Dense-equivalent bf16 matmul (the float baseline)
  int8-xla  — quantize / int8 dot / dequant as separate XLA ops
              (ops/quant.py formulation)
  int8-fused — the Pallas kernel (ops/pallas/quant_matmul.py)

Run ON THE CHIP (one TPU process at a time):
    python benchmarks/quant_matmul.py
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import timeit  # noqa: E402
from desktop2stereo_tpu.ops.quant import quantize_weight, xla_quant_dense  # noqa: E402
from desktop2stereo_tpu.ops.pallas.quant_matmul import quant_dense_matmul  # noqa: E402

# (label, M, K, F) — ViT-L @518 (N=1370) and @294x518 (N=777) block shapes,
# plus ViT-G (DA3) and a DepthPro 36-tile batch
SHAPES = [
    ("vitl qkv  M=777",   777, 1024, 3072),
    ("vitl fc1  M=777",   777, 1024, 4096),
    ("vitl fc2  M=777",   777, 4096, 1024),
    ("vitl qkv  M=1370", 1370, 1024, 3072),
    ("vitg w12  M=1370", 1370, 1536, 8192),
    ("dpro qkv  M=26280", 26280, 1024, 3072),
]


@jax.jit
def bf16_dense(x, w, b):
    return (jnp.dot(x, w, preferred_element_type=jnp.float32)
            + b[None, :]).astype(x.dtype)


int8_xla = jax.jit(xla_quant_dense)  # the canonical 3-pass formulation


def main() -> None:
    rng = np.random.default_rng(0)
    for label, M, K, F in SHAPES:
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, F)) * 0.05, jnp.float32)
        wq, wscale = quantize_weight(w)
        b = jnp.zeros((F,), jnp.float32)
        wb = w.astype(jnp.bfloat16)

        t_bf16 = timeit(f"{label} bf16", bf16_dense, x, wb, b, repeats=3)
        t_xla = timeit(f"{label} int8-xla", int8_xla, x, wq, wscale, b,
                       repeats=3)
        t_fused = timeit(f"{label} int8-fused", quant_dense_matmul, x, wq,
                         wscale, b, repeats=3)

        got = np.asarray(quant_dense_matmul(x, wq, wscale, b), np.float32)
        want = np.asarray(int8_xla(x, wq, wscale, b), np.float32)
        err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        # timeit returns MILLISECONDS → GFLOP/ms == TFLOP/s
        tflops = 2.0 * M * K * F / 1e9 / t_fused
        print(f"  -> fused {tflops:6.1f} TFLOP/s | "
              f"vs bf16 {t_bf16 / t_fused:4.2f}x | vs int8-xla "
              f"{t_xla / t_fused:4.2f}x | parity rel-err {err:.1e}")


if __name__ == "__main__":
    main()
