"""Activation helpers shared by every model family.

gelu(): the HF torch modules the reference loads use exact erf-GELU
(reference models/**/modeling_*.py nn.GELU default), and erf is the single
most expensive elementwise op on a TPU VPU — XLA lowers it to a long
polynomial that cannot fuse into the MXU epilogue.  Measured on v5e at the
flagship ViT-L geometry (benchmarks/encoder_split.py, in-graph A/B deltas,
one process): exact-erf GELU costs 1.03 ms of the encoder's 5.15 ms frame
time; the tanh form costs ~0.06 ms.  Accuracy (measured elementwise over
±12, tests/test_activations.py): the tanh form's ANALYTIC error is
≤4.8e-4 absolute, and computed in bf16 arithmetic the total error stays
within ONE bf16 ULP of the output wherever |out| > 0.5 (indistinguishable
from the rounding bf16 already performs) and ≤3.4e-3 absolute in the
near-zero tail (the bf16 cancellation knee of 1+tanh) — under half the
bf16 LSB at unit scale, so downstream matmul sums see sub-quantization
noise.  So:

- half/bfloat16 inputs (the TPU production path) take the tanh form;
- f32/f64 (the CPU torch-parity path, tests/test_models_*.py, the golden
  regression, and the --verify-depth gate) keep exact erf, bit-identical
  to before.

The sigmoid form (x*sigmoid(1.702x)) measured SLOWER than tanh (4.21 vs
4.18 ms encoder) and is 40x less accurate — not used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_APPROX_DTYPES = (jnp.bfloat16, jnp.float16)


def gelu(x: jax.Array) -> jax.Array:
    """Exact-GELU semantics, at tanh cost on the low-precision path."""
    approx = x.dtype in _APPROX_DTYPES
    return jax.nn.gelu(x, approximate=approx)
