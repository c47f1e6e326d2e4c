"""Test configuration: force the CPU backend with a virtual 8-device mesh.

Mirrors the reference's strategy of using its CPU path as the no-GPU stand-in
(reference depth.py:603-629): all numerical-parity and sharding tests run on
CPU so CI needs no TPU; the real chip is exercised by bench.py.
"""

import os
import sys

# Repo root on sys.path so `from tests.reference_loader import ...` works
# under a bare `pytest` invocation (pytest prepends tests/, not the root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before jax initializes a backend.  APPEND to any existing
# XLA_FLAGS — setdefault would silently skip the virtual mesh when the
# host exports unrelated flags, and every sharding test would then see
# one device.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
# PyOpenGL platform latches at first import; the headless GL tests
# (tests/test_gl_theater.py, Mesa EGL surfaceless + llvmpipe) need the
# EGL platform, and no test in this suite ever has a GLX display.
os.environ.setdefault("PYOPENGL_PLATFORM", "egl")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def torch():
    import torch as _torch

    _torch.manual_seed(0)
    return _torch
