"""Test configuration: force the CPU backend with a virtual 8-device mesh.

Mirrors the reference's strategy of using its CPU path as the no-GPU stand-in
(reference depth.py:603-629): all numerical-parity and sharding tests run on
CPU so CI needs no TPU; the real chip is exercised by bench.py.
"""

import os

# Must be set before jax initializes a backend.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

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
