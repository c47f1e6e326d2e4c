"""Hoist big trace-time constants out of jitted programs, into arguments.

Why this exists: the frame programs bake resize weight matrices (built in
numpy at trace time, ops/resize.py) into their HLO as inline constants —
~10-25 MB per 4K program.  Inline constants ride inside the executable and
upload to the device at first execution over the embedding-grade path
(~1 MB/s measured through the dev-harness tunnel, vs ~77 MB/s for a
device_put argument — a 70x penalty), and they bloat the HLO (21 MB text
for the 4K preprocess), slowing hashing/serialization in the persistent
compilation cache.  The reference never meets this problem because torch
keeps `F.interpolate` weights implicit; an XLA-native design must keep big
host-built tables OUT of the program — the same rule BoundModel applies to
model params (pipeline/programs.py:64-77).

Mechanism (two-pass, contextvar-scoped so concurrent traces can't race):

  1. collect: `jax.eval_shape(f, *args)` with the pool in collect mode;
     every `hoist_const(arr)` site records its array and returns it inline
     (eval_shape never compiles, so this is milliseconds).
  2. replay: the real `jax.jit` traces `f` with the pool in replay mode;
     each `hoist_const` site consumes the next entry of an extra
     runtime-argument pytree instead of embedding the array.

Trace order is deterministic for fixed input shapes (the sites depend on
shapes only), so collect and replay see the same sequence; replay asserts
shape/dtype per site to catch drift.
"""

from __future__ import annotations

import contextvars
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_POOL: contextvars.ContextVar = contextvars.ContextVar(
    "d2s_hoist_pool", default=None)


class _Collect:
    def __init__(self) -> None:
        self.consts: List[np.ndarray] = []

    def take(self, arr: np.ndarray) -> jax.Array:
        self.consts.append(np.asarray(arr))
        return jnp.asarray(arr)


class _Replay:
    def __init__(self, tracers) -> None:
        self._it = iter(tracers)

    def take(self, arr: np.ndarray) -> jax.Array:
        t = next(self._it)
        if tuple(t.shape) != tuple(arr.shape) or t.dtype != arr.dtype:
            raise AssertionError(
                f"hoist replay drift: site wants {arr.shape}/{arr.dtype}, "
                f"collected {t.shape}/{t.dtype} — trace order must be "
                "shape-deterministic")
        return t


def hoist_const(arr: np.ndarray) -> jax.Array:
    """Use at a trace-time constant-creation site (instead of jnp.asarray)
    for arrays big enough to matter.  Outside a HoistedJit trace this is
    exactly jnp.asarray."""
    pool = _POOL.get()
    if pool is None:
        return jnp.asarray(arr)
    return pool.take(arr)


class HoistedJit:
    """Drop-in for `jax.jit(f)` (positional args, no donation) whose
    compiled programs receive hoist_const arrays as runtime arguments.

    Shape-specializes like jit: one (collect, jit-trace, device consts)
    entry per input (shape, dtype) signature.  Consts are created
    UNCOMMITTED (jnp.asarray) so a mesh-jitted caller can replicate them
    without device-mismatch errors."""

    __slots__ = ("_f", "_cache")

    def __init__(self, f: Callable) -> None:
        self._f = f
        self._cache: Dict[Tuple, Tuple[Callable, Tuple]] = {}

    def __call__(self, *args):
        leaves = jax.tree_util.tree_leaves(args)
        key = tuple(
            (tuple(getattr(l, "shape", ())), str(getattr(l, "dtype", type(l))))
            for l in leaves)
        ent = self._cache.get(key)
        if ent is None:
            col = _Collect()
            tok = _POOL.set(col)
            try:
                jax.eval_shape(self._f, *args)
            finally:
                _POOL.reset(tok)

            f = self._f

            def replayed(args_, consts_):
                rep = _Replay(consts_)
                tok = _POOL.set(rep)
                try:
                    return f(*args_)
                finally:
                    _POOL.reset(tok)

            cd = tuple(jnp.asarray(c) for c in col.consts)
            ent = self._cache[key] = (jax.jit(replayed), cd)
        jf, cd = ent
        return jf(args, cd)


def hjit(f: Callable) -> HoistedJit:
    return HoistedJit(f)
