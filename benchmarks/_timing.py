"""Shared device-timing helpers for every benchmark in this directory.

The repo's timing methodology lives HERE, once:

- **Sync via a data-dependent scalar fetch.**  `jax.block_until_ready` does
  not truly block through the axon dev tunnel, so correct timing forces a
  round-trip that depends on the computed data (fetch one element).
- **Slope method.**  The fetch RTT is ~30 ms on the tunnel — amortize it
  by timing two loop lengths and differencing:
  ms = (t(n2) - t(n1)) / (n2 - n1).  Each t(n) issues n dispatches and ends
  with one scalar fetch, so the RTT cancels in the difference.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

_scalar = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))


def sync(out) -> float:
    """Force completion of `out` (any pytree of arrays) via a
    data-dependent scalar fetch; returns the fetched value."""
    return float(_scalar(jax.tree_util.tree_leaves(out)[0]))


def slope_ms(fn, *args, n1: int = 20, n2: int = 60, warmup: int = 4,
             repeats: int = 1) -> float:
    """Per-call milliseconds of fn(*args) by the slope method.

    With repeats > 1, takes the best POSITIVE slope of `repeats` runs;
    tunnel jitter can make a single slope estimate zero or negative, which
    would print nonsense FPS downstream.
    """
    def run(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    fn(*args)          # compile
    run(warmup)
    best = None
    for _ in range(max(1, repeats)):
        ms = (run(n2) - run(n1)) / (n2 - n1) * 1000
        if ms > 0 and (best is None or ms < best):
            best = ms
    if best is None:
        raise RuntimeError(
            f"slope_ms: no positive slope in {repeats} runs (tunnel jitter "
            f"swamped the measurement; raise n2 or repeats)")
    return best


def timeit(name: str, fn, *args, n1: int = 20, n2: int = 60,
           repeats: int = 1) -> float:
    ms = slope_ms(fn, *args, n1=n1, n2=n2, repeats=repeats)
    print(f"{name:34s} {ms:7.3f} ms", flush=True)
    return ms
