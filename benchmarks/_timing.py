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

    With repeats > 1, takes the MEDIAN of the positive slopes; tunnel
    jitter can make a single slope estimate zero or negative (which would
    print nonsense FPS downstream), so non-positive samples are dropped,
    but among the positive ones the median is unbiased — best-of-repeats
    systematically undershot the true per-call time and, stacked with a
    max-of-estimators headline, inflated the scored metric (ADVICE r04).
    """
    import statistics

    def run(n: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    fn(*args)          # compile
    run(warmup)
    samples = []
    for _ in range(max(1, repeats)):
        ms = (run(n2) - run(n1)) / (n2 - n1) * 1000
        if ms > 0:
            samples.append(ms)
    if not samples:
        raise RuntimeError(
            f"slope_ms: no positive slope in {repeats} runs (tunnel jitter "
            f"swamped the measurement; raise n2 or repeats)")
    return statistics.median(samples)


def timeit(name: str, fn, *args, n1: int = 20, n2: int = 60,
           repeats: int = 1) -> float:
    ms = slope_ms(fn, *args, n1=n1, n2=n2, repeats=repeats)
    print(f"{name:34s} {ms:7.3f} ms", flush=True)
    return ms


def stage_slopes(prog, frame, n1: int = 20, n2: int = 60,
                 repeats: int = 3) -> dict:
    """Per-stage milliseconds of a ProgramCache's CURRENT variant — the
    Amdahl breakdown behind any whole-pipeline number (pre / model / tail,
    or pre / model / post / stereo on the generic tail).

    Stateless models only: a stateful model's carry is donated per call,
    so replaying one stage with a fixed state argument would reuse donated
    buffers."""
    import jax.numpy as jnp

    if getattr(prog, "_stateful", False):
        return {"note": "stateful model: per-stage split skipped "
                        "(donated temporal carry)"}
    step = prog._step
    stages = getattr(step, "stages", None)
    model_j = getattr(step, "model_j", None)
    if stages is None or model_j is None:
        return {"note": "program has no staged split (eager/batched mode)"}
    params = getattr(prog._model_apply, "params", ())

    pre = stages[0]
    rgb_pre, model_in = pre(frame)
    out = {"pre_ms": round(slope_ms(lambda f: pre(f), frame,
                                    n1=n1, n2=n2, repeats=repeats), 3)}
    raw, _ = model_j(params, model_in, ())
    # the EMA carry lives at MODEL res (== the raw depth's shape)
    ema = jnp.full(raw.shape, jnp.nan, jnp.float32)
    out["model_ms"] = round(slope_ms(
        lambda mi: model_j(params, mi, ())[0], model_in,
        n1=n1, n2=n2, repeats=repeats), 3)
    if len(stages) == 2:  # fused Pallas stereo tail
        tail = stages[1]
        out["tail_ms"] = round(slope_ms(
            lambda r: tail(r, ema, rgb_pre)[0], raw,
            n1=n1, n2=n2, repeats=repeats), 3)
    else:
        post, stereo = stages[1], stages[2]
        small = post(raw, ema)
        out["post_ms"] = round(slope_ms(
            lambda r: post(r, ema), raw,
            n1=n1, n2=n2, repeats=repeats), 3)
        out["stereo_ms"] = round(slope_ms(
            lambda d: stereo(rgb_pre, d), small,
            n1=n1, n2=n2, repeats=repeats), 3)
    # the whole chained step at the same methodology: the Amdahl table must
    # reconcile — frame_ms ≈ chained_ms, residual = chained − Σ(stages) is
    # the inter-program dispatch + state-plumbing cost, reported explicitly
    from desktop2stereo_tpu.pipeline.programs import FrameState

    st = FrameState(ema_depth=ema, model=())
    out["chained_ms"] = round(slope_ms(
        lambda f: step(f, st)[0], frame, n1=n1, n2=n2, repeats=repeats), 3)
    parts = [v for k, v in out.items()
             if k.endswith("_ms") and k != "chained_ms"]
    out["residual_ms"] = round(out["chained_ms"] - sum(parts), 3)
    return out
