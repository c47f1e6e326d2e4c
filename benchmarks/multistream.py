"""Batched multi-stream aggregate device rate (BASELINE configs[4]).

Makes the README's multi-stream numbers reproducible: S concurrent 1080p
feeds through ONE vmapped program chain (pipeline/programs.py
BatchedProgramCache) — ViT-S @518, high-quality DIBR, Half-SBS 1080p —
measured by the repo's slope method (benchmarks/_timing.py).  Reports
per-launch ms and the aggregate FPS (S frames per launch).

Usage: python benchmarks/multistream.py [S ...]   (default 1 2 4)

Measured note (r05): the S=2 aggregate DIP below S=1 is the MODEL stage —
the raw ViT-S forward itself costs 1.49/1.84/1.44 ms per frame at XLA
batch 1/2/4 (batch-2 tiles worse on this chip; recovered by batch 4).
Per-stage slopes via `step.model_j`/`step.stages` introspection showed
pre and the vmapped Pallas tail scale linearly — the batched machinery
adds nothing; the dip is XLA's batch-2 compile.
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache

setup_compilation_cache()
policy = detect_policy()

import jax.numpy as jnp

from desktop2stereo_tpu.core.config import Settings
from desktop2stereo_tpu.models.factory import build_bound
from desktop2stereo_tpu.pipeline.programs import (BatchedProgramCache,
                                                  ProgramCache, ProgramConfig)

try:
    from benchmarks._timing import slope_ms, sync
except ImportError:
    from _timing import slope_ms, sync

H, W = 1080, 1920


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    settings = Settings(model="Depth-Anything-V2-Small", depth_resolution=518,
                        output_resolution=1080, display_mode="Half-SBS",
                        depth_strength=2.0)
    bound, spec = build_bound(settings.model, init_size=126)
    cfg = ProgramConfig.from_settings(settings, quality="high")
    cfg = dataclasses.replace(cfg, emit_depth="model")

    rng = np.random.default_rng(0)
    sync(jnp.zeros((1,)))  # pay the first-d2h tunnel stall
    for s in sizes:
        if s == 1:
            prog = ProgramCache(cfg, bound, spec,
                                compute_dtype=policy.compute_dtype)
            frame = jnp.asarray(
                rng.integers(0, 255, (H, W, 4), np.uint8))
        else:
            prog = BatchedProgramCache(cfg, bound, spec,
                                       compute_dtype=policy.compute_dtype,
                                       num_streams=s)
            frame = jnp.asarray(
                rng.integers(0, 255, (s, H, W, 4), np.uint8))
        ms = slope_ms(lambda f: prog(f)[0], frame, repeats=3)
        print(f"S={s}  {ms:7.3f} ms/launch  aggregate {s / ms * 1000:6.1f} FPS",
              flush=True)


if __name__ == "__main__":
    main()
