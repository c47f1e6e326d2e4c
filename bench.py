"""North-star benchmark: 4K frame → depth (DA-V2 ViT-L @ 518) → Half-SBS,
the full frame program on one chip.

The LAST stdout line is the scored JSON artifact:
{"metric", "value", "unit", "vs_baseline", ...}.  (Per-stage JSON lines
stream out earlier so a truncated run still leaves a parseable line.)
vs_baseline compares against the reference's best published 4K→4K number
(18 FPS, depth-res 384, RX 9060XT — reference Benchmark.md:9; see
BASELINE.md); the north star (≥60 FPS at the much larger ViT-L) needs ~3.3×.
Because 18 FPS is an END-TO-END figure, vs_baseline is computed from
pipeline_fps_projected_pcie (device rate composed with measured frame bytes
over a production PCIe link, serial floor — full-duplex, see
project_pcie_fps); vs_baseline_device_only keeps the raw device-rate
multiplier.

The metric is the DEVICE pipeline rate: every stage the reference counts in
its FPS (preprocess → ViT-L → depth post → DIBR stereo composite) runs on
the TPU, with the next frame's program chained after the previous frame's
completion.  Host↔device copies are measured and reported separately
("tunnel_*"): this dev harness reaches the chip through a network tunnel
(~15-90 MB/s vs PCIe's ~16 GB/s on a real TPU host), so folding them into
the headline number would benchmark the tunnel, not the framework.

Process layout: the orchestrator (no TPU contact) runs each measurement
stage in its OWN subprocess — `bench.py --stage bf16` then `--stage int8`.
In-process sequencing contaminated the r03 int8 numbers (the int8 run
executed after the full bf16 bench inherited its HBM pressure and reported
model_ms 6.0 > bf16's 4.5 while ALSO reporting higher pipeline FPS —
irreconcilable); one process per measurement is the same isolation
benchmarks/families.py uses, and the TPU is held by exactly one process at
a time (stages run sequentially).

Survivability (r04 lesson — BENCH_r04.json was rc=124 with EMPTY stdout):
every child stdout line is FORWARDED AND FLUSHED the moment it arrives, so
the bf16 JSON line is on the orchestrator's stdout before the int8 stage
starts — an external `timeout` anywhere after that still leaves a
parseable artifact as the last line.  The whole run honors an internal
wall budget (D2S_BENCH_BUDGET_S, default 420 s) with prioritized
degradation: the bf16 headline is never dropped; e2e, kernel parity,
stage slopes, and the int8 stage shed themselves (with explicit
"skipped: budget" fields) as the deadline approaches.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REFERENCE_4K_FPS = 18.0  # reference Benchmark.md:9 (best 4K→4K row)

DEFAULT_BUDGET_S = float(os.environ.get("D2S_BENCH_BUDGET_S", "420"))

_DEADLINE = [None]  # per-stage wall deadline (set from --budget)


def _left() -> float:
    """Seconds remaining in this stage's wall budget (inf if unset)."""
    if _DEADLINE[0] is None:
        return float("inf")
    return _DEADLINE[0] - time.time()

PCIE_BYTES_PER_S = 16e9  # production TPU-host link (PCIe gen4 x16 ≈ 16 GB/s)


def project_pcie_fps(device_fps: float, h2d_bytes: int, d2h_bytes: int,
                     link_bytes_per_s: float = PCIE_BYTES_PER_S) -> dict:
    """Projected end-to-end FPS on a production TPU host, composing the
    measured device rate with the measured frame traffic over PCIe instead
    of this harness's network tunnel (~15-90 MB/s).

    Three compositions bound the truth:
    - serial (headline floor): every frame pays compute + transfer with NO
      compute/transfer overlap.  PCIe is full duplex — h2d and d2h ride
      separate lane directions and cannot contend — so the serial transfer
      term is max(h2d, d2h), not their sum;
    - serial half-duplex: the same floor charged as if the link were
      half-duplex (h2d + d2h summed).  Strictly pessimistic — kept so the
      r03 artifact remains comparable;
    - overlapped: h2d of frame N+1 and d2h of frame N ride alongside
      compute of frame N (the engine's actual dispatch order: async
      device_put, async dispatch, copy_to_host_async) — the ceiling.
    Real hosts land between the serial floor and the ceiling; we report all
    three and headline the (full-duplex) serial floor.
    """
    up_s = h2d_bytes / link_bytes_per_s
    down_s = d2h_bytes / link_bytes_per_s
    dev_s = 1.0 / device_fps
    return {
        "pipeline_fps_projected_pcie": round(1.0 / (dev_s + max(up_s, down_s)), 2),
        "pipeline_fps_projected_pcie_halfduplex": round(
            1.0 / (dev_s + up_s + down_s), 2),
        "pipeline_fps_projected_pcie_overlapped": round(
            1.0 / max(dev_s, up_s, down_s), 2),
        "projected_pcie_xfer_ms": round(max(up_s, down_s) * 1000, 2),
        "projected_pcie_h2d_bytes": int(h2d_bytes),
        "projected_pcie_d2h_bytes": int(d2h_bytes),
        "projected_pcie_bytes_per_frame": int(h2d_bytes + d2h_bytes),
    }


def _tpu_guard() -> None:
    """A dead axon tunnel relay makes jax.devices() hang FOREVER (no error,
    no timeout) — probe it on a daemon thread so the scored artifact
    records a diagnostic line instead of wedging the driver."""
    ready = threading.Event()

    def _probe():
        import jax as _jax

        _jax.devices()
        ready.set()

    threading.Thread(target=_probe, daemon=True).start()
    wait_s = min(240.0, max(60.0, _left() - 30.0))
    if not ready.wait(timeout=wait_s):
        print(json.dumps({
            "metric": "device_pipeline_fps_4k_halfsbs_vitl518",
            "value": None,
            "unit": "frames/sec",
            "vs_baseline": None,
            "error": f"TPU unreachable: jax.devices() did not return within "
                     f"{wait_s:.0f}s (tunnel relay down — see the verify "
                     f"skill's symptom ladder)",
        }))
        sys.stdout.flush()
        os._exit(1)  # the probe thread is unjoinably hung


def _flagship_settings():
    from desktop2stereo_tpu.core.config import Settings

    return Settings(
        model="Depth-Anything-V2-Large",
        depth_resolution=518,
        output_resolution=2160,   # 4K in → 4K out
        display_mode="Half-SBS",
        depth_strength=2.0,
    )


def _build_program(settings, policy, quant: str = "none"):
    import dataclasses

    from desktop2stereo_tpu.models.factory import build_bound
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig

    t0 = time.time()
    bound, spec = build_bound(settings.model, init_size=126,
                              **({"quant": quant} if quant != "none" else {}))
    build_s = time.time() - t0
    cfg = ProgramConfig.from_settings(settings, quality="high")
    # production sinks for this mode don't consume full-res depth
    # (sink-negotiated emit; see cli.py) — the carry and the returned depth
    # stay at model res, like the reference's pre-resize stabilizer state
    cfg = dataclasses.replace(cfg, emit_depth="model")
    program = ProgramCache(cfg, bound, spec, compute_dtype=policy.compute_dtype)
    return program, build_s


def _headline_rate(batch_fps: float, stage_ms: dict) -> dict:
    """The chained-step slope is THE declared headline estimator, every
    round (VERDICT r04 item 8): it cancels the dev tunnel's fetch RTT by
    construction and its per-repeat samples are medianed (not min'd) in
    slope_ms.  The batch-median rate rides along as a cross-check field,
    and the artifact FLAGS >10% disagreement (rate_disagreement) instead
    of silently taking the max of the two — a max over estimators is
    upward-biased and lets the headline's source flip between rounds."""
    chained = stage_ms.get("chained_ms") if isinstance(stage_ms, dict) else None
    if not chained or chained <= 0:
        return {"fps": batch_fps, "source": "batch_median (slope unavailable)",
                "disagreement_pct": None, "disagree": False}
    slope_fps = 1000.0 / chained
    disagreement = abs(slope_fps - batch_fps) / slope_fps * 100.0
    return {"fps": slope_fps, "source": "chained_slope",
            "disagreement_pct": round(disagreement, 1),
            "disagree": disagreement > 10.0}


def _measure_rate(program, frame, scalar, measure_s: float) -> tuple:
    import statistics
    import time as _t

    for _ in range(3):
        sbs, depth = program(frame)
    float(scalar(sbs))
    frames = 0
    # The data-dependent scalar fetch costs a full tunnel round-trip
    # (~30 ms on the dev harness, ~µs on a real TPU host); amortize it over
    # a large enough batch that it stays measurement noise (<0.5 ms/frame).
    # Rate = MEDIAN of per-batch rates: the dev tunnel occasionally stalls
    # one fetch for tens of seconds (relay pressure), which a wall-clock
    # total would smear across every frame (one such stall reported int8 at
    # 30 FPS with a chained_ms of 9.4 — internally impossible); the median
    # demotes a stalled batch to one discarded outlier.  At least 4
    # batches always run so the median is meaningful.
    batch = 64
    rates = []
    t_start = _t.time()
    while _t.time() - t_start < measure_s or len(rates) < 4:
        t0 = _t.time()
        for _ in range(batch):
            sbs, depth = program(frame)
            frames += 1
        float(scalar(sbs))
        rates.append(batch / (_t.time() - t0))
    elapsed = _t.time() - t_start
    return statistics.median(rates), frames, elapsed, sbs


def stage_bf16() -> dict:
    _tpu_guard()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache

    setup_compilation_cache()
    policy = detect_policy()
    settings = _flagship_settings()
    t0 = time.time()
    program, build_s = _build_program(settings, policy)

    frame_shape = (2160, 3840, 4)
    compile_report = program.warmup(frame_shape, steps=2)
    compile_s = time.time() - t0
    compile_report = dict(compile_report, build_model_s=round(build_s, 2))

    # one synthetic 4K frame resident in HBM (the capture stage's product)
    frame = jax.device_put(
        np.random.default_rng(0).integers(0, 255, frame_shape, dtype=np.uint8)
    )

    # --- device pipeline rate: frame N+1 chained after frame N -------------
    # NOTE block_until_ready does not truly block on the axon dev tunnel, so
    # sync through a data-dependent scalar fetch, amortized over batches.
    scalar = jax.jit(lambda x: x[0, 0, 0].astype(jnp.float32))
    fps, frames, elapsed, sbs = _measure_rate(program, frame, scalar, 12.0)

    # --- per-stage Amdahl breakdown + the chained whole-step slope (the
    # headline estimator) + residual: the table must reconcile with
    # frame_ms or it explains itself.  Budget-scaled repeats; the slopes
    # are only skipped when even one repeat would blow the deadline — the
    # headline then degrades to batch_median with its source labeled.
    if _left() > 150:
        slope_repeats = 3
    elif _left() > 90:
        slope_repeats = 2
    else:
        slope_repeats = 1
    if _left() > 35:
        try:
            from benchmarks._timing import stage_slopes

            stage_ms = stage_slopes(program, frame, n1=16, n2=64,
                                    repeats=slope_repeats)
        except Exception as e:
            stage_ms = {"error": f"{type(e).__name__}: {e}"}
    else:
        stage_ms = {"note": "skipped: budget"}

    batch_fps = fps
    rate = _headline_rate(batch_fps, stage_ms)
    fps = rate["fps"]

    # --- host upload overhead (tunnel on this dev harness, PCIe in prod).
    # Downloads are NOT timed: the dev tunnel's d2h path stalls for minutes
    # under HBM pressure, which would wedge the benchmark while measuring
    # nothing about the framework.  Warm scalar for this shape FIRST so a
    # first-call trace/compile never lands inside the timed region.
    h_frame = np.zeros(frame_shape, np.uint8)
    float(scalar(jax.device_put(h_frame)))
    t0 = time.time()
    float(scalar(jax.device_put(h_frame)))
    h2d_s = time.time() - t0

    # on-chip Pallas-vs-jnp parity (CLAUDE.md requires this green; all its
    # kernels hit the persistent cache on a warm host).  Shed under a
    # collapsed budget rather than lose the headline line.
    if _left() > 45:
        kernel_parity = run_kernel_parity()
    else:
        kernel_parity = "skipped: budget"

    # projected production e2e: measured device rate + measured frame bytes
    # over PCIe (what replaces this harness's tunnel on a real TPU host).
    # h2d: the 4K BGRA capture frame; d2h: the composed SBS frame (the
    # engine's sink-negotiated fetch skips depth for non-depth sinks).
    projected = project_pcie_fps(fps, h2d_bytes=frame.nbytes,
                                 d2h_bytes=sbs.nbytes)
    # the tunnel-capped FrameEngine loop is the most expendable stage
    # (VERDICT r04 degradation order: int8 slopes → e2e → bf16 slopes)
    if _left() > 75:
        e2e = run_end_to_end(program, policy,
                             duration=min(120.0, _left() - 40.0))
    else:
        e2e = {"pipeline_fps_end_to_end": None,
               "pipeline_e2e_note": "skipped: budget"}

    projected_e2e = projected["pipeline_fps_projected_pcie"]
    return {
        "metric": "device_pipeline_fps_4k_halfsbs_vitl518",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(projected_e2e / REFERENCE_4K_FPS, 3),
        "vs_baseline_device_only": round(fps / REFERENCE_4K_FPS, 3),
        "frames": frames,
        "frame_ms": round(1000.0 / fps, 2),
        "rate_source": rate["source"],
        "rate_batch_median_fps": round(batch_fps, 2),
        "rate_disagreement_pct": rate["disagreement_pct"],
        "rate_disagreement": rate["disagree"],
        "slope_repeats": slope_repeats,
        "tunnel_h2d_ms": round(h2d_s * 1000, 1),
        "platform": policy.platform,
        "devices": policy.description,
        "compile_s": round(compile_s, 1),
        "compile_breakdown_s": compile_report,
        "config": "4K synthetic -> DA-V2 ViT-L @518 (random weights, bf16) -> Half-SBS 4K",
        "kernel_parity": kernel_parity,
        "stage_ms": stage_ms,
        "depth_parity": depth_parity_status(settings.model),
        **projected,
        **e2e,
    }


def stage_int8() -> dict:
    """The same 4K→Half-SBS ViT-L pipeline with --quant int8 (encoder
    matmuls through the fused Pallas kernel), in its own process so the
    bf16 run's HBM state can't contaminate it."""
    _tpu_guard()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache

    setup_compilation_cache()
    policy = detect_policy()
    if policy.platform != "tpu":
        # off-TPU the dispatch resolves to plain XLA int8 — reporting that
        # as the fused-kernel metric would misrepresent what ran (and the
        # 64-frame batches take minutes per time check on CPU)
        return {"int8_pipeline_fps": "skipped: not tpu", "int8_stage_ms": {}}

    settings = _flagship_settings()
    program, _build_s = _build_program(settings, policy, quant="int8")
    frame_shape = (2160, 3840, 4)
    program.warmup(frame_shape, steps=2)
    frame = jax.device_put(
        np.random.default_rng(0).integers(0, 255, frame_shape, dtype=np.uint8))
    scalar = jax.jit(lambda x: x[0, 0, 0].astype(jnp.float32))
    fps, _frames, _elapsed, _sbs = _measure_rate(program, frame, scalar, 8.0)
    # int8 slopes are the FIRST thing the budget sheds (degradation order:
    # int8 slopes → e2e → bf16 slopes → never the bf16 headline)
    if _left() > 40:
        try:
            from benchmarks._timing import stage_slopes

            stage_ms = stage_slopes(program, frame, n1=16, n2=64,
                                    repeats=3 if _left() > 120 else 1)
        except Exception as e:
            stage_ms = {"error": f"{type(e).__name__}: {e}"}
    else:
        stage_ms = {"note": "skipped: budget"}
    rate = _headline_rate(fps, stage_ms)
    return {"int8_pipeline_fps": round(rate["fps"], 2),
            "int8_stage_ms": stage_ms,
            "int8_rate_source": rate["source"],
            "int8_rate_batch_median_fps": round(fps, 2),
            "int8_rate_disagreement_pct": rate["disagreement_pct"]}


def depth_parity_status(model_name: str) -> dict:
    """Explicit real-weight parity status (VERDICT r03 item 3): the
    --verify-depth gate (tools/convert.py) proves ≤1e-2 rel-err against the
    reference's own predict_depth numerics WHEN a checkpoint exists; this
    reports, in the scored artifact, whether one does.  On this harness all
    egress is blocked (DNS fails for huggingface.co/hf-mirror.com — see
    PARITY.md §real-weights), so the expected status is no_checkpoint:
    weights are random and correctness rests on the structural parity tests
    (tests/test_models_*.py, shared random weights vs the reference torch
    modules, rel-err ≤5e-4)."""
    try:
        from desktop2stereo_tpu.core.registry import get_spec
        from desktop2stereo_tpu.models.factory import find_checkpoint

        ckpt = find_checkpoint(get_spec(model_name))
        if ckpt:
            return {"status": "checkpoint_present_unverified", "path": ckpt,
                    "action": "run tools/convert.py --verify-depth"}
        return {"status": "no_checkpoint",
                "note": "egress blocked on this harness; structural parity "
                        "tests (rel-err <=5e-4 at shared random weights) "
                        "stand in — see PARITY.md"}
    except Exception as e:
        return {"status": f"error: {type(e).__name__}: {e}"}


def run_kernel_parity() -> str:
    """Compiled-on-TPU Pallas kernels vs the jnp reference paths, one real
    input each (the on-device counterpart of tests/test_pallas_kernels.py's
    interpret-mode assertions — catches Mosaic-vs-interpret divergence)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        from desktop2stereo_tpu.ops.attention import xla_attention
        from desktop2stereo_tpu.ops.pallas.flash_attention import flash_attention
        from desktop2stereo_tpu.ops.pallas.dibr import (
            dibr_render_pair, dibr_render_pair_planar, pad_planar)
        from desktop2stereo_tpu.ops import stereo as S

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2, 1370, 16, 64)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((2, 1370, 16, 64)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((2, 1370, 16, 64)), jnp.bfloat16)
        got = np.asarray(flash_attention(q, k, v), np.float32)
        want = np.asarray(xla_attention(q, k, v), np.float32)
        att_err = float(np.abs(got - want).max())
        if att_err > 5e-2:
            return f"FAIL flash_attention maxdiff {att_err:.2e}"

        H, W = 270, 480
        rgb = jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32)
        depth = jnp.asarray(rng.random((H, W)), jnp.float32)
        left, right = dibr_render_pair(rgb, depth, ipd=0.064,
                                       depth_strength=2.0, convergence=0.01)
        want_l = np.asarray(S.dibr_render(rgb, depth, -0.032, 2.0, 0.01))
        want_r = np.asarray(S.dibr_render(rgb, depth, +0.032, 2.0, 0.01))
        dibr_err = max(
            float(np.abs(np.asarray(left) - want_l).max()),
            float(np.abs(np.asarray(right) - want_r).max()),
        )
        # jnp reference runs on the same chip; bf16-matmul-free elementwise
        # math should agree to ~1e-2 in 0..255 units
        if dibr_err > 5e-1:
            return f"FAIL dibr_render_pair maxdiff {dibr_err:.2e}"

        # the PRODUCTION fused tail: each eye renders at OUTPUT (half)
        # width from a pair-mean-squeezed source, quantized in-kernel
        # (eyes_u8).  Must equal the same-width f32 eyes run + quantize
        # (±1 LSB at the round-half-up boundary).
        half = W // 2
        rgb_h = jnp.asarray(np.asarray(rgb).reshape(H, half, 2, 3).mean(2),
                            jnp.float32)
        dep_h = jnp.asarray(np.asarray(depth).reshape(H, half, 2).mean(2),
                            jnp.float32)
        rgbp, depp = pad_planar(rgb_h, dep_h)
        lq, rq = dibr_render_pair_planar(
            rgbp, depp, half, ipd=0.064, depth_strength=2.0,
            convergence=0.01, out_mode="eyes_u8")
        got = np.concatenate([np.asarray(lq)[:, :H, :half],
                              np.asarray(rq)[:, :H, :half]], axis=2)
        lf, rf = dibr_render_pair(rgb_h, dep_h, ipd=0.064,
                                  depth_strength=2.0, convergence=0.01)
        want_hwc = np.concatenate([np.asarray(lf), np.asarray(rf)], axis=1)
        want = np.clip(want_hwc + 0.5, 0.0, 255.0).astype(np.uint8)
        fused_err = int(np.abs(got.transpose(1, 2, 0).astype(np.int32)
                               - want.astype(np.int32)).max())
        if fused_err > 1:
            return f"FAIL fused eyes_u8 maxdiff {fused_err}"

        # sbs_hwc_u8 — the production mode at lane-aligned eye widths
        # (4K/1080p outputs): the kernel also does the pixel interleave, so
        # the flat rows must equal the eyes_u8 result relayouted (exact:
        # quantize commutes with the permutation).
        flat = dibr_render_pair_planar(
            rgbp, depp, half, ipd=0.064, depth_strength=2.0,
            convergence=0.01, out_mode="sbs_hwc_u8")
        got_hwc = np.asarray(flat)[:H, : 6 * half].reshape(H, 2 * half, 3)
        hwc_err = int(np.abs(got_hwc.astype(np.int32)
                             - got.transpose(1, 2, 0).astype(np.int32)).max())
        if hwc_err != 0:
            return f"FAIL sbs_hwc_u8 vs eyes_u8 maxdiff {hwc_err}"

        # eyes_hwc_u8 — the production Half-TAB tail: per-eye flat-HWC rows
        # must equal the eyes_u8 result relayouted (exact, same argument)
        l8, r8 = dibr_render_pair_planar(
            rgbp, depp, half, ipd=0.064, depth_strength=2.0,
            convergence=0.01, out_mode="eyes_hwc_u8")
        got_pair = np.concatenate(
            [np.asarray(l8)[:H, : 3 * half].reshape(H, half, 3),
             np.asarray(r8)[:H, : 3 * half].reshape(H, half, 3)], axis=1)
        ehwc_err = int(np.abs(got_pair.astype(np.int32)
                              - got.transpose(1, 2, 0).astype(np.int32)
                              ).max())
        if ehwc_err != 0:
            return f"FAIL eyes_hwc_u8 vs eyes_u8 maxdiff {ehwc_err}"

        # in-kernel per-eye edge feathering (KEY_B) vs the jnp edge_feather
        # applied to the unfeathered kernel eyes
        lf_k, rf_k = dibr_render_pair_planar(
            rgbp, depp, half, ipd=0.064, depth_strength=2.0,
            convergence=0.01, out_mode="eyes", feather=0.08, height=H)
        lp_k, rp_k = dibr_render_pair_planar(
            rgbp, depp, half, ipd=0.064, depth_strength=2.0,
            convergence=0.01, out_mode="eyes")
        feather_err = 0.0
        for got_f, plain in ((lf_k, lp_k), (rf_k, rp_k)):
            eye = np.asarray(plain).transpose(1, 2, 0)[:H, :half]
            want_f = np.asarray(S.edge_feather(jnp.asarray(eye), width=0.08))
            have_f = np.asarray(got_f).transpose(1, 2, 0)[:H, :half]
            feather_err = max(feather_err,
                              float(np.abs(have_f - want_f).max()))
        if feather_err > 5e-1:
            return f"FAIL in-kernel feather maxdiff {feather_err:.2e}"

        # fused int8 quant matmul (the --quant int8 hot path) vs the XLA
        # 3-pass formulation at a ViT-L block shape.  Same int8 operands
        # and f32 epilogue on both sides → near-exact.  Mosaic-only — on a
        # CPU smoke run the kernel can't lower, so report it skipped.
        if jax.devices()[0].platform != "tpu":
            return (f"ok (attn {att_err:.1e}, dibr {dibr_err:.1e}, "
                    f"fused_u8 {fused_err} LSB, feather {feather_err:.1e}, "
                    f"quant skipped: cpu)")
        from desktop2stereo_tpu.ops.pallas.quant_matmul import (
            quant_dense_matmul)
        from desktop2stereo_tpu.ops.quant import (
            quantize_weight, xla_quant_dense)

        xq_in = jnp.asarray(rng.standard_normal((777, 1024)) * 0.5,
                            jnp.bfloat16)
        wq, wscale = quantize_weight(
            jnp.asarray(rng.standard_normal((1024, 3072)) * 0.05,
                        jnp.float32))
        qb = jnp.asarray(rng.standard_normal(3072) * 0.1, jnp.float32)
        got_q = np.asarray(quant_dense_matmul(xq_in, wq, wscale, qb),
                           np.float32)
        want_q = np.asarray(xla_quant_dense(xq_in, wq, wscale, qb),
                            np.float32)
        quant_err = (float(np.abs(got_q - want_q).max())
                     / max(float(np.abs(want_q).max()), 1e-6))
        if quant_err > 2e-2:
            return f"FAIL quant_dense_matmul rel-err {quant_err:.2e}"

        # row_scale mode (the row-parallel TP path, ops/quant.py
        # tp_quant_dense): external full-K activation scales must reproduce
        # the oracle run at those scales
        xf = xq_in.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
        got_rs = np.asarray(quant_dense_matmul(
            xq_in, wq, wscale, qb, row_scale=sx), np.float32)
        rs_err = (float(np.abs(got_rs - want_q).max())
                  / max(float(np.abs(want_q).max()), 1e-6))
        if rs_err > 2e-2:
            return f"FAIL quant row_scale rel-err {rs_err:.2e}"

        # raw int32 accumulator mode (psum'd across row-parallel shards):
        # the MXU dot itself must be the EXACT integer product.  Use
        # exact-integer activations with scale 1.0 so in-kernel
        # quantization has no rounding ties — Mosaic's VPU division is
        # not bit-identical to IEEE, so round(x/s) near a tie can
        # legitimately differ ±1 from numpy; that belongs to the f32-mode
        # rel-err checks above, not to the accumulator-exactness claim.
        xi_np = rng.integers(-127, 128, size=(777, 1024))
        xi = jnp.asarray(xi_np, jnp.bfloat16)  # ints ≤127 exact in bf16
        ones_sx = jnp.ones((777, 1), jnp.float32)
        acc = np.asarray(quant_dense_matmul(
            xi, wq, jnp.ones((wq.shape[1],), jnp.float32),
            row_scale=ones_sx, out_dtype=jnp.int32))
        want_acc = xi_np.astype(np.int64) @ np.asarray(wq, np.int64)
        acc_err = int(np.abs(acc.astype(np.int64) - want_acc).max())
        if acc_err != 0:
            return f"FAIL quant int32 accumulator maxdiff {acc_err}"
        return (f"ok (attn {att_err:.1e}, dibr {dibr_err:.1e}, "
                f"fused_u8 {fused_err} LSB, feather {feather_err:.1e}, "
                f"quant {quant_err:.1e}, quant_rs {rs_err:.1e}, "
                f"quant_i32 {acc_err} exact)")
    except Exception as e:  # never wedge the benchmark
        return f"ERROR {type(e).__name__}: {e}"


def run_end_to_end(program, policy, duration: float = 240.0) -> dict:
    """FrameEngine capture→compute→sink rate (the reference's FPS metric,
    reference main.py:1194-1264).  On this dev harness every frame crosses
    the network tunnel twice (~15-90 MB/s vs PCIe ~16 GB/s), so the number
    is TUNNEL-capped, not framework-capped — reported alongside the device
    rate, never as the headline."""
    import threading

    from desktop2stereo_tpu.pipeline.engine import FrameEngine
    from desktop2stereo_tpu.sinks.null import NullSink
    from desktop2stereo_tpu.sources.synthetic import SyntheticSource

    try:
        # 64 processed frames or the budget-derived duration, whichever
        # first: at the tunnel's ~1 FPS that is ~1-2 min — enough samples
        # for a real median (the r02 figure came from 3 frames and
        # characterized nothing).
        source = SyntheticSource(size=(2160, 3840), max_frames=4096)
        engine = FrameEngine(source, program, NullSink(), target_fps=60.0,
                             shutdown=threading.Event())
        stats = engine.run(duration=duration, max_frames=64)
        med = stats.latency_median or {}
        return {
            "pipeline_fps_end_to_end": round(stats.fps, 2),
            "pipeline_e2e_frames": stats.frames,
            "pipeline_e2e_stage_median_ms": {
                k: round(v * 1000, 1) for k, v in med.items()
            },
            "pipeline_e2e_note": "tunnel-capped on this dev harness "
                                 "(h2d+d2h over network; see "
                                 "pipeline_fps_projected_pcie for the "
                                 "production-host projection)",
        }
    except Exception as e:
        return {"pipeline_fps_end_to_end": None,
                "pipeline_e2e_note": f"ERROR {type(e).__name__}: {e}"}


def _run_stage(stage: str, budget_s: float, timeout_s: float) -> tuple:
    """Run `bench.py --stage <stage> --budget <s>` in a fresh process,
    FORWARDING (and flushing) every child stdout line the moment it
    arrives — a driver timeout that kills this orchestrator mid-int8 still
    leaves the already-printed bf16 JSON line as a parseable artifact.

    Returns (last_parseable_json_or_None, returncode, stderr_tail)."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stage", stage,
         "--budget", f"{budget_s:.0f}"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
    )
    err_tail: list = []

    def _drain_err():
        for ln in proc.stderr:
            err_tail.append(ln.rstrip())
            del err_tail[:-8]

    drain = threading.Thread(target=_drain_err, daemon=True)
    drain.start()

    def _reap():
        # SIGTERM first: a child SIGKILLed mid-device-call can wedge the
        # next process's chip grant for ~10 min (observed on the dev
        # tunnel); give it 10 s to unwind the PJRT client cleanly
        proc.terminate()
        threading.Timer(10.0, proc.kill).start()

    killer = threading.Timer(timeout_s, _reap)
    killer.start()
    last = None
    try:
        for ln in proc.stdout:
            ln = ln.strip()
            if not ln:
                continue
            print(ln, flush=True)
            try:
                parsed = json.loads(ln)
            except ValueError:
                continue
            if isinstance(parsed, dict):   # a stray numeric/null line must
                last = parsed              # not displace the result dict
        proc.wait()
    finally:
        killer.cancel()
    drain.join(timeout=2.0)  # settle err_tail before the caller reads it
    return last, proc.returncode, err_tail


def main() -> None:
    budget = DEFAULT_BUDGET_S
    if "--budget" in sys.argv:
        budget = float(sys.argv[sys.argv.index("--budget") + 1])
        _DEADLINE[0] = time.time() + budget
    if "--stage" in sys.argv:
        stage = sys.argv[sys.argv.index("--stage") + 1]
        if stage not in ("bf16", "int8"):
            raise SystemExit(f"unknown --stage {stage!r} (valid: bf16, int8)")
        result = stage_bf16() if stage == "bf16" else stage_int8()
        print(json.dumps(result), flush=True)
        return

    # orchestrator: one process per measurement (the TPU is held by exactly
    # one child at a time; this parent never initializes jax).  The total
    # wall budget splits ~60/40 across the stages; each child degrades
    # internally against its own deadline, and its JSON line streams to
    # stdout the moment it exists.
    t_start = time.time()
    bf16_budget = budget * 0.6
    result, rc, err_tail = _run_stage("bf16", bf16_budget,
                                      timeout_s=bf16_budget + 120)
    if result is None or rc != 0:
        if result is not None:
            # child printed a diagnostic JSON line (dead-tunnel guard) —
            # it is already streamed above; exit non-zero without burying
            # it under a traceback (ADVICE r04)
            sys.exit(1)
        print(json.dumps({
            "metric": "device_pipeline_fps_4k_halfsbs_vitl518",
            "value": None, "unit": "frames/sec", "vs_baseline": None,
            "error": f"bf16 stage rc={rc}: " + " | ".join(err_tail),
        }), flush=True)
        sys.exit(1)
    remaining = budget - (time.time() - t_start)
    if remaining < 60:
        result["int8_pipeline_fps"] = "skipped: budget exhausted by bf16 stage"
        result["int8_stage_ms"] = {}
    else:
        int8_result, rc8, err8 = _run_stage("int8", remaining,
                                            timeout_s=remaining + 60)
        if int8_result is not None and rc8 == 0:
            result.update(int8_result)
        else:  # int8 is secondary — never sink the artifact
            result["int8_pipeline_fps"] = (
                f"ERROR rc={rc8}: " + " | ".join(err8[-3:]))
            result["int8_stage_ms"] = {}
    result["bench_wall_s"] = round(time.time() - t_start, 1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
