"""Command-line runner: the reference's `main.py` orchestrator as a CLI.

`python -m desktop2stereo_tpu.cli --source synthetic --sink mjpeg ...`

Lifecycle mirrors the reference (reference main.py:264-387, 1390-1402):
SIGINT/SIGTERM → shutdown event → drain stages → cleanup, a `stop.request`
file watcher for GUI-style control, and a hard-exit watchdog so a wedged
runtime cannot orphan the process.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import threading
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="d2s-tpu", description="TPU-native 2D→3D stereo pipeline"
    )
    p.add_argument("--settings", help="settings.yaml (reference-compatible)")
    p.add_argument("--model", help="model name from the registry")
    p.add_argument("--source", default=None,
                   help="synthetic|image|video|screen|shm|tcp[:PORT]. "
                        "tcp listens for a remote capture agent "
                        "(tools/capture_agent.py --connect HOST:PORT). "
                        "default: screen when --settings is given (the "
                        "reference app's behavior), else synthetic")
    p.add_argument("--input", help="path for image/video sources")
    p.add_argument("--window-title",
                   help="screen source: capture the window whose title "
                        "contains this substring (tracked on move/resize)")
    p.add_argument("--no-cursor", action="store_true",
                   help="screen source: do not composite the mouse cursor")
    p.add_argument("--monitor", type=int, default=None,
                   help="screen source: capture this monitor index "
                        "(0 = primary/whole root)")
    p.add_argument("--audio", default="auto",
                   help="rtmp sink: 'auto' (system audio if present), "
                        "'none', or an explicit pulse device name")
    p.add_argument("--sink", default=None,
                   help="one of mjpeg|png|video|null|rtmp|viewer|window|xr, "
                        "or a comma list to tee (e.g. xr,mjpeg). default: "
                        "derived from the settings 'Run Mode' when "
                        "--settings is given, else mjpeg")
    p.add_argument("--show-fps", action="store_true",
                   help="green FPS overlay on the output (viewer sink)")
    p.add_argument("--feather", action="store_true",
                   help="per-eye edge feathering (the reference viewer's "
                        "KEY_B effect; toggle live with 'b' in the window "
                        "sink or GET /feather on the MJPEG sink)")
    p.add_argument("--out", help="output path/dir for png/video/rtmp sinks")
    p.add_argument("--frames", type=int, help="stop after N frames")
    p.add_argument("--duration", type=float, help="stop after N seconds")
    p.add_argument("--fps", type=float, help="capture pacing FPS")
    p.add_argument("--size", default="1080x1920", help="synthetic source HxW")
    p.add_argument("--depth-res", type=int, help="model input resolution")
    p.add_argument("--display-mode", help="Half-SBS/Full-SBS/.../Depth")
    p.add_argument("--port", type=int, help="MJPEG port")
    p.add_argument("--xr-no-input", action="store_true",
                   help="xr sink: refuse OS-input injection from headset "
                        "clients (view-only host)")
    p.add_argument("--quality", default="high", choices=["high", "fast"],
                   help="stereo path: DIBR+inpaint vs grid-shift")
    p.add_argument("--checkpoint", help="safetensors path (else cache/random)")
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"],
                   help="compute platform (the reference's 'Computing "
                        "Device' dropdown, utils.py:1077-1096): 'cpu' "
                        "forces the CPU backend (works with no TPU grant), "
                        "'auto'/'tpu' use the chip")
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8 encoder matmuls (2x the bf16 MXU rate; "
                        "DA/VDA/DA3/DepthPro families; the TRT INT8 engine analog)")
    p.add_argument("--crop", default=None,
                   help="letterbox handling: off | auto (detected with "
                        "hysteresis) | u0,v0,uw,vh manual UV rect "
                        "(default: the settings 'Crop Mode', else off)")
    p.add_argument("--stop-file", default="logs/stop.request",
                   help="touch this file to request shutdown")
    p.add_argument("--stats-every", type=float, default=2.0,
                   help="seconds between stats lines (0 = quiet)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a JAX/XLA profiler trace of the run into "
                        "this dir (view with TensorBoard's profile plugin); "
                        "starts after warmup so compiles stay out of it")
    p.add_argument("--streams", type=int, default=1,
                   help="serve N concurrent feeds through one compiled "
                        "pipeline (per-stream state; png/video/mjpeg sinks "
                        "get per-stream suffixes)")
    p.add_argument("--batched", action="store_true",
                   help="with --streams N: stack the streams into ONE "
                        "device batch per launch (stateless models only)")
    return p


def _sink_for_run_mode(run_mode: str) -> str:
    """The settings 'Run Mode' → sink mapping (reference utils.py:1046-1064
    derives RUN_MODE/STREAM_MODE the same way; presentation on a TPU host
    is a window when one exists, else the browser viewer)."""
    rm = (run_mode or "").strip()
    if rm in ("Local Viewer", "3D Monitor", "Viewer"):
        return "window" if os.environ.get("DISPLAY") else "viewer"
    if rm == "RTMP Streamer":
        return "rtmp"
    if rm in ("OpenXR Link", "OpenXR"):
        return "xr"
    # "MJPEG Streamer" and the legacy "Streamer" torch-compositor mode
    return "mjpeg"


def apply_settings_defaults(args, settings) -> None:
    """Fill CLI flags the user left unset from a reference-style
    settings.yaml — the reference app is driven ENTIRELY by settings
    (capture mode/window/monitor, run mode, crop; reference utils.py:840,
    853-854, 1046-1073), so `--settings file.yaml` alone must reproduce a
    reference run.  Explicit flags always win; without --settings the
    historical CLI defaults apply."""
    had = bool(args.settings)
    extra = settings.extra if had else {}
    if args.source is None:
        args.source = "screen" if had else "synthetic"
        args.source_from_settings = had
    # reject typos NOW, before device detection / model build spend
    # minutes (make_components re-checks as the final guard)
    if args.source.split(":", 1)[0] not in (
            "screen", "synthetic", "shm", "image", "video", "tcp"):
        raise SystemExit(
            f"unknown --source {args.source!r} (valid: screen, synthetic, "
            f"shm, image, video, tcp[:<port>])")
    if args.sink is None:
        args.sink = _sink_for_run_mode(settings.run_mode) if had else "mjpeg"
        # the reference's flat preview alongside XR (utils.py:1072)
        if args.sink == "xr" and extra.get("XR Preview"):
            args.sink = "xr,mjpeg"
    if args.crop is None:
        mode = str(extra.get("Crop Mode", "")).strip().lower()
        args.crop = "auto" if mode == "auto" else "off"
    if args.monitor is None:
        mi = extra.get("Monitor Index")
        args.monitor = int(mi) if isinstance(mi, int) and not isinstance(mi, bool) else 0
    if args.window_title is None and str(extra.get("Capture Mode", "")).strip() == "Window":
        title = str(extra.get("Window Title") or "").strip()
        if title:
            args.window_title = title


def make_components(args, settings):
    import jax.numpy as jnp

    from desktop2stereo_tpu.core.runtime import detect_policy, setup_compilation_cache
    from desktop2stereo_tpu.models.factory import build_bound
    from desktop2stereo_tpu.pipeline.programs import ProgramCache, ProgramConfig
    from desktop2stereo_tpu.sinks import make_sink
    from desktop2stereo_tpu.sources import make_source

    setup_compilation_cache()
    policy = detect_policy(prefer_fp32=args.fp32)
    print(f"[d2s] device: {policy.description}, compute dtype: {policy.compute_dtype.__name__}")

    bound, spec = build_bound(settings.model, checkpoint=args.checkpoint,
                              quant=getattr(args, "quant", "none"))

    from desktop2stereo_tpu.core.registry import effective_compute_dtype

    compute_dtype = effective_compute_dtype(spec, policy.compute_dtype)

    cfg = ProgramConfig.from_settings(settings, quality=args.quality)
    kinds = [k.strip() for k in args.sink.split(",") if k.strip()]
    # Sink-negotiated depth output (decided BEFORE the programs compile):
    # png saves full-res depth images; the XR frame server only forwards
    # depth for the client's bilinear texture sampling — the full-res map
    # is itself just the bilinear upsample of the model-res one (reference
    # depth.py:1999-2004), so sending model res loses nothing and cuts the
    # d2h + wire bytes ~30x; everyone else ignores depth entirely.
    if "png" not in kinds:
        import dataclasses

        cfg = dataclasses.replace(cfg, emit_depth="model")
    if getattr(args, "feather", False):
        import dataclasses

        cfg = dataclasses.replace(cfg, edge_feather=True)
    if settings.fill_16_9 and "window" in (args.sink or ""):
        # the window sink does fill-16:9 at PRESENTATION time (the
        # reference viewer's viewport fit, viewer.py:1760-1770, live 'a'
        # key); baking the per-eye pad into the device program too would
        # double-pad.  Device-side per-eye pad stays for the streamer-type
        # sinks (reference Streamer main.py:1340).
        import dataclasses

        cfg = dataclasses.replace(cfg, fill_16_9=False)
    if args.streams > 1 and getattr(args, "batched", False):
        if args.crop and args.crop != "off":
            raise SystemExit("--batched does not support --crop")
        from desktop2stereo_tpu.pipeline.programs import BatchedProgramCache

        program = BatchedProgramCache(cfg, bound, spec,
                                      compute_dtype=compute_dtype,
                                      num_streams=args.streams)
    else:
        program = ProgramCache(cfg, bound, spec, compute_dtype=compute_dtype)

    if args.crop and args.crop != "off":
        # letterbox crop between capture and the frame program (reference
        # xr_viewer/crop.py); a changed rect re-specializes via ProgramCache.
        # Crop state is per stream (each feed detects its own letterbox).
        from desktop2stereo_tpu.pipeline.crop import (
            FULL, CropController, apply_crop)

        base_program = program
        if args.crop == "auto":
            controllers: dict = {}

            def program(frame, stream: int = 0):  # noqa: F811 — deliberate wrap
                ctl = controllers.get(stream)
                if ctl is None:
                    ctl = controllers[stream] = CropController()
                # stats read RGB luma; capture frames are BGRA
                crop = ctl.update(frame[..., 2::-1])
                return base_program(apply_crop(frame, crop), stream=stream)
        else:
            rect = tuple(float(v) for v in args.crop.split(","))
            if len(rect) != 4:
                raise SystemExit("--crop expects 'auto' or u0,v0,uw,vh")

            def program(frame, stream: int = 0):  # noqa: F811
                return base_program(apply_crop(frame, rect), stream=stream)

            def _warm(shape, steps=2):
                h = max(1, int(round(rect[3] * shape[0])))
                w = max(1, int(round(rect[2] * shape[1])))
                base_program.warmup((h, w) + tuple(shape[2:]), steps)

            program.warmup = _warm
        if args.crop == "auto":
            program.warmup = base_program.warmup  # crop starts full-frame
        program.base = base_program  # mode switching targets the cache

    src_kw = {}
    if args.source == "synthetic":
        h, w = (int(v) for v in args.size.split("x"))
        src_kw = {"size": (h, w)}
        if args.frames:
            src_kw["max_frames"] = args.frames
    elif args.source == "screen":
        src_kw = {"window_title": args.window_title,
                  "with_cursor": not args.no_cursor,
                  "monitor_index": args.monitor}
        if args.frames:
            src_kw["max_frames"] = args.frames
    elif args.source == "shm":
        src_kw = {"name": args.input or "/d2s_frames"}
        if args.frames:
            src_kw["max_frames"] = args.frames
    elif args.source == "tcp" or args.source.startswith("tcp:"):
        # `--source tcp:7800` — network frame ingest from a remote desktop
        # (the reference's capture layer runs on the desktop by definition,
        # reference capture.py:39-247; on a TPU host it arrives over TCP).
        # Optional shared secret via D2S_INGEST_TOKEN (agent: --token).
        port = 7800
        if ":" in args.source:
            try:
                port = int(args.source.split(":", 1)[1])
            except ValueError:
                port = -1
            if not 0 <= port <= 65535:
                raise SystemExit(
                    f"--source {args.source!r}: expected tcp:<port 0-65535> "
                    f"(e.g. tcp:7800)")
        args.source = "tcp"
        # timeout=None: a server waits for its agent indefinitely (agents
        # restart, links drop >30 s — neither is end-of-stream), unless a
        # bounded run was requested
        src_kw = {"port": port,
                  "timeout": 30.0 if args.frames else None,
                  "token": os.environ.get("D2S_INGEST_TOKEN")}
        if args.frames:
            src_kw["max_frames"] = args.frames
    elif args.source in ("image", "video"):
        if not args.input:
            raise SystemExit(f"--source {args.source} requires --input")
        src_kw = {"path": args.input}
        if args.frames:
            src_kw["max_frames"] = args.frames
        if args.source == "video":
            src_kw["loop"] = args.frames is not None
    elif args.source not in ("synthetic", "screen", "shm"):
        raise SystemExit(f"unknown --source {args.source!r} (valid: "
                         "synthetic|image|video|screen|shm|tcp[:PORT])")
    try:
        source = make_source(args.source, **src_kw)
    except Exception as e:
        if args.source == "screen" and getattr(args, "source_from_settings", False):
            # the screen default came from --settings, not the user's hand;
            # a headless host falls back instead of dying (the reference's
            # last-resort behavior is also a capture fallback chain)
            print(f"[d2s] screen capture unavailable ({e}); "
                  "using the synthetic source")
            h, w = (int(v) for v in args.size.split("x"))
            src_kw = {"size": (h, w)}
            if args.frames:
                src_kw["max_frames"] = args.frames
            args.source = "synthetic"
            source = make_source("synthetic", **src_kw)
        else:
            raise

    unknown = [k for k in kinds if k not in SINK_KINDS]
    if unknown or not kinds:
        raise SystemExit(
            f"unknown sink {unknown or args.sink!r}; choose from "
            + "|".join(SINK_KINDS) + " (comma list to tee)")
    # --port steers only the FIRST sink of a tee; the rest keep their
    # defaults (two sinks on one port would collide at bind time)
    import copy as _copy

    rest = _copy.copy(args)
    rest.port = None
    sinks = [make_sink(k, **_sink_kwargs(k, args if i == 0 else rest,
                                         settings))
             for i, k in enumerate(kinds)]
    if len(sinks) == 1:
        sink = sinks[0]
    else:
        from desktop2stereo_tpu.sinks.tee import TeeSink

        sink = TeeSink(sinks)
    return source, program, sink, settings


SINK_KINDS = ("mjpeg", "png", "video", "null", "rtmp", "viewer", "window",
              "xr")


def _sink_kwargs(kind: str, args, settings) -> dict:
    if kind == "png":
        return {"out_dir": args.out or "out", "save_depth": True}
    if kind == "video":
        return {"path": args.out or "out.mp4", "fps": settings.fps}
    if kind == "mjpeg":
        return {"port": args.port or settings.streamer_port,
                "fps": settings.fps, "quality": settings.stream_quality,
                "show_fps": args.show_fps or settings.show_fps}
    if kind == "rtmp":
        # no --out: publish to a local mediamtx sidecar at the settings
        # 'Stream Key' path, like the reference's self-hosted pipeline
        # (reference main.py:754, 987, 993-1017); CRF/Audio Delay ride
        # the settings file too (main.py:522, 535)
        key = str(settings.extra.get("Stream Key") or "live")
        return {"url": args.out or f"rtmp://127.0.0.1:1935/{key}",
                "serve": not args.out,
                "fps": settings.fps, "audio": args.audio,
                "crf": int(settings.extra.get("CRF") or 20),
                "audio_delay": float(settings.extra.get("Audio Delay")
                                     or 0.0)}
    if kind == "viewer":
        return {"port": args.port or settings.streamer_port,
                "fps": settings.fps,
                "show_fps": args.show_fps or settings.show_fps}
    if kind == "window":
        return {"keep_aspect":
                bool(settings.extra.get("Fix Viewer Aspect", False)),
                "fill_16_9": settings.fill_16_9}
    if kind == "xr":
        # advertise the settings-derived session config so workstation
        # clients at default flags render with the file's stereo params
        return {"port": args.port or 1123,
                "inject_input": not getattr(args, "xr_no_input", False),
                "meta": {
                    "ipd": settings.ipd,
                    "depth_strength": settings.depth_strength,
                    "convergence": settings.convergence,
                    "display_mode": settings.display_mode,
                    "foreground_scale": settings.foreground_scale,
                    "environment": settings.extra.get("Environment Model"),
                    "controller": settings.extra.get("Controller Model"),
                }}
    return {}


def _apply_device_choice(device: str) -> None:
    """Pin the jax platform BEFORE any backend init.

    'cpu' must go through jax.config (the host sitecustomize overrides the
    JAX_PLATFORMS env var).  For 'auto'/'tpu', probe jax.devices() on a
    daemon thread with a deadline: a dead axon tunnel relay makes that call
    hang FOREVER (no exception), and an interactive CLI should print the
    diagnostic instead of silently wedging (same guard as bench.py)."""
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return
    ready = threading.Event()
    result: dict = {}

    def _probe():
        try:
            result["devices"] = jax.devices()
        except Exception as e:  # e.g. ABORTED: another process holds the grant
            result["error"] = e
        finally:
            ready.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not ready.wait(timeout=180.0):
        print("[d2s] FATAL: jax.devices() did not return within 180s — "
              "TPU tunnel relay down or another process holds the chip "
              "grant.  Re-run with --device cpu, or wait for the relay.",
              file=sys.stderr)
        os._exit(2)  # the probe thread is unjoinably hung
    if "error" in result:
        print(f"[d2s] FATAL: TPU backend init failed: {result['error']}\n"
              "Re-run with --device cpu, or wait for the chip holder to "
              "exit.", file=sys.stderr)
        raise SystemExit(2)
    if device == "tpu" and result["devices"][0].platform not in (
            "tpu", "axon"):
        # an explicit --device tpu must not silently degrade to CPU speed
        print(f"[d2s] FATAL: --device tpu requested but jax resolved "
              f"platform {result['devices'][0].platform!r}; use "
              f"--device auto to accept a CPU fallback.", file=sys.stderr)
        raise SystemExit(2)


def run(args=None) -> int:
    args = build_parser().parse_args(args)

    # Clear any stale stop.request from a previous session FIRST — before
    # model build/compile, so a stop requested DURING the (possibly
    # minutes-long) init is a fresh request the watcher will honor, while a
    # leftover from a SIGKILLed previous worker can't abort this run.
    if args.stop_file and os.path.exists(args.stop_file):
        try:
            os.remove(args.stop_file)
            print("[d2s] cleared stale stop.request from a previous run")
        except OSError:
            pass

    from desktop2stereo_tpu.core.config import Settings, load_settings
    from desktop2stereo_tpu.pipeline.engine import FrameEngine

    settings = load_settings(args.settings) if args.settings else Settings()
    overrides = {}
    if args.model:
        overrides["model"] = args.model
    if args.depth_res:
        overrides["depth_resolution"] = args.depth_res
    if args.display_mode:
        overrides["display_mode"] = args.display_mode
    if args.fps:
        overrides["fps"] = args.fps
    if overrides:
        settings = settings.replace(**overrides)

    apply_settings_defaults(args, settings)
    _apply_device_choice(args.device)
    source, program, sink, settings = make_components(args, settings)

    if args.streams > 1:
        return _run_multi(args, settings, source, program, sink)

    shutdown = threading.Event()

    def handle(sig, frame):
        print(f"[d2s] signal {sig}; shutting down")
        shutdown.set()

    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(sig, handle)
        except (ValueError, OSError):
            pass  # non-main thread (tests)

    # stop.request file channel (reference main.py:343-357); stale files
    # were cleared at the very top of run(), before heavy init.
    def stop_file_watcher():
        while not shutdown.is_set():
            if args.stop_file and os.path.exists(args.stop_file):
                try:
                    os.remove(args.stop_file)
                except OSError:
                    pass
                print("[d2s] stop.request received")
                shutdown.set()
                return
            time.sleep(0.5)

    threading.Thread(target=stop_file_watcher, daemon=True).start()

    engine = FrameEngine(
        source, program, sink, target_fps=settings.fps, shutdown=shutdown
    )

    mode_target = getattr(program, "base", program)
    if hasattr(sink, "mode_switcher") and hasattr(mode_target, "set_display_mode"):
        sink.mode_switcher = mode_target  # live display-mode hot-keys

    if getattr(sink, "url", None):
        print(f"[d2s] streaming at {sink.url}")

    # Pre-compile for the source's frame shape (reference warmup_model x3).
    probe = source.grab()
    if probe is not None and hasattr(program, "warmup"):
        t0 = time.perf_counter()
        print(f"[d2s] compiling for frame shape {probe.shape} ...")
        rep = program.warmup(probe.shape)
        detail = ("  (" + ", ".join(f"{k[:-2]} {v}s" for k, v in rep.items())
                  + ")") if rep else ""
        print(f"[d2s] compiled in {time.perf_counter() - t0:.1f}s{detail}")
    if probe is not None:
        engine.preload(probe)  # the shape probe is frame 0, not a casualty

    tracing = False
    try:
        if args.profile_dir:
            from desktop2stereo_tpu.pipeline.profiling import start_trace

            print(f"[d2s] profiler trace -> {start_trace(args.profile_dir)}")
            tracing = True
        engine.start()
        t_end = None if args.duration is None else time.monotonic() + args.duration
        last_stats = time.monotonic()
        while not shutdown.is_set():
            now = time.monotonic()
            if t_end is not None and now >= t_end:
                break
            if args.frames is not None and engine.frames >= args.frames:
                break
            if engine.drained():
                break  # finite source exhausted and all frames processed
            if args.stats_every and now - last_stats >= args.stats_every:
                s = engine.stats()
                lat = ", ".join(f"{k}={v*1000:.1f}ms" for k, v in s["latency"].items())
                net = ""
                if hasattr(source, "stats"):  # tcp ingest fps + drop stats
                    ns = source.stats()
                    net = (f" ingest={ns['ingest_fps']:.1f}fps "
                           f"net_dropped={ns['frames_dropped']}")
                print(
                    f"[d2s] fps={s['fps']:.1f} (1%low={s['fps_1pct_low']:.1f}) "
                    f"dropped={s['dropped']} {lat}{net}"
                )
                last_stats = now
            time.sleep(0.05)
    finally:
        if tracing:
            from desktop2stereo_tpu.pipeline.profiling import stop_trace

            try:
                stop_trace()
            except Exception:
                pass
        shutdown.set()
        # watchdog: hard-exit if native threads refuse to unwind
        # (reference main.py:325-339)
        watchdog = threading.Timer(8.0, lambda: os._exit(1))
        watchdog.daemon = True
        watchdog.start()
        try:
            try:
                engine.stop()
            except Exception as e:
                # a user quit from the window sink is a NORMAL shutdown,
                # not an error — don't traceback out of a 'q' keypress
                from desktop2stereo_tpu.sinks.window import WindowCloseRequested

                if not isinstance(e, WindowCloseRequested):
                    raise
                print("[d2s] window closed")
        finally:
            for obj in (sink, source):
                try:
                    # full teardown where offered (e.g. RtmpSink's mediamtx
                    # sidecar); close() alone just recycles the encoder
                    getattr(obj, "shutdown", obj.close)()
                except Exception:
                    pass
            watchdog.cancel()

    final = engine.stats_final()
    print(
        f"[d2s] done: {final.frames} frames ({final.dropped} dropped), "
        f"avg {final.fps:.1f} FPS, 1% low {final.fps_1pct_low:.1f}"
    )
    return 0


def _run_multi(args, settings, source0, program, sink0) -> int:
    """--streams N: N sources → MultiStreamEngine → N sinks, one compiled
    pipeline with per-stream carried state (pipeline/multi.py)."""
    from desktop2stereo_tpu.pipeline.multi import (
        BatchedStreamEngine, MultiStreamEngine)
    from desktop2stereo_tpu.sinks import make_sink
    from desktop2stereo_tpu.sources import make_source

    n = args.streams
    sources = [source0]
    sinks = [sink0]
    for i in range(1, n):
        if args.source == "synthetic":
            h, w = (int(v) for v in args.size.split("x"))
            kw = {"size": (h, w), "seed": i}
            if args.frames:
                kw["max_frames"] = args.frames
            sources.append(make_source("synthetic", **kw))
        elif args.source == "shm":
            base = args.input or "/d2s_frames"
            kw = {"name": f"{base}_{i}"}
            if args.frames:
                kw["max_frames"] = args.frames
            sources.append(make_source("shm", **kw))
        elif args.source in ("image", "video"):
            kw = {"path": args.input}
            if args.frames:
                kw["max_frames"] = args.frames
            if args.source == "video":
                kw["loop"] = args.frames is not None
            sources.append(make_source(args.source, **kw))
        else:
            raise SystemExit(f"--streams with --source {args.source} unsupported")

        if args.sink == "png":
            sinks.append(make_sink("png", out_dir=f"{args.out or 'out'}_{i}",
                                   save_depth=True))
        elif args.sink == "video":
            base = args.out or "out.mp4"
            # splitext, not rpartition: a dotted DIRECTORY name must not be
            # mistaken for the extension ("results.v2/capture")
            root, ext = os.path.splitext(base)
            path = f"{root}_{i}{ext}"
            sinks.append(make_sink("video", path=path, fps=settings.fps))
        elif args.sink == "mjpeg":
            port = (args.port or settings.streamer_port) + i
            sinks.append(make_sink("mjpeg", port=port, fps=settings.fps,
                                   quality=settings.stream_quality,
                                   show_fps=args.show_fps or settings.show_fps))
        elif args.sink == "null":
            sinks.append(make_sink("null"))
        else:
            raise SystemExit(f"--streams with --sink {args.sink} unsupported")

    shutdown = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(sig, lambda *_a: shutdown.set())
        except (ValueError, OSError):
            pass

    probe = sources[0].grab()
    if probe is not None and hasattr(program, "warmup"):
        print(f"[d2s] compiling for frame shape {probe.shape} ...")
        t0 = time.perf_counter()
        rep = program.warmup(probe.shape)
        detail = ("  (" + ", ".join(f"{k[:-2]} {v}s" for k, v in rep.items())
                  + ")") if rep else ""
        print(f"[d2s] compiled in {time.perf_counter() - t0:.1f}s{detail}")

    engine_cls = (BatchedStreamEngine if getattr(args, "batched", False)
                  else MultiStreamEngine)
    engine = engine_cls(sources, program, sinks,
                        target_fps=settings.fps, shutdown=shutdown)
    if probe is not None:
        engine.preload(probe, stream=0)  # don't lose stream 0's first frame
    try:
        stats = engine.run(duration=args.duration)
    finally:
        shutdown.set()
        for obj in sources + sinks:
            try:
                getattr(obj, "shutdown", obj.close)()
            except Exception:
                pass
    for name, s in stats.items():
        print(f"[d2s] {name}: {s['frames']} frames, {s.get('fps', 0.0):.1f} FPS")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
