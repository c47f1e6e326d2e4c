"""Capture agent: screen → shared-memory frame ring (producer side).

Run next to the pipeline process on any machine with a display:

    python -m desktop2stereo_tpu.tools.capture_agent --ring /d2s_frames --fps 60
    python -m desktop2stereo_tpu.cli --source shm --sink mjpeg

This is the process-split deployment of the reference's capture thread
(reference main.py:211-230): capture isolation means a wedged display driver
can't stall the TPU pipeline, and a remote forwarder can replace this agent
over any transport that ends in ring.write().
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    p = argparse.ArgumentParser(prog="d2s-capture-agent")
    p.add_argument("--ring", default="/d2s_frames")
    p.add_argument("--fps", type=float, default=60.0)
    p.add_argument("--monitor", type=int, default=0)
    p.add_argument("--display", default="")
    p.add_argument("--slots", type=int, default=3)
    p.add_argument("--duration", type=float)
    args = p.parse_args()

    from desktop2stereo_tpu.native import FramePacer, ShmFrameRing
    from desktop2stereo_tpu.sources.screen import ScreenSource

    source = ScreenSource(monitor_index=args.monitor, display=args.display)
    probe = source.grab()
    if probe is None:
        raise SystemExit("capture failed")
    ring = ShmFrameRing(args.ring, max_bytes=probe.nbytes, slots=args.slots)
    pacer = FramePacer(args.fps)
    print(f"[agent] {probe.shape} @ {args.fps} fps -> {args.ring}")

    n, t0 = 0, time.time()
    t_end = None if args.duration is None else t0 + args.duration
    try:
        while t_end is None or time.time() < t_end:
            frame = source.grab()
            if frame is None:
                break
            ring.write(frame)
            n += 1
            pacer.wait()
            if n % 300 == 0:
                print(f"[agent] {n} frames, {n / (time.time() - t0):.1f} fps")
    except KeyboardInterrupt:
        pass
    finally:
        source.close()
        ring.close()
        print(f"[agent] done: {n} frames")


if __name__ == "__main__":
    main()
