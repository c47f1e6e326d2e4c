"""The frame engine: 3-stage latest-frame-wins pipeline.

Reimplements the reference's thread topology (reference main.py:67-68,
232-262): capture → depth/compose → sink, connected by depth-1 mailboxes so
each stage always works on the newest frame and stale frames are dropped.

TPU specifics:
- Stage 2 is ONE device program (pipeline/programs.py) instead of the
  reference's eager stage chain; the host thread's only jobs are the
  async host→HBM upload (the PBO-ring analog, reference frame.py:62-161)
  and the device→host fetch of the composed frame.
- Upload of frame N+1 overlaps compute of frame N because `device_put` and
  dispatch are async; the blocking point is the single `np.asarray` fetch.
- Graceful shutdown mirrors the reference's event-driven unwind
  (reference main.py:264-387): a shared Event, drained mailboxes, joined
  threads, and a watchdog in the CLI layer.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import numpy as np

from desktop2stereo_tpu.pipeline.metrics import FpsCounter, StageLatency


class Mailbox:
    """Depth-1 latest-wins channel (the reference's maxsize=1 queue with
    drop-stale semantics, reference main.py:66-68)."""

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._item: Any = None
        self._seq = 0
        self._taken_seq = 0
        self.dropped = 0  # latest-wins overwrites of a never-consumed item

    def put(self, item: Any) -> None:
        with self._cond:
            if self._item is not None and self._seq > self._taken_seq:
                self.dropped += 1
            self._item = item
            self._seq += 1
            self._cond.notify_all()

    def get(self, timeout: Optional[float] = None, last_seq: int = -1) -> Tuple[Any, int]:
        """Blocks until a newer item than `last_seq` arrives (or timeout).
        Returns (item, seq); (None, last_seq) on timeout."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cond:
            while self._seq <= last_seq or self._item is None:
                remaining = None if deadline is None else deadline - time.monotonic()
                if remaining is not None and remaining <= 0:
                    return None, last_seq
                self._cond.wait(remaining)
            self._taken_seq = max(self._taken_seq, self._seq)
            return self._item, self._seq

    @property
    def latest_seq(self) -> int:
        with self._cond:
            return self._seq


@dataclass
class EngineStats:
    fps: float
    fps_1pct_low: float
    frame_ms: float
    latency: dict            # per-stage EMA seconds (live view)
    frames: int
    dropped: int
    latency_median: dict = None  # per-stage median seconds over the run


class FrameEngine:
    """source.grab() → program(frame) → sink(sbs, depth, meta)."""

    def __init__(
        self,
        source,                      # .grab() -> np.ndarray | None (BGRA/BGR u8)
        program,                     # callable(frame_u8_device) -> (sbs, depth)
        sink,                        # .push(sbs_u8 np, depth np|None, stats) -> None
        target_fps: float = 60.0,
        shutdown: Optional[threading.Event] = None,
    ) -> None:
        self.source = source
        self.program = program
        self.sink = sink
        # Sink-negotiated depth: sinks that never read depth (null, mjpeg,
        # rtmp, video, window-in-stereo-modes) advertise wants_depth=False
        # and the engine skips the device→host depth fetch entirely — at 4K
        # that is a full extra frame of d2h per frame saved.  Sinks that DO
        # consume it get it fetched asynchronously alongside sbs (the same
        # PBO-ring overlap, reference viewer.py:2504-2549).
        self.wants_depth = bool(getattr(sink, "wants_depth", True))
        self.target_fps = target_fps
        self.shutdown = shutdown or threading.Event()
        self.raw_box = Mailbox()
        self.out_box = Mailbox()
        self.latency = StageLatency()
        self.fps = FpsCounter()
        self.frames = 0
        self._threads: list[threading.Thread] = []
        self._error: Optional[BaseException] = None
        self.capture_done = threading.Event()  # source exhausted (drain, don't kill)
        self._consumed_seq = 0
        self._has_pending = False
        self._sink_seq = 0        # newest out_box seq the sink has PUSHED
        self._sink_busy = False   # a push is in flight right now

    # ---- stages ----------------------------------------------------------

    def _capture_loop(self) -> None:
        interval = 1.0 / self.target_fps if self.target_fps > 0 else 0.0
        try:
            while not self.shutdown.is_set():
                t0 = time.perf_counter()
                frame = self.source.grab()
                if frame is None:
                    # Source exhausted: let in-flight frames drain; run()
                    # decides when everything is consumed.
                    self.capture_done.set()
                    break
                self.raw_box.put((frame, t0))
                self.latency.record("capture", time.perf_counter() - t0)
                if interval:
                    sleep = interval - (time.perf_counter() - t0)
                    if sleep > 0:
                        time.sleep(sleep)
        except BaseException as e:  # propagate to run()
            self._error = e
            self.shutdown.set()

    def _compute_loop(self) -> None:
        seq = -1
        pending: Optional[Tuple[Any, Any, float, float]] = None  # (sbs, depth, t0, t_submit)
        try:
            while not self.shutdown.is_set():
                # If no frame is IMMEDIATELY ready, flush the pending result
                # before blocking for the next one: on a paced source the
                # sink then receives each frame as soon as its d2h lands
                # instead of one frame-interval later, and the
                # 'depth+compose' stat measures dispatch→done rather than
                # absorbing the inter-frame wait.  A saturated source takes
                # the fast path below and keeps the d2h/compute overlap.
                item, seq = self.raw_box.get(timeout=0.0, last_seq=seq)
                if item is None and pending is not None:
                    self._finish(pending)
                    pending = None
                    self._has_pending = False
                if item is None:
                    item, seq = self.raw_box.get(timeout=0.1, last_seq=seq)
                if item is None:
                    self._consumed_seq = seq
                    continue
                frame, t0 = item
                t1 = time.perf_counter()
                dev_frame = jax.device_put(frame)          # async host→HBM
                sbs, depth = self.program(dev_frame)        # async dispatch
                # start the d2h copy the moment compute finishes so the
                # np.asarray in _finish() only synchronizes (the PBO-ring
                # readback overlap, reference viewer.py:2504-2549); depth
                # rides the same async window iff the sink consumes it
                for arr in (sbs, depth) if self.wants_depth else (sbs,):
                    if hasattr(arr, "copy_to_host_async"):
                        try:
                            arr.copy_to_host_async()
                        except Exception:
                            pass
                # One-frame software pipeline: finish frame N-1 while N runs.
                if pending is not None:
                    self._finish(pending)
                pending = (sbs, depth, t0, t1)
                self._has_pending = True
                self._consumed_seq = seq
            if pending is not None:
                self._finish(pending)
                self._has_pending = False
        except BaseException as e:
            self._error = e
            self.shutdown.set()

    def _finish(self, pending) -> None:
        sbs, depth, t0, t1 = pending
        sbs_np = np.asarray(sbs)                            # blocks on device
        # fetch depth only for sinks that consume it (copy already in
        # flight from copy_to_host_async above — this just synchronizes)
        depth_np = np.asarray(depth) if self.wants_depth else None
        self.latency.record("depth+compose", time.perf_counter() - t1)
        self.out_box.put((sbs_np, depth_np, t0))
        self.frames += 1
        self.fps.tick()

    def _sink_loop(self) -> None:
        seq = -1
        try:
            while not self.shutdown.is_set():
                item, seq = self.out_box.get(timeout=0.1, last_seq=seq)
                if item is None:
                    continue
                sbs_np, depth, t0 = item
                t1 = time.perf_counter()
                self._sink_busy = True
                try:
                    self.sink.push(sbs_np, depth, self.stats())
                finally:
                    self._sink_busy = False
                    self._sink_seq = seq
                self.latency.record("sink", time.perf_counter() - t1)
        except BaseException as e:
            self._error = e
            self.shutdown.set()

    # ---- lifecycle ---------------------------------------------------------

    @property
    def dropped(self) -> int:
        """Latest-wins drops across both mailboxes (the reference surfaces
        the same pressure via FPS/1%-low, reference main.py:1202-1230)."""
        return self.raw_box.dropped + self.out_box.dropped

    def preload(self, frame, t0: Optional[float] = None) -> None:
        """Enqueue a frame captured before start() (e.g. the CLI's shape
        probe) so it is processed rather than lost."""
        self.raw_box.put((frame, t0 if t0 is not None else time.perf_counter()))

    def start(self) -> None:
        for name, fn in (
            ("capture", self._capture_loop),
            ("compute", self._compute_loop),
            ("sink", self._sink_loop),
        ):
            t = threading.Thread(target=fn, name=f"d2s-{name}", daemon=True)
            t.start()
            self._threads.append(t)

    def join(self, timeout: Optional[float] = None) -> None:
        deadline = None if timeout is None else time.monotonic() + timeout
        for t in self._threads:
            remaining = None if deadline is None else max(0.0, deadline - time.monotonic())
            t.join(remaining)
        if self._error is not None:
            raise self._error

    def drained(self) -> bool:
        """True when a finite source is exhausted, every captured frame has
        been consumed (processed or dropped by latest-wins), AND the sink
        has finished pushing the newest composed frame — without the sink
        clause, stop() could beat a mid-push sink to the final frame and a
        `--frames N` run would nondeterministically emit N-1 outputs."""
        return (
            self.capture_done.is_set()
            and not self._has_pending
            and self._consumed_seq >= self.raw_box._seq
            and self._sink_seq >= self.out_box._seq
            and not self._sink_busy
        )

    def _wait_sink_drain(self, timeout: float = 5.0) -> None:
        """Give the sink a bounded window to deliver what was composed."""
        deadline = time.monotonic() + timeout
        while (not self.shutdown.is_set() and time.monotonic() < deadline
               and (self._sink_busy or self._sink_seq < self.out_box._seq)):
            time.sleep(0.01)

    def run(self, duration: Optional[float] = None, max_frames: Optional[int] = None) -> EngineStats:
        """Blocking convenience: start, wait, stop."""
        self.start()
        t_end = None if duration is None else time.monotonic() + duration
        while not self.shutdown.is_set():
            if t_end is not None and time.monotonic() >= t_end:
                break
            if max_frames is not None and self.frames >= max_frames:
                break
            if self.drained():
                break  # everything the source produced has been delivered
            time.sleep(0.01)
        self._wait_sink_drain()
        self.stop()
        return self.stats_final()

    def stop(self) -> None:
        self.shutdown.set()
        self.join(timeout=5.0)

    def stats(self) -> dict:
        s = self.fps.stats()
        s["latency"] = self.latency.snapshot()
        s["frames"] = self.frames
        s["dropped"] = self.dropped
        return s

    def stats_final(self) -> EngineStats:
        s = self.fps.stats()
        return EngineStats(
            fps=s["fps"],
            fps_1pct_low=s["fps_1pct_low"],
            frame_ms=s["frame_ms"],
            latency=self.latency.snapshot(),
            frames=self.frames,
            dropped=self.dropped,
            latency_median=self.latency.medians(),
        )
