"""Multi-stream serving: N capture feeds through one compiled pipeline.

The reference is strictly one capture → one viewer.  On a TPU chip the
frame program has headroom (a ViT-S frame is ~4 ms against a 16.7 ms 60 Hz
budget), so one chip can serve several concurrent feeds — dual-display
capture, several remote clients — by round-robining streams through the
SAME compiled programs (shapes match ⇒ zero recompiles) with per-stream
carried state (ProgramCache's `stream` key).  Cross-chip scaling of the
same idea is `parallel.sharding.parallel_frame_apply` (the data-axis mesh);
this engine is the single-chip host loop.

Same latest-frame-wins semantics as pipeline.engine.FrameEngine, per
stream: each stream has its own depth-1 mailboxes; a slow stream drops its
own frames and never stalls the others.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, List, Optional, Sequence

import jax
import numpy as np

from desktop2stereo_tpu.pipeline.engine import Mailbox
from desktop2stereo_tpu.pipeline.metrics import FpsCounter


class _Stream:
    def __init__(self, idx: int, source: Any, sink: Any):
        self.idx = idx
        self.source = source
        self.sink = sink
        # sink-negotiated depth (same contract as FrameEngine): skip the
        # device->host depth fetch for sinks that never read it
        self.wants_depth = bool(getattr(sink, "wants_depth", True))
        self.raw = Mailbox()
        self.out = Mailbox()
        self.raw_seq = -1
        self.out_seq = -1
        self.pending = None          # (sbs, depth, t0) awaiting host fetch
        self.frames = 0
        self.fps = FpsCounter()
        self.done = threading.Event()


class MultiStreamEngine:
    """N sources → one ProgramCache (stream-keyed state) → N sinks."""

    def __init__(
        self,
        sources: Sequence[Any],
        program: Callable,          # ProgramCache-like: (frame, stream=i)
        sinks: Sequence[Any],
        target_fps: float = 60.0,
        shutdown: Optional[threading.Event] = None,
    ) -> None:
        if len(sources) != len(sinks):
            raise ValueError("need one sink per source")
        self.program = program
        self.target_fps = target_fps
        self.shutdown = shutdown or threading.Event()
        self.streams: List[_Stream] = [
            _Stream(i, src, snk) for i, (src, snk) in enumerate(zip(sources, sinks))
        ]
        self._threads: List[threading.Thread] = []
        self._error: Optional[BaseException] = None

    # ---- per-stream capture / sink loops ---------------------------------

    def _capture_loop(self, st: _Stream) -> None:
        interval = 1.0 / self.target_fps if self.target_fps > 0 else 0.0
        try:
            while not self.shutdown.is_set():
                t0 = time.perf_counter()
                frame = st.source.grab()
                if frame is None:
                    st.done.set()
                    return
                st.raw.put((frame, t0))
                if interval:
                    slack = interval - (time.perf_counter() - t0)
                    if slack > 0:
                        time.sleep(slack)
        except BaseException as e:
            self._error = e
            self.shutdown.set()

    def _sink_loop(self, st: _Stream) -> None:
        try:
            while not self.shutdown.is_set():
                item, st.out_seq = st.out.get(timeout=0.1, last_seq=st.out_seq)
                if item is None:
                    continue
                sbs_np, depth, _t0 = item
                st.sink.push(sbs_np, depth,
                             {"stream": st.idx, **st.fps.stats()})
        except BaseException as e:
            self._error = e
            self.shutdown.set()

    # ---- shared compute loop ----------------------------------------------

    def _finish(self, st: _Stream) -> None:
        sbs, depth, t0 = st.pending
        st.pending = None
        depth_np = np.asarray(depth) if st.wants_depth else None
        st.out.put((np.asarray(sbs), depth_np, t0))
        st.frames += 1
        st.fps.tick()

    def _compute_loop(self) -> None:
        try:
            while not self.shutdown.is_set():
                if (all(st.done.is_set() for st in self.streams)
                        and all(st.raw_seq >= st.raw._seq
                                for st in self.streams)):
                    break  # done AND raw boxes drained (a source's last
                           # frame may land in the same tick as done)
                progressed = False
                for st in self.streams:
                    item, st.raw_seq = st.raw.get(timeout=0.0, last_seq=st.raw_seq)
                    if item is None:
                        # an exhausted stream's final result must not wait
                        # for OTHER streams to go idle
                        if st.pending is not None and st.done.is_set():
                            self._finish(st)
                        continue
                    frame, t0 = item
                    sbs, depth = self.program(jax.device_put(frame), stream=st.idx)
                    outs = (sbs, depth) if st.wants_depth else (sbs,)
                    for arr in outs:
                        if hasattr(arr, "copy_to_host_async"):
                            try:
                                arr.copy_to_host_async()  # overlap d2h
                            except Exception:
                                pass
                    # one-frame software pipeline per stream: finish the
                    # PREVIOUS result while this one executes on device
                    if st.pending is not None:
                        self._finish(st)
                    st.pending = (sbs, depth, t0)
                    progressed = True
                if not progressed:
                    # nothing new anywhere: flush pendings, then idle briefly
                    for st in self.streams:
                        if st.pending is not None:
                            self._finish(st)
                    time.sleep(0.001)
            for st in self.streams:
                if st.pending is not None:
                    self._finish(st)
        except BaseException as e:
            self._error = e
            self.shutdown.set()

    # ---- lifecycle ---------------------------------------------------------

    def preload(self, frame: Any, stream: int = 0) -> None:
        """Enqueue a frame captured before start() (the CLI's shape probe)
        into a stream's raw mailbox so it is processed, not lost."""
        self.streams[stream].raw.put((frame, time.perf_counter()))

    def start(self) -> None:
        for st in self.streams:
            for name, fn in (("capture", self._capture_loop),
                             ("sink", self._sink_loop)):
                t = threading.Thread(target=fn, args=(st,),
                                     name=f"d2s-{name}-{st.idx}", daemon=True)
                t.start()
                self._threads.append(t)
        t = threading.Thread(target=self._compute_loop, name="d2s-compute",
                             daemon=True)
        t.start()
        self._threads.append(t)
        self._compute_thread = t

    def run(self, duration: Optional[float] = None) -> dict:
        self.start()
        t0 = time.time()
        try:
            while not self.shutdown.is_set():
                if not self._compute_thread.is_alive():
                    break  # all sources exhausted; pendings were flushed
                if duration is not None and time.time() - t0 > duration:
                    break
                time.sleep(0.02)
        finally:
            # bounded delivery drain instead of a fixed grace sleep: a sink
            # mid-encode on a 4K frame takes longer than 50 ms, and the
            # final flushed frame per stream must be TAKEN before shutdown
            # (a taken item is always pushed — the sink loop re-checks
            # shutdown only after its push completes)
            deadline = time.monotonic() + 5.0
            while (not self.shutdown.is_set()
                   and time.monotonic() < deadline
                   and any(st.out_seq < st.out._seq for st in self.streams)):
                time.sleep(0.01)
            self.shutdown.set()
            # join (bounded) before returning: letting the interpreter tear
            # down while the compute/sink daemons are inside a device call
            # aborts in the PJRT runtime ("terminate called ...") at exit
            for t in self._threads:
                t.join(timeout=5.0)
        if self._error is not None:
            raise self._error
        return self.stats()

    def stats(self) -> dict:
        return {
            f"stream{st.idx}": {
                "frames": st.frames,
                "dropped": st.raw.dropped + st.out.dropped,
                **st.fps.stats(),
            }
            for st in self.streams
        }


class BatchedStreamEngine(MultiStreamEngine):
    """N sources → ONE vmapped device batch per launch → N sinks.

    Instead of round-robining batch-1 programs, each launch stacks the
    newest frame of every stream into a [S,H,W,C] batch for a
    BatchedProgramCache — S frames of MXU work per dispatch (BASELINE
    configs[4]).  Latest-wins per stream is preserved: a stream with no
    fresh frame re-submits its previous frame (its EMA advances — the same
    thing the reference's viewer does when re-rendering a stale frame) but
    its sink is NOT pushed a duplicate."""

    def _compute_loop(self) -> None:
        last = [None] * len(self.streams)     # last frame per stream
        fresh = [False] * len(self.streams)
        t0s = [0.0] * len(self.streams)       # persists across iterations
        pending = None                        # (sbs, depth, fresh_mask, t0s)
        try:
            while not self.shutdown.is_set():
                if (all(st.done.is_set() for st in self.streams)
                        and all(st.raw_seq >= st.raw._seq
                                for st in self.streams)):
                    break  # done AND raw boxes drained
                got_any = False
                for st in self.streams:
                    item, st.raw_seq = st.raw.get(timeout=0.0, last_seq=st.raw_seq)
                    if item is not None:
                        last[st.idx], t0s[st.idx] = item
                        fresh[st.idx] = True
                        got_any = True
                # a stream with no frame yet must not starve the batch:
                # one that ENDED frameless (empty video, dead shm producer)
                # always gets a stand-in from a live stream, and for
                # stateless models so does one that merely hasn't STARTED
                # (remote agent still connecting) — never marked fresh, so
                # its sink never sees the stand-in.  Streaming models keep
                # waiting for late streams: their stacked first-frame
                # program would otherwise seed the late stream's temporal
                # window with another stream's content.
                have = [f for f in last if f is not None]
                stateless = getattr(self.program, "_first", None) is None
                if have and len(have) < len(last):
                    for st in self.streams:
                        if last[st.idx] is None and (st.done.is_set()
                                                     or stateless):
                            last[st.idx] = have[0]
                if not got_any or any(f is None for f in last):
                    if pending is not None:
                        self._finish_batch(pending)
                        pending = None
                    time.sleep(0.001)
                    continue
                shapes = {f.shape for f in last}
                if len(shapes) > 1:
                    raise RuntimeError(
                        f"--batched requires uniform frame shapes across "
                        f"streams, got {sorted(shapes)}; use plain --streams "
                        f"for mixed resolutions")
                batch = np.stack(last)
                # fresh mask: stale rows keep the batch full but a
                # streaming model's temporal carry must not absorb their
                # re-submitted duplicate frames
                sbs, depth = self.program(jax.device_put(batch),
                                          fresh=np.asarray(fresh, bool))
                # depth rides the async d2h window iff ANY sink consumes it
                # (the same sink negotiation as the single-stream engines)
                want_depth = any(st.wants_depth for st in self.streams)
                for arr in (sbs, depth) if want_depth else (sbs,):
                    if hasattr(arr, "copy_to_host_async"):
                        try:
                            arr.copy_to_host_async()
                        except Exception:
                            pass
                if pending is not None:
                    self._finish_batch(pending)
                pending = (sbs, depth, list(fresh), list(t0s))
                fresh = [False] * len(self.streams)
            if pending is not None:
                self._finish_batch(pending)
        except BaseException as e:
            self._error = e
            self.shutdown.set()

    def _finish_batch(self, pending) -> None:
        sbs, depth, fresh_mask, t0s = pending
        sbs_np = np.asarray(sbs)              # blocks on the whole batch
        # one host fetch for the whole depth batch, only if some sink
        # reads it; per-stream rows slice the numpy copy (no per-stream
        # synchronous device gathers)
        depth_np = (np.asarray(depth)
                    if any(st.wants_depth for st in self.streams) else None)
        for st in self.streams:
            if not fresh_mask[st.idx]:
                continue                      # no duplicate pushes
            d = depth_np[st.idx] if (depth_np is not None
                                     and st.wants_depth) else None
            st.out.put((sbs_np[st.idx], d, t0s[st.idx]))
            st.frames += 1
            st.fps.tick()
