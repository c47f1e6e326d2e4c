"""Per-stage latency + FPS statistics.

Mirrors the reference's observability (reference main.py:70-77 thread_latencies,
1081-1094 rolling FPS with running-sum average and sorted-window 1%-low) as a
small lock-free-ish module usable from any stage thread.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass
from typing import Deque, Dict, Optional


class StageLatency:
    """Last-value + EMA + bounded-history latency per named stage.

    The EMA feeds live displays (title bars, /stats); the history feeds
    end-of-run medians — a 3-frame EMA is meaningless for benchmarking,
    a median over the full run is (the reference reports avg + 1%-low
    over its whole session, reference main.py:1202-1230)."""

    def __init__(self, history: int = 4096) -> None:
        self._lock = threading.Lock()
        self._last: Dict[str, float] = {}
        self._ema: Dict[str, float] = {}
        self._hist: Dict[str, Deque[float]] = {}
        self._history = history

    def record(self, stage: str, seconds: float, ema_alpha: float = 0.9) -> None:
        with self._lock:
            self._last[stage] = seconds
            prev = self._ema.get(stage)
            self._ema[stage] = seconds if prev is None else prev * ema_alpha + seconds * (1 - ema_alpha)
            hist = self._hist.get(stage)
            if hist is None:
                hist = self._hist[stage] = deque(maxlen=self._history)
            hist.append(seconds)

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            return dict(self._ema)

    def medians(self) -> Dict[str, float]:
        """Per-stage median over the recorded history (up to `history`
        most recent samples)."""
        with self._lock:
            out = {}
            for stage, hist in self._hist.items():
                xs = sorted(hist)
                n = len(xs)
                if n == 0:
                    continue
                mid = n // 2
                out[stage] = xs[mid] if n % 2 else 0.5 * (xs[mid - 1] + xs[mid])
            return out

    def counts(self) -> Dict[str, int]:
        with self._lock:
            return {stage: len(hist) for stage, hist in self._hist.items()}

    def total(self) -> float:
        with self._lock:
            return sum(self._ema.values())


class FpsCounter:
    """Rolling-window FPS: average + 1%-low (reference main.py:1081-1094)."""

    def __init__(self, window: int = 240) -> None:
        self.window = window
        self._times: Deque[float] = deque(maxlen=window + 1)
        self._lock = threading.Lock()

    def tick(self, now: Optional[float] = None) -> None:
        with self._lock:
            self._times.append(now if now is not None else time.perf_counter())

    def stats(self) -> Dict[str, float]:
        with self._lock:
            ts = list(self._times)
        if len(ts) < 2:
            return {"fps": 0.0, "fps_1pct_low": 0.0, "frame_ms": 0.0}
        deltas = [b - a for a, b in zip(ts, ts[1:]) if b > a]
        if not deltas:
            return {"fps": 0.0, "fps_1pct_low": 0.0, "frame_ms": 0.0}
        avg = sum(deltas) / len(deltas)
        # 1%-low = fps at the 99th-percentile (slowest-tail) frame interval;
        # clamp into range so small windows pick the single worst delta.
        worst = sorted(deltas)[min(len(deltas) - 1, int(len(deltas) * 0.99))]
        return {
            "fps": 1.0 / avg,
            "fps_1pct_low": 1.0 / worst if worst > 0 else 0.0,
            "frame_ms": avg * 1000.0,
        }
