"""Dynamic micro-batching for single-device serving.

Requests from concurrent connections land in one queue; a single worker
thread drains it, groups up to the largest bucket within ``max_wait_ms``,
and issues ONE device call for the group.  On a single TPU this is the
throughput lever: the denoiser step at batch 8 costs far less than 8x the
batch-1 step (the MXU is underfed at batch 1), so batching converts queue
depth into throughput without extra chips.

The wait bound keeps the latency tail honest: at low offered load a lone
request waits at most ``max_wait_ms`` before running at bucket 1.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence

import numpy as np


class Overloaded(RuntimeError):
    """Queue full — the HTTP layer maps this to 503 so clients back off."""


class ServerClosing(RuntimeError):
    """Shutdown in progress — queued/new requests are failed fast."""


class _Request:
    __slots__ = ("payload", "future", "t_enqueue")

    def __init__(self, payload):
        self.payload = payload
        self.future: Future = Future()
        self.t_enqueue = time.perf_counter()


class Stats:
    """Lock-protected serving counters (rendered by /v1/stats)."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.batches = collections.Counter()   # executed batch size -> count
        self._lat = collections.deque(maxlen=window)
        self.t_start = time.time()

    def record(self, batch_size: int, latencies_s: Sequence[float]):
        with self._lock:
            self.requests += len(latencies_s)
            self.batches[batch_size] += 1
            self._lat.extend(latencies_s)

    def record_error(self, n: int = 1):
        with self._lock:
            self.errors += n

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat)
            pct = (lambda p: round(lat[min(len(lat) - 1,
                                           int(p * len(lat)))] * 1e3, 2)
                   if lat else None)
            return {
                "requests": self.requests,
                "errors": self.errors,
                "uptime_s": round(time.time() - self.t_start, 1),
                "batch_histogram": dict(sorted(self.batches.items())),
                "latency_ms": {"p50": pct(0.50), "p95": pct(0.95),
                               "p99": pct(0.99)},
            }


class MicroBatcher:
    """Group concurrent requests and run them through ``process_fn``.

    ``process_fn(batch: np.ndarray [b, ...]) -> np.ndarray [b, ...]`` —
    the engine call; padding to the bucket happens inside the engine.
    """

    def __init__(self, process_fn: Callable[[np.ndarray], np.ndarray],
                 max_batch: int, *, max_wait_ms: float = 5.0,
                 max_queue: int = 256, stats: Optional[Stats] = None,
                 name: str = "batcher"):
        self._process = process_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._q: "queue.Queue[_Request]" = queue.Queue(maxsize=max_queue)
        self.stats = stats or Stats()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, name=name,
                                        daemon=True)
        self._worker.start()

    def submit(self, payload: np.ndarray) -> Future:
        req = _Request(payload)
        if self._stop.is_set():
            req.future.set_exception(
                ServerClosing("server shutting down"))
            return req.future
        try:
            self._q.put_nowait(req)
        except queue.Full:
            req.future.set_exception(
                Overloaded("server overloaded: request queue full"))
        return req.future

    def close(self):
        """Stop the worker and FAIL every still-queued request — a future
        that is never resolved would park its HTTP thread for the full
        client timeout during shutdown."""
        self._stop.set()
        self._worker.join(timeout=5.0)
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.future.set_exception(ServerClosing("server shutting down"))

    # ------------------------------------------------------------- worker

    def _collect(self) -> List[_Request]:
        """Block for one request, then sweep until the bucket fills or the
        wait bound passes."""
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        group = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(group) < self.max_batch:
            remain = deadline - time.perf_counter()
            if remain <= 0:
                break
            try:
                group.append(self._q.get(timeout=remain))
            except queue.Empty:
                break
        return group

    def _loop(self):
        # EVERYTHING a group touches runs inside the try: an exception that
        # escaped this loop would kill the only worker thread and leave the
        # group's (and all later) futures unresolved — a silent hang behind a
        # healthy-looking /healthz.
        while not self._stop.is_set():
            group = self._collect()
            if not group:
                continue
            try:
                batch = np.stack([r.payload for r in group])
                out = self._process(batch)
                t_done = time.perf_counter()
                self.stats.record(len(group),
                                  [t_done - r.t_enqueue for r in group])
                for i, r in enumerate(group):
                    r.future.set_result(out[i])
            except Exception as e:  # propagate to every waiter
                self.stats.record_error(len(group))
                for r in group:
                    if not r.future.done():
                        r.future.set_exception(e)
