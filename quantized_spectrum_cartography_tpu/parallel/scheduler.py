"""Host-side continuous batching scheduler for map recoveries.

The reference processes one map per notebook run; production serving needs
a stream: requests arrive, get grouped into fixed-shape device batches
(XLA-friendly — no recompilation), dispatched to the sharded solver, and
results returned per-request.  Padding slots keep the batch shape static
when the queue runs dry.

The queue/dispatch loop is host-side (threads + a condition variable);
device work is one jitted batched solve per cycle.  A C++ queue backend
(runtime/cpp) can be slotted in via the same interface.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class _Request:
    payload: Dict[str, np.ndarray]
    future: Future


class RecoveryScheduler:
    """Continuous batching over a fixed-shape batched solver.

    solver_fn: dict of stacked arrays [B, ...] -> dict of stacked results.
    batch_size: the static device batch (pad slots replicate request 0).
    """

    def __init__(
        self,
        solver_fn: Callable[[Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]],
        batch_size: int,
        max_wait_ms: float = 50.0,
        pipeline_depth: int = 3,
        drain_threads: int = 2,
    ):
        """pipeline_depth bounds in-flight device batches (dispatch runs
        ahead of result downloads); drain_threads downloads results
        concurrently — with one drain thread, per-batch device_get
        round-trips serialize and bound throughput when the host<->device
        link latency exceeds per-batch compute (the round-2 15% serving
        gap); 2+ threads overlap download RTT across in-flight batches."""
        self._solver = solver_fn
        self._batch = batch_size
        self._max_wait = max_wait_ms / 1000.0
        self._depth = max(1, pipeline_depth)
        self._drains = max(1, drain_threads)
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_dispatched = 0
        self.maps_completed = 0

    def submit(self, payload: Dict[str, np.ndarray]) -> Future:
        """Enqueue one map recovery; resolves to its result dict."""
        f: Future = Future()
        self._q.put(_Request(payload, f))
        return f

    def shutdown(self, wait: bool = True):
        self._stop.set()
        if wait:
            self._thread.join(timeout=30)

    # ------------------------------------------------------------------

    def _collect(self) -> List[_Request]:
        reqs: List[_Request] = []
        try:
            reqs.append(self._q.get(timeout=0.1))
        except queue.Empty:
            return reqs
        deadline = self._max_wait
        import time
        t0 = time.time()
        while len(reqs) < self._batch and (time.time() - t0) < deadline:
            try:
                reqs.append(self._q.get(timeout=0.005))
            except queue.Empty:
                pass
        return reqs

    def _loop(self):
        # Pipelined serving: this loop dispatches (async) device solves
        # and hands in-flight results to a POOL of drain threads that
        # perform the blocking device_get and resolve the futures — batch
        # N's host transfer overlaps batch N+1's collection and compute,
        # and with 2+ drain threads the per-batch download round-trips
        # themselves overlap.  The depth semaphore bounds in-flight
        # device work (memory + queueing latency).
        import threading as _threading

        inflight: "queue.Queue" = queue.Queue()
        slots = _threading.Semaphore(self._depth)

        def drain():
            while True:
                item = inflight.get()
                if item is None:
                    return
                reqs, out, err = item
                try:
                    if err is None:
                        host = jax.device_get(out)
                        for i, r in enumerate(reqs):
                            r.future.set_result(
                                {k: v[i] for k, v in host.items()})
                        self.maps_completed += len(reqs)
                    else:
                        raise err
                except Exception as e:
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
                finally:
                    slots.release()

        drainers = [_threading.Thread(target=drain, daemon=True)
                    for _ in range(self._drains)]
        for d in drainers:
            d.start()
        try:
            while not self._stop.is_set():
                reqs = self._collect()
                if not reqs:
                    continue
                stacked = {}
                for k in reqs[0].payload:
                    arrs = [r.payload[k] for r in reqs]
                    # pad to the static batch with copies of request 0
                    while len(arrs) < self._batch:
                        arrs.append(arrs[0])
                    stacked[k] = jnp.asarray(np.stack(arrs))
                slots.acquire()
                try:
                    out = self._solver(stacked)   # async dispatch
                    inflight.put((reqs, out, None))
                except Exception as e:
                    inflight.put((reqs, None, e))
                self.batches_dispatched += 1
        finally:
            for _ in drainers:
                inflight.put(None)
            for d in drainers:
                d.join(timeout=30)
