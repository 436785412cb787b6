"""Request scheduling layer.

The reference serializes every request through one mutex-guarded worker
(`umbrella/api/server.py:43-55`) — one request at a time, no queueing policy. This
module adds the scheduler layer the reference lacks (SURVEY.md §1 "no scheduler
layer"): an admission queue with priorities and deadlines, worker threads driving one
engine each (multi-engine = multi-chip data parallel serving), streaming callbacks,
and per-request metrics. Continuous batching across sequences within one engine
(north-star config[4]) builds on this scaffold once the batched KV cache lands.
"""
from __future__ import annotations

import functools
import itertools
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

from ..utils import setup_logger

logger = setup_logger()


@dataclass(order=True)
class _QueuedRequest:
    priority: int
    seq: int
    request: dict = field(compare=False)
    future: Future = field(compare=False)
    stream_cb: Optional[Callable] = field(compare=False, default=None)
    submitted_at: float = field(compare=False, default=0.0)
    deadline_s: Optional[float] = field(compare=False, default=None)


class DeadlineExpired(Exception):
    """Request spent longer than its deadline_s in the queue; never executed."""


class Scheduler:
    """Priority FIFO over one or more engines (one worker thread per engine)."""

    def __init__(self, engines: List[Any]):
        assert engines
        self.engines = engines
        self._q: "queue.PriorityQueue[_QueuedRequest]" = queue.PriorityQueue()
        self._seq = itertools.count()
        self._workers = []
        self._stop = threading.Event()
        self.metrics: Dict[str, Any] = {
            "requests": 0, "tokens": 0, "busy_seconds": 0.0,
            "queue_seconds": 0.0, "expired": 0,
            # Inversions actually OBSERVED at slot-admission time: a request
            # entered a decode slot while a strictly-better-priority request
            # was still waiting in this queue. The B+2 batcher lookahead
            # permits up to 2 of these per better-priority arrival
            # (make_scheduler docstring); this makes the cost measurable.
            "priority_inversions": 0,
            # str(priority) -> {requests, tokens, queue_seconds, expired};
            # string keys survive the JSON get_metrics round-trip (api/server)
            "by_priority": {}}
        self._metrics_lock = threading.Lock()

    def _priority_bucket(self, priority: int) -> Dict[str, float]:
        b = self.metrics["by_priority"].setdefault(
            str(priority),
            {"requests": 0, "tokens": 0, "queue_seconds": 0.0, "expired": 0})
        return b

    def start(self):
        for i, engine in enumerate(self.engines):
            t = threading.Thread(target=self._worker, args=(engine,),
                                 name=f"engine-worker-{i}", daemon=True)
            t.start()
            self._workers.append(t)

    def submit(self, priority: int = 10, stream_cb: Optional[Callable] = None,
               deadline_s: Optional[float] = None, **request) -> Future:
        """deadline_s: max seconds the request may WAIT in the queue; expired
        requests are dropped (future gets DeadlineExpired) instead of wasting
        engine time on an answer the client has abandoned."""
        fut: Future = Future()
        self._q.put(_QueuedRequest(
            priority=priority, seq=next(self._seq), request=request, future=fut,
            stream_cb=stream_cb, submitted_at=time.time(), deadline_s=deadline_s))
        return fut

    def _worker(self, engine):
        while not self._stop.is_set():
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            wait = time.time() - item.submitted_at
            if item.deadline_s is not None and wait > item.deadline_s:
                # expired requests count only in "expired" — adding their wait
                # to queue_seconds would skew the per-EXECUTED-request mean
                with self._metrics_lock:
                    self.metrics["expired"] += 1
                    self._priority_bucket(item.priority)["expired"] += 1
                item.future.set_exception(DeadlineExpired(
                    f"queued {wait:.2f}s > deadline {item.deadline_s:.2f}s"))
                continue
            t0 = time.time()
            if isinstance(engine, BatcherBackend):
                # admission-time inversion accounting: the batcher reports back
                # through this callback the moment the request enters a slot,
                # with whether a better-priority request sat behind it in the
                # batcher's own FIFO; _priority lets the batcher compare
                item.request["_priority"] = item.priority
                item.request["_submit_time"] = item.submitted_at  # TTFT incl. queue
                item.request["_admit_cb"] = functools.partial(
                    self._on_slot_admission, item.priority)
            err = None
            try:
                if item.stream_cb is not None:
                    partial = perf = None
                    for partial, perf in engine.generate_stream(**item.request):
                        item.stream_cb(partial, perf)
                    # a backend may yield its full result dict as the final perf
                    result = perf if isinstance(perf, dict) \
                        else {"generated_text": partial, "perf": perf}
                else:
                    result = engine.generate(**item.request)
                ntok = len(result.get("generated_tokens", []) or [])
            except Exception as e:  # pragma: no cover
                logger.exception("request failed")
                err = e
                ntok = 0
            # metrics BEFORE resolving: set_result runs done-callbacks inline,
            # so a client can read metrics right after receiving its response
            with self._metrics_lock:
                self.metrics["requests"] += 1
                self.metrics["tokens"] += ntok
                self.metrics["busy_seconds"] += time.time() - t0
                self.metrics["queue_seconds"] += wait
                b = self._priority_bucket(item.priority)
                b["requests"] += 1
                b["tokens"] += ntok
                b["queue_seconds"] += wait
            if err is None:
                item.future.set_result(result)
            else:
                item.future.set_exception(err)

    def _on_slot_admission(self, priority: int, downstream_better: bool = False):
        """A request of `priority` just entered a decode slot. It's an observed
        inversion if a strictly-better-priority request was still waiting —
        either behind it in the batcher's FIFO (`downstream_better`, computed
        by ContinuousBatcher._loop at pop time) or here in the scheduler queue
        (no free worker yet)."""
        if not downstream_better:
            with self._q.mutex:
                waiting = [i.priority for i in self._q.queue]
            if not waiting or min(waiting) >= priority:
                return
        with self._metrics_lock:
            self.metrics["priority_inversions"] += 1

    def snapshot_metrics(self) -> dict:
        """Consistent copy of the metrics (by_priority deep-copied) — the
        server serializes this to JSON while workers keep mutating."""
        with self._metrics_lock:
            out = dict(self.metrics)
            out["by_priority"] = {k: dict(v)
                                  for k, v in self.metrics["by_priority"].items()}
        return out

    def shutdown(self, wait: bool = True):
        self._stop.set()
        if wait:
            for t in self._workers:
                t.join(timeout=5)
        # Fail everything still queued: no worker will ever pop it, and a
        # client blocked on fut.result() must not hang until its own timeout
        # (same contract as ContinuousBatcher.shutdown). get_nowait is
        # thread-safe vs any worker still draining under wait=False.
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            try:
                item.future.set_exception(RuntimeError(
                    "Scheduler shut down before executing this request"))
            except Exception:
                pass  # resolved/cancelled concurrently


class BatcherBackend:
    """Adapts a ContinuousBatcher to the Scheduler's engine interface: `generate`
    submits into the batcher and blocks until the slot finishes. Pass the SAME
    backend `batch_size` times to Scheduler(engines=...) — each worker thread
    then holds one in-flight request, so up to B requests decode together in the
    batcher while the priority queue orders ADMISSION (priorities apply at the
    queue; slots already decoding are not preempted)."""

    def __init__(self, batcher):
        self.batcher = batcher

    def generate(self, **request):
        return self.batcher.submit(**request).result()

    def generate_stream(self, **request):
        """Partial frames (text_so_far, perf_log) per decode segment via the
        batcher's stream_cb (serving loop emit_partials), then one final
        (full_text, result_dict) — the dict rides the perf slot so the
        Scheduler worker keeps generated_tokens for its metrics."""
        frames: "queue.Queue" = queue.Queue()
        done = object()
        request["stream_cb"] = lambda text, perf: frames.put((text, perf))
        fut = self.batcher.submit(**request)
        fut.add_done_callback(lambda _f: frames.put(done))
        while True:
            item = frames.get()
            if item is done:
                break
            yield item
        result = fut.result()  # raises if the batcher failed the request
        yield result.get("generated_text", ""), result


def make_scheduler(engine=None, batcher=None, workers: Optional[int] = None
                   ) -> Scheduler:
    """Scheduler over a single engine OR a ContinuousBatcher. The serving-layer
    composition: priorities and queue metrics in front of either backend.

    Batcher workers default to batch_size + max(2, batch_size // 4): B workers
    keep all slots fed and the LOOKAHEAD keeps requests already queued inside
    the batcher, so freed slots re-admit at the very next segment boundary
    instead of waiting a worker wakeup round-trip (measured on v5e: 32-request
    open-load soak at B=8 p50 6.2 s with exactly-B workers vs 4.6 s direct; at
    B=32 seg=8 a +2 lookahead starves readmission — ~4-5 slots free per
    segment but only 2 staged requests are ready — costing ~25% of burst
    throughput vs B//4). The lookahead bounds the worst-case priority
    inversions per better-priority arrival at its size; raise `workers` for
    throughput, lower it for stricter priority ordering."""
    if batcher is not None:
        B = getattr(batcher.engine, "batch_size", 4)
        n = workers or (B + max(2, B // 4))
        return Scheduler([BatcherBackend(batcher)] * n)
    assert engine is not None
    if workers and workers > 1:
        # a single-slot engine is NOT thread-safe (generate mutates tokens/KV
        # state); N concurrent workers on one engine would interleave resets.
        # Multi-engine data-parallel serving passes Scheduler([eng1, eng2, ...])
        # with DISTINCT engines directly.
        raise ValueError(
            "workers > 1 on a single engine would run concurrent generate() "
            "on shared state; pass distinct engines to Scheduler(...) for DP")
    return Scheduler([engine])
