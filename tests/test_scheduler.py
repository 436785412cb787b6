"""Scheduler: ordering, streaming, metrics."""
import time

import jax.numpy as jnp
import numpy as np

from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.serving.scheduler import Scheduler
from umbrella_tpu.speculation.static_engine import StaticEngine

from test_static_engine import MAX_LEN, _cfg


def _engine():
    eng = StaticEngine(
        draft_model_name=random_runtime(_cfg(), MAX_LEN, seed=1),
        target_model_name=random_runtime(_cfg(), MAX_LEN, seed=0),
        dtype=jnp.float32, growmap=growmap_from_spec(3, 4), max_length=MAX_LEN,
        safe_buffer=32, eos_token_ids=[-1])
    eng.initialize()
    return eng


def test_scheduler_processes_requests_and_tracks_metrics():
    sched = Scheduler([_engine()])
    sched.start()
    try:
        futs = [sched.submit(input_ids=[1, 5, 9 + i], max_new_tokens=8)
                for i in range(3)]
        results = [f.result(timeout=120) for f in futs]
        for r in results:
            assert len(r["generated_tokens"]) >= 8
        assert sched.metrics["requests"] == 3
        assert sched.metrics["tokens"] >= 24
        assert sched.metrics["busy_seconds"] > 0
    finally:
        sched.shutdown()


def test_scheduler_priority_order():
    eng = _engine()
    sched = Scheduler([eng])
    # don't start workers yet: enqueue first, then drain in priority order
    low = sched.submit(priority=20, input_ids=[1, 2, 3], max_new_tokens=4)
    high = sched.submit(priority=1, input_ids=[4, 5, 6], max_new_tokens=4)
    order = []
    orig_generate = eng.generate

    def spy(**kw):
        order.append(tuple(kw["input_ids"]))
        return orig_generate(**kw)

    eng.generate = spy
    sched.start()
    high.result(timeout=120)
    low.result(timeout=120)
    sched.shutdown()
    assert order[0] == (4, 5, 6)  # high priority ran first


def test_per_priority_metrics_and_snapshot():
    sched = Scheduler([_engine()])
    sched.start()
    try:
        f1 = sched.submit(priority=1, input_ids=[1, 2, 3], max_new_tokens=4)
        f2 = sched.submit(priority=5, input_ids=[4, 5, 6], max_new_tokens=4)
        f3 = sched.submit(priority=5, input_ids=[7, 8, 9], max_new_tokens=4)
        for f in (f1, f2, f3):
            f.result(timeout=120)
        snap = sched.snapshot_metrics()
        assert snap["by_priority"]["1"]["requests"] == 1
        assert snap["by_priority"]["5"]["requests"] == 2
        assert snap["by_priority"]["5"]["tokens"] >= 8
        assert snap["by_priority"]["1"]["queue_seconds"] >= 0.0
        assert snap["priority_inversions"] == 0  # single worker: pops in order
        # snapshot is a COPY: mutating it must not touch live metrics
        snap["by_priority"]["1"]["requests"] = 99
        assert sched.metrics["by_priority"]["1"]["requests"] == 1
    finally:
        sched.shutdown()


def test_expired_requests_count_in_priority_bucket():
    import time as _time

    from umbrella_tpu.serving.scheduler import DeadlineExpired

    sched = Scheduler([_engine()])
    fut = sched.submit(priority=7, deadline_s=0.01, input_ids=[1, 2],
                       max_new_tokens=4)
    _time.sleep(0.1)  # let it expire before any worker exists
    sched.start()
    try:
        try:
            fut.result(timeout=30)
            assert False, "expected DeadlineExpired"
        except DeadlineExpired:
            pass
        snap = sched.snapshot_metrics()
        assert snap["by_priority"]["7"]["expired"] == 1
        assert snap["by_priority"]["7"]["requests"] == 0
    finally:
        sched.shutdown()


def test_on_slot_admission_counts_scheduler_queue_inversion():
    sched = Scheduler([_engine()])  # workers never started: queue is static
    sched.submit(priority=1, input_ids=[1], max_new_tokens=1)
    sched._on_slot_admission(5)          # better (1) waiting -> inversion
    sched._on_slot_admission(1)          # nothing better than 1 -> no
    sched._on_slot_admission(5, downstream_better=True)  # batcher-side report
    assert sched.metrics["priority_inversions"] == 2


def test_batcher_fifo_inversion_reported_at_admission():
    """A better-priority request stuck BEHIND a worse one in the batcher FIFO
    is reported as that worse request's inversion at slot admission."""
    from umbrella_tpu.serving.batched_engine import (BatchedStaticEngine,
                                                     ContinuousBatcher)

    eng = BatchedStaticEngine(
        draft_model_name=random_runtime(_cfg(), MAX_LEN, seed=1),
        target_model_name=random_runtime(_cfg(), MAX_LEN, seed=0),
        batch_size=1, dtype=jnp.float32, growmap=growmap_from_spec(3, 4),
        max_length=MAX_LEN, safe_buffer=32, eos_token_ids=[-1],
        segment_steps=2)
    eng.initialize()
    batcher = ContinuousBatcher(eng)
    calls = {}

    def rec(name):
        return lambda downstream_better: calls.setdefault(name, downstream_better)

    # enqueue BEFORE starting the loop: FIFO pops A, then B (with better C
    # behind it -> inversion), then C (queue empty -> none)
    fa = batcher.submit(input_ids=[1, 5, 9], max_new_tokens=8,
                        _priority=5, _admit_cb=rec("A"))
    fb = batcher.submit(input_ids=[2, 6, 1], max_new_tokens=8,
                        _priority=5, _admit_cb=rec("B"))
    fc = batcher.submit(input_ids=[3, 7, 2], max_new_tokens=8,
                        _priority=1, _admit_cb=rec("C"))
    batcher.start()
    try:
        for f in (fa, fb, fc):
            f.result(timeout=120)
        assert calls["B"] is True, calls
        assert calls["C"] is False
    finally:
        batcher.shutdown()


def test_make_scheduler_lookahead_scales_with_batch():
    """Batcher workers default to B + max(2, B // 4): the flat +2 lookahead
    starved readmission at B=32 (~4-5 slots free per segment, only 2 staged
    requests ready — measured 519 vs 556 tok/s on v5e, round 5)."""
    from umbrella_tpu.serving.scheduler import make_scheduler

    class _B:
        def __init__(self, b):
            self.engine = type("E", (), {"batch_size": b})()

    assert len(make_scheduler(batcher=_B(4)).engines) == 6
    assert len(make_scheduler(batcher=_B(32)).engines) == 40
    assert len(make_scheduler(batcher=_B(8), workers=5).engines) == 5


def test_scheduler_shutdown_fails_queued_futures():
    """shutdown() must resolve futures still waiting in the queue — no worker
    will ever pop them, so leaving them pending hangs clients until their own
    timeouts (same contract as ContinuousBatcher.shutdown)."""
    import threading

    release = threading.Event()

    class _SlowEngine:
        def generate(self, **req):
            release.wait(timeout=30)
            return {"generated_text": "ok", "generated_tokens": [1],
                    "avg_accept_tokens": 1.0, "time_per_output_token": 1.0}

    sched = Scheduler([_SlowEngine()])  # ONE worker: the rest stay queued
    sched.start()
    futs = [sched.submit(max_new_tokens=4) for _ in range(4)]
    time.sleep(0.3)  # worker holds the first request; 3 remain queued
    sched._stop.set()
    release.set()  # let the in-flight one finish so join succeeds
    sched.shutdown(wait=True)
    done = [f for f in futs if f.done()]
    assert len(done) == len(futs), "queued futures left pending after shutdown"
    errs = 0
    for f in futs:
        try:
            f.result(timeout=1)
        except RuntimeError as e:
            assert "shut down" in str(e)
            errs += 1
    assert errs >= 3  # everything the worker never started
