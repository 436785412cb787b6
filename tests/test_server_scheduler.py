"""Scheduler wired into the API server: a `"scheduler"` config key (or injected
Scheduler) routes socket requests through the priority queue — 2 priority classes
must execute in priority order while the worker is busy, and queue metrics are
readable by clients via `{"get_metrics": true}` (VERDICT-r2 item 5: the layer the
reference lacks, ref `umbrella/api/server.py:43-55`)."""
import threading
import time

import pytest

import jax.numpy as jnp

from umbrella_tpu.api.client import APIClient
from umbrella_tpu.api.server import APIServer
from umbrella_tpu.serving.scheduler import BatcherBackend, Scheduler, make_scheduler


class _SlowStubEngine:
    """Records execution order; sleeps so the queue backs up deterministically."""

    def __init__(self):
        self.order = []
        self.lock = threading.Lock()

    def generate(self, **req):
        with self.lock:
            self.order.append(req["tag"])
        time.sleep(float(req.get("sleep", 0.05)))
        return dict(generated_text=req["tag"], generated_tokens=[1],
                    avg_accept_tokens=1.0, time_per_output_token=1.0)


def test_priority_ordering_and_metrics_over_socket():
    stub = _SlowStubEngine()
    scheduler = Scheduler([stub])
    server = APIServer(config={}, port=0, scheduler=scheduler)
    server.start()
    try:
        results = {}

        def client_call(tag, priority, sleep):
            c = APIClient(port=server.port, retry_seconds=0.2)
            c.run()
            results[tag] = c.get_output(tag=tag, priority=priority, sleep=sleep)
            c.close()

        # blocker occupies the single worker; low arrives before high but high
        # (lower priority number) must execute first once the worker frees up
        t0 = threading.Thread(target=client_call, args=("blocker", 10, 0.6))
        t0.start()
        time.sleep(0.25)  # blocker is executing
        t1 = threading.Thread(target=client_call, args=("low", 20, 0.01))
        t1.start()
        time.sleep(0.1)  # low is queued (worker still busy)
        t2 = threading.Thread(target=client_call, args=("high", 1, 0.01))
        t2.start()
        for t in (t0, t1, t2):
            t.join(timeout=30)

        assert stub.order == ["blocker", "high", "low"], stub.order
        assert results["high"]["generated_text"] == "high"

        # metrics over the wire
        c = APIClient(port=server.port, retry_seconds=0.2)
        c.run()
        m = c.get_output(get_metrics=True)
        c.close()
        assert m["requests"] == 3
        assert m["queue_seconds"] > 0.1  # low+high waited behind the blocker
        assert m["busy_seconds"] > 0.5
        # per-priority split survives the JSON round-trip (string keys)
        assert m["by_priority"]["10"]["requests"] == 1
        assert m["by_priority"]["1"]["requests"] == 1
        assert m["by_priority"]["20"]["requests"] == 1
        assert m["by_priority"]["1"]["queue_seconds"] > 0.0
        assert m["priority_inversions"] == 0  # single worker pops in order
    finally:
        server.shutdown()


def test_deadline_expired_requests_are_dropped():
    """A request that waits past its deadline_s never executes; its future gets
    DeadlineExpired and the expired metric increments."""
    from umbrella_tpu.serving.scheduler import DeadlineExpired

    stub = _SlowStubEngine()
    sched = Scheduler([stub])
    sched.start()
    try:
        blocker = sched.submit(tag="blocker", sleep=0.5)
        time.sleep(0.1)  # blocker running
        doomed = sched.submit(tag="doomed", sleep=0.01, deadline_s=0.1)
        ok = sched.submit(tag="ok", sleep=0.01, deadline_s=30.0)
        blocker.result(timeout=10)
        with pytest.raises(DeadlineExpired):
            doomed.result(timeout=10)
        assert ok.result(timeout=10)["generated_text"] == "ok"
        assert "doomed" not in stub.order
        assert sched.metrics["expired"] == 1
    finally:
        sched.shutdown(wait=False)


def test_scheduler_config_key_with_real_engine():
    """`"scheduler": {...}` in the server config builds the scheduler around the
    config-built engine; requests round-trip with priorities."""
    from test_api_server import _FakeTokenizer
    from test_static_engine import MAX_LEN, _cfg

    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.speculation.static_engine import StaticEngine

    target = random_runtime(_cfg(), MAX_LEN, seed=0)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], tokenizer=_FakeTokenizer())
    eng.initialize()

    server = APIServer(config={"scheduler": {"workers": 1}}, port=0, engine=eng)
    server.start()
    try:
        assert server.scheduler is not None
        c = APIClient(port=server.port, retry_seconds=0.2)
        c.run()
        out = c.get_output(input_ids=[1, 5, 9], max_new_tokens=8, priority=1)
        assert out["processed"] is True and len(out["generated_tokens"]) >= 8
        m = c.get_output(get_metrics=True)
        assert m["requests"] == 1 and m["tokens"] >= 8
        c.close()
    finally:
        server.shutdown()


def test_empty_scheduler_config_enables_scheduler():
    """The shipped config's `\"scheduler\": {}` must build the scheduler (an
    empty dict is falsy — `if sched_cfg:` silently disabled the feature)."""
    stub = _SlowStubEngine()
    server = APIServer(config={"scheduler": {}}, port=0, engine=stub)
    server.start()
    try:
        assert server.scheduler is not None
        c = APIClient(port=server.port, retry_seconds=0.2)
        c.run()
        out = c.get_output(tag="x", sleep=0.01, priority=1)
        assert out["generated_text"] == "x"
        m = c.get_output(get_metrics=True)
        assert m["requests"] == 1 and m["expired"] == 0  # key present from init
        c.close()
    finally:
        server.shutdown()


def test_single_engine_multi_worker_rejected():
    """N workers on ONE engine would run concurrent generate() on shared
    mutable state — make_scheduler must refuse (DP needs distinct engines)."""
    with pytest.raises(ValueError, match="distinct engines"):
        make_scheduler(engine=_SlowStubEngine(), workers=4)


def test_batcher_stream_yields_text_and_result_dict():
    """BatcherBackend.generate_stream must not yield a (None, None) first chunk,
    and the worker's final result keeps generated_tokens for metrics."""
    from test_api_server import _FakeTokenizer
    from test_static_engine import MAX_LEN, _cfg

    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.serving.batched_engine import (BatchedStaticEngine,
                                                     ContinuousBatcher)

    beng = BatchedStaticEngine(
        draft_model_name=random_runtime(_cfg(), MAX_LEN, seed=1),
        target_model_name=random_runtime(_cfg(), MAX_LEN, seed=0), batch_size=2,
        dtype=jnp.float32, growmap=growmap_from_spec(3, 4), max_length=MAX_LEN,
        safe_buffer=32, eos_token_ids=[-1], tokenizer=_FakeTokenizer())
    beng.initialize()
    batcher = ContinuousBatcher(beng)
    batcher.start()
    sched = make_scheduler(batcher=batcher)
    sched.start()
    try:
        chunks = []
        fut = sched.submit(stream_cb=lambda t, p: chunks.append((t, p)),
                           input_ids=[1, 5, 9], max_new_tokens=8)
        result = fut.result(timeout=120)
        assert chunks and chunks[0][0] is not None  # no (None, None) first yield
        assert isinstance(chunks[-1][1], dict)
        assert len(result["generated_tokens"]) >= 8
        assert sched.metrics["tokens"] >= 8  # stream path keeps token metrics
    finally:
        sched.shutdown(wait=False)
        batcher.shutdown()


def test_scheduler_over_batcher_concurrent_slots():
    """make_scheduler(batcher=...) admits up to batch_size requests concurrently
    (B workers) while ordering admission by priority; results match the
    single-slot oracle per request."""
    from test_api_server import _FakeTokenizer
    from test_static_engine import MAX_LEN, _cfg

    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.serving.batched_engine import (BatchedStaticEngine,
                                                     ContinuousBatcher)
    from umbrella_tpu.speculation.static_engine import StaticEngine

    target = random_runtime(_cfg(), MAX_LEN, seed=0)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    gm = growmap_from_spec(3, 4)

    ref_eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=gm, max_length=MAX_LEN, safe_buffer=32, eos_token_ids=[-1])
    ref_eng.initialize()
    prompts = ([1, 5, 9, 12], [2, 7, 3], [4, 4, 8])
    refs = [ref_eng.generate(input_ids=list(p), max_new_tokens=8)["generated_tokens"]
            for p in prompts]

    beng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target, batch_size=2,
        dtype=jnp.float32, growmap=gm, max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], tokenizer=_FakeTokenizer())
    beng.initialize()
    batcher = ContinuousBatcher(beng)
    batcher.start()
    sched = make_scheduler(batcher=batcher)
    # batch_size + 2 lookahead workers (see make_scheduler)
    assert len(sched.engines) == 4 and isinstance(sched.engines[0], BatcherBackend)
    sched.start()
    try:
        futs = [sched.submit(priority=i, input_ids=list(p), max_new_tokens=8)
                for i, p in enumerate(prompts)]
        for fut, ref in zip(futs, refs):
            got = fut.result(timeout=120)["generated_tokens"]
            n = min(len(got), len(ref))
            assert n >= 8 and got[:n] == list(ref)[:n]
        assert sched.metrics["requests"] == 3
    finally:
        sched.shutdown(wait=False)
        batcher.shutdown()
