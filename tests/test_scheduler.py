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
