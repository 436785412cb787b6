"""Streaming through the batcher/scheduler/server + prefill/decode interleaving.

VERDICT r3 items 3 and 4: the reference's core UX is generate_stream — partial
text per accept step (ref static engine :437-566) — and that contract must
survive the batched/scheduled deployment configs; long-prompt admission must
not stall the other decoding slots.
"""
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.serving.batched_engine import (
    BatchedStaticEngine, ContinuousBatcher, _SlotTracker)

from test_static_engine import MAX_LEN, _cfg
from test_api_server import _FakeTokenizer


def _batched(batch_size=2, max_length=MAX_LEN, segment_steps=2, **kw):
    target = random_runtime(_cfg(), max_length, seed=0)
    draft = random_runtime(_cfg(), max_length, seed=1)
    eng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target,
        batch_size=batch_size, dtype=jnp.float32, growmap=growmap_from_spec(3, 4),
        max_length=max_length, safe_buffer=32, eos_token_ids=[-1],
        segment_steps=segment_steps, **kw)
    eng.initialize()
    return eng


def test_batcher_stream_partial_frames():
    """A streaming request gets >=2 monotonically growing partial frames before
    its future resolves with the full result."""
    eng = _batched(tokenizer=_FakeTokenizer())
    batcher = ContinuousBatcher(eng)
    batcher.start()
    try:
        frames = []
        fut = batcher.submit(input_ids=[1, 5, 9], max_new_tokens=40,
                             stream_cb=lambda text, perf: frames.append((text, perf)))
        result = fut.result(timeout=120)
        assert len(result["generated_tokens"]) >= 40
        assert len(frames) >= 2, frames
        # monotonic text growth; final frame's text is a prefix-consistent view
        lens = [len(t) for t, _ in frames]
        assert lens == sorted(lens)
        assert all(isinstance(p, str) and "Accept" in p for _, p in frames)
        # frames carry the clamped committed window, never more than max_new
        assert len(frames[-1][0].split()) <= 41
    finally:
        batcher.shutdown()


def test_scheduler_batcher_stream_relays_frames():
    from umbrella_tpu.serving.scheduler import make_scheduler

    eng = _batched(tokenizer=_FakeTokenizer())
    batcher = ContinuousBatcher(eng)
    batcher.start()
    sched = make_scheduler(batcher=batcher)
    sched.start()
    try:
        frames = []
        fut = sched.submit(input_ids=[2, 7, 3], max_new_tokens=40,
                           stream_cb=lambda text, perf: frames.append((text, perf)))
        result = fut.result(timeout=120)
        assert len(result["generated_tokens"]) >= 40
        # the worker relays the batcher's partial frames plus one final frame
        # whose perf slot is the result dict
        assert len(frames) >= 3
        assert isinstance(frames[-1][1], dict)
        assert frames[-1][1]["generated_tokens"] == result["generated_tokens"]
    finally:
        sched.shutdown(wait=False)
        batcher.shutdown()


def test_server_stream_batched_client_gets_partials():
    """VERDICT item 3 'done' bar: a socket client receives >=2 partial frames
    before the final result dict, on the batched (deployment) path."""
    from umbrella_tpu.api.client import APIClient
    from umbrella_tpu.api.server import APIServer

    eng = _batched(tokenizer=_FakeTokenizer())
    batcher = ContinuousBatcher(eng)
    server = APIServer(config={}, port=0, batcher=batcher)
    server.start()
    try:
        client = APIClient(port=server.port, retry_seconds=0.2)
        client.run()
        frames = list(client.stream_output(input_ids=[1, 5, 9],
                                           max_new_tokens=40, req_id="r1"))
        client.close()
        partials, finals = frames[:-1], frames[-1]
        assert len(partials) >= 2, frames
        assert all(f["partial"] for f in partials)
        assert finals["processed"] is True
        assert finals["req_id"] == "r1"
        assert len(finals["generated_tokens"]) >= 40
    finally:
        server.shutdown()


def test_server_stream_single_engine_path():
    from umbrella_tpu.api.client import APIClient
    from umbrella_tpu.api.server import APIServer
    from umbrella_tpu.speculation.static_engine import StaticEngine

    target = random_runtime(_cfg(), MAX_LEN, seed=0)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], tokenizer=_FakeTokenizer())
    eng.initialize()
    server = APIServer(config={}, port=0, engine=eng)
    server.start()
    try:
        client = APIClient(port=server.port, retry_seconds=0.2)
        client.run()
        frames = list(client.stream_output(input_ids=[1, 5, 9],
                                           max_new_tokens=48))
        client.close()
        assert frames[-1].get("processed") is True
        assert len(frames) >= 2  # at least one partial + the final
        assert any(f.get("partial") for f in frames[:-1])
    finally:
        server.shutdown()


def test_interleaved_admission_keeps_decoding():
    """VERDICT item 4 'done' bar: while a long prompt admits chunk by chunk,
    already-active slots keep committing tokens between chunks, and the
    interleaved request's output is untouched by the interleaving (token
    identity vs synchronous admission)."""
    long_prompt = list(np.random.default_rng(3).integers(1, 90, size=600))
    eng = _batched(batch_size=2, max_length=1024)

    # oracle: same engine config, synchronous admission
    ref = _batched(batch_size=2, max_length=1024)
    assert ref.admit(0, long_prompt)
    ref_tracker = _SlotTracker(ref)
    ref_tracker._register(0, "x", dict(max_new_tokens=24))
    while ref.active[0]:
        ref_tracker.harvest(ref.step_many(4, ref_tracker.stop_at))
    ref_toks = ref.tokens_host[0, 600:624].tolist()

    st = _SlotTracker(eng)
    assert st.try_admit(0, "A", dict(input_ids=[1, 5, 9], max_new_tokens=200))
    assert st.begin_admit(1, "B", dict(input_ids=long_prompt,
                                       max_new_tokens=24))
    # long_prompt needs >= 2 prefill chunks (600 > 512-token max bucket)
    progress = []
    while st.pending:
        st.advance_admissions(1)
        before = int(eng.num_nodes[0])
        st.harvest(eng.step_many(2, st.stop_at))
        progress.append(int(eng.num_nodes[0]) - before)
    # slot 0 kept decoding during B's chunked admission
    assert all(p >= 2 for p in progress) and len(progress) >= 2, progress
    assert eng.active[1]  # B admitted and decoding
    while any(eng.active):
        st.harvest(eng.step_many(4, st.stop_at))
    assert eng.tokens_host[1, 600:624].tolist() == ref_toks


def test_gradio_backend_streams_on_batched_path():
    """app/gradio_chat.make_backend wraps a BatchedStaticEngine so the chat's
    generate_stream(context=...) yields partial frames from the batched path."""
    import importlib.util
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    argv, sys.argv = sys.argv, ["gradio_chat.py"]
    try:
        spec = importlib.util.spec_from_file_location(
            "gradio_chat_backend_test", root / "app" / "gradio_chat.py")
        gc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(gc)
    finally:
        sys.argv = argv

    eng = _batched(tokenizer=_FakeTokenizer())
    backend = gc.make_backend(eng)
    try:
        frames = list(backend.generate_stream(context="hello there",
                                              max_new_tokens=40))
        assert len(frames) >= 3
        assert isinstance(frames[-1][1], dict)  # final carries the result dict
        assert len(frames[-1][1]["generated_tokens"]) >= 40
        assert gc._fmt_perf(frames[-1][1]).startswith("Avg Accept Tokens")
    finally:
        backend.batcher.shutdown()


def test_batcher_long_prompt_interleave_end_to_end():
    """Through the ContinuousBatcher: a short request decodes to completion
    while a long-prompt request is admitted; both finish with correct budgets."""
    long_prompt = list(np.random.default_rng(4).integers(1, 90, size=600))
    eng = _batched(batch_size=2, max_length=1024, tokenizer=_FakeTokenizer())
    batcher = ContinuousBatcher(eng)
    batcher.start()
    try:
        f1 = batcher.submit(input_ids=[1, 5, 9], max_new_tokens=16)
        f2 = batcher.submit(input_ids=long_prompt, max_new_tokens=16)
        r1 = f1.result(timeout=180)
        r2 = f2.result(timeout=180)
        assert len(r1["generated_tokens"]) >= 16
        assert len(r2["generated_tokens"]) >= 16
    finally:
        batcher.shutdown()


def test_admission_budget_scales_with_pending():
    """Round-4 occupancy fix: a flat 1-chunk budget starves readmission at
    high B (measured 190 vs 908 tok/s at B=32); the budget floors at the
    configured per_boundary and scales with pending admissions."""
    from umbrella_tpu.serving.batched_engine import ContinuousBatcher

    assert ContinuousBatcher.admission_budget(False, 0, 1) >= (1 << 20)
    assert ContinuousBatcher.admission_budget(True, 0, 1) == 1
    assert ContinuousBatcher.admission_budget(True, 5, 1) == 5
    assert ContinuousBatcher.admission_budget(True, 2, 4) == 4


def test_per_request_perf_contract_batched_path():
    """VERDICT r4 item 2: a batched-path client must get a REAL per-request
    time_per_output_token (> 0, reference contract at ref static engine
    :431-432) and a ttft_ms covering submit -> first committed tokens —
    not 0.0 and not an aggregate mean."""
    from umbrella_tpu.serving.scheduler import make_scheduler

    eng = _batched(tokenizer=_FakeTokenizer())
    batcher = ContinuousBatcher(eng)
    batcher.start()
    sched = make_scheduler(batcher=batcher)
    sched.start()
    try:
        t0 = time.time()
        futs = [sched.submit(input_ids=[1 + i, 5, 9], max_new_tokens=24)
                for i in range(3)]
        results = [f.result(timeout=120) for f in futs]
        wall_ms = 1000 * (time.time() - t0)
        tpots = [r["time_per_output_token"] for r in results]
        assert all(t > 0 for t in tpots), tpots
        assert all(r["ttft_ms"] > 0 for r in results)
        # per-request, not one shared aggregate: requests finish at different
        # syncs with different token counts, so the values must not all be
        # bitwise identical
        assert len(set(tpots)) > 1 or len(results) == 1, tpots
        # ttft (incl. queue wait at B=2 with 3 requests) is bounded by the
        # client-observed total wall for the whole burst
        assert all(r["ttft_ms"] <= wall_ms for r in results)
    finally:
        sched.shutdown(wait=False)
        batcher.shutdown()


def test_per_request_perf_contract_direct_run():
    """BatchedStaticEngine.run() fills per-request tpot/ttft too (the
    closed-loop path previously back-filled one aggregate mean)."""
    eng = _batched()
    res = eng.run([dict(input_ids=[3, 1, 4], max_new_tokens=16),
                   dict(input_ids=[2, 7, 1], max_new_tokens=48)])
    assert all(r["time_per_output_token"] > 0 for r in res)
    assert all(r["ttft_ms"] > 0 for r in res)
    assert res[0]["time_per_output_token"] != res[1]["time_per_output_token"]
