"""Socket API server/client round trip with a real (tiny) engine."""
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.api.client import APIClient
from umbrella_tpu.api.server import APIServer
from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.static_engine import StaticEngine

from test_static_engine import MAX_LEN, _cfg


class _FakeTokenizer:
    def encode(self, text):
        return [1] + [ord(c) % 90 + 2 for c in text][:16]

    def decode(self, ids, **kw):
        return " ".join(str(i) for i in ids)


def test_server_client_roundtrip():
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
        confirmation = client.run()
        assert confirmation["status"] == "connected"

        out = client.get_output(context="hello world", max_new_tokens=8)
        assert out["processed"] is True
        assert len(out["generated_tokens"]) >= 8
        assert out["avg_accept_tokens"] >= 1.0

        out2 = client.get_output(input_ids=[1, 5, 9], max_new_tokens=8)
        assert len(out2["generated_tokens"]) >= 8
        client.close()
    finally:
        server.shutdown()


def test_server_continuous_batching_concurrent_clients():
    """Two clients served CONCURRENTLY through the multi-slot engine; each gets the
    same tokens the single-slot greedy engine would produce (slot isolation)."""
    from umbrella_tpu.serving.batched_engine import (
        BatchedStaticEngine, ContinuousBatcher)

    target = random_runtime(_cfg(), MAX_LEN, seed=0)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    gm = growmap_from_spec(3, 4)

    # single-slot oracle
    ref_eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=gm, max_length=MAX_LEN, safe_buffer=32, eos_token_ids=[-1])
    ref_eng.initialize()
    prompts = ([1, 5, 9, 12], [2, 7, 3])
    refs = [ref_eng.generate(input_ids=list(p), max_new_tokens=8)["generated_tokens"]
            for p in prompts]

    beng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target, batch_size=2,
        dtype=jnp.float32, growmap=gm, max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], tokenizer=_FakeTokenizer())
    beng.initialize()
    batcher = ContinuousBatcher(beng)

    server = APIServer(config={}, port=0, batcher=batcher)
    server.start()
    try:
        results = {}

        def one_client(i, prompt):
            c = APIClient(port=server.port, retry_seconds=0.2)
            c.run()
            results[i] = c.get_output(input_ids=list(prompt), max_new_tokens=8)
            c.close()

        threads = [threading.Thread(target=one_client, args=(i, p))
                   for i, p in enumerate(prompts)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, ref in enumerate(refs):
            assert results[i]["processed"] is True
            got = results[i]["generated_tokens"]
            n = min(len(got), len(ref))
            assert n >= 8 and got[:n] == list(ref)[:n], (i, got, ref)
    finally:
        server.shutdown()


def test_server_worker_survives_generate_failure():
    """A request that makes generate() raise must fail THAT client with an
    error result — not kill the single worker thread (which would leave every
    later request queued forever; the regression this guards against)."""

    class _FlakyEngine:
        def __init__(self):
            self.calls = 0

        def generate(self, **req):
            self.calls += 1
            if req.get("boom"):
                raise RuntimeError("injected generate failure")
            return {"generated_text": "ok", "generated_tokens": [1, 2, 3],
                    "avg_accept_tokens": 1.0, "time_per_output_token": 1.0}

    eng = _FlakyEngine()
    server = APIServer(config={}, port=0, engine=eng)
    server.start()
    try:
        client = APIClient(port=server.port, retry_seconds=0.2)
        client.run()
        bad = client.get_output(boom=True)
        assert bad["processed"] is False
        assert "injected generate failure" in bad["error"]
        # the worker must still be alive: a second request completes normally
        good = client.get_output(max_new_tokens=4)
        assert good["processed"] is True
        assert good["generated_tokens"] == [1, 2, 3]
        assert eng.calls == 2
        client.close()
    finally:
        server.shutdown()
