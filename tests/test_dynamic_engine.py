"""Dynamic beam-tree engine tests: lossless greedy property + API contract."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.speculation.dynamic_engine import DynamicEngine

from test_static_engine import _cfg, _greedy_ar_decode

MAX_LEN = 256


@pytest.fixture(scope="module")
def runtimes():
    cfg = _cfg()
    return (random_runtime(cfg, MAX_LEN, seed=0),
            random_runtime(cfg, MAX_LEN, seed=1))


def _make_engine(target, draft, **kw):
    eng = DynamicEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        max_length=MAX_LEN, safe_buffer=32, eos_token_ids=[-1],
        width=4, num_beams=6, depth=4, **kw)
    eng.initialize()
    return eng


def test_greedy_dynamic_matches_ar_decode(runtimes):
    target, draft = runtimes
    eng = _make_engine(target, draft)
    prompt = [1, 17, 42, 9, 55]
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    steps = 0
    while (eng.num_nodes - start) < 30 and eng.validate_status():
        eng.build_tree()
        eng.verify()
        steps += 1
    produced = eng.tokens_host[start + 1 : eng.num_nodes + 1].tolist()
    # Note: token at `start` is the prefill next-token with EOS banned; from there on
    # greedy spec-decode must equal the AR continuation of the committed prefix.
    prefix = eng.tokens_host[: start + 1].tolist()
    oracle = _greedy_ar_decode(target, prefix, len(produced))
    assert produced == oracle[: len(produced)]
    assert eng.num_nodes - start >= steps


def test_dynamic_self_draft_accept_depth(runtimes):
    target, _ = runtimes
    eng = _make_engine(target, target)
    assert eng._prefill(np.asarray([3, 7, 11]))
    before = eng.num_nodes
    eng.build_tree()
    eng.verify()
    # with draft == target the greedy root path is always accepted to full depth
    assert eng.num_nodes - before == eng.tree_depth + 1


def test_dynamic_generate_contract(runtimes):
    target, draft = runtimes
    eng = _make_engine(target, draft)
    out = eng.generate(input_ids=[1, 5, 9], max_new_tokens=12)
    assert len(out["generated_tokens"]) >= 12
    assert out["avg_accept_tokens"] >= 1.0
    assert eng.num_nodes == 0
