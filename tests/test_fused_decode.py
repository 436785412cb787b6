"""The one-dispatch fused decode loop must produce exactly the per-step loop's
tokens (greedy), for both engines."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.dynamic_engine import DynamicEngine
from umbrella_tpu.speculation.static_engine import StaticEngine

from test_static_engine import MAX_LEN, _cfg


@pytest.fixture(scope="module")
def runtimes():
    return (random_runtime(_cfg(), MAX_LEN, seed=0),
            random_runtime(_cfg(), MAX_LEN, seed=1))


def _static(target, draft):
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1])
    eng.initialize()
    return eng


def _dynamic(target, draft):
    eng = DynamicEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        max_length=MAX_LEN, safe_buffer=32, eos_token_ids=[-1],
        width=4, num_beams=6, depth=4)
    eng.initialize()
    return eng


@pytest.mark.parametrize("make", [_static, _dynamic])
def test_fused_matches_stepwise(runtimes, make):
    target, draft = runtimes
    prompt = [1, 17, 42, 9]

    eng = make(target, draft)
    assert eng._can_decode_fused()
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    steps = eng._decode_fused(24)
    fused_tokens = eng.tokens_host[start : eng.num_nodes].tolist()
    fused_n = eng.num_nodes - start
    assert fused_n >= 24 and steps >= 1

    eng2 = make(target, draft)
    assert eng2._prefill(np.asarray(prompt))
    start2 = eng2.num_nodes
    while (eng2.num_nodes - start2) < 24 and eng2.validate_status():
        eng2.build_tree()
        if not eng2.verify():
            break
    step_tokens = eng2.tokens_host[start2 : eng2.num_nodes].tolist()
    assert fused_tokens == step_tokens


def test_generate_uses_fused_path(runtimes):
    target, draft = runtimes
    eng = _static(target, draft)
    out = eng.generate(input_ids=[1, 5, 9], max_new_tokens=16)
    assert len(out["generated_tokens"]) >= 16
    assert out["avg_accept_tokens"] >= 1.0
