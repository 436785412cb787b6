"""Regressions for batched-engine review findings: prefill bucket clamping near
the cache end, scalar sampling params, budget-clamped responses, penalties < 1,
and ndarray input_ids through run()."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import ModelRuntime
from umbrella_tpu.models.llama import init_llama_params
from umbrella_tpu.serving.batched_engine import BatchedStaticEngine

TREE = os.path.join(os.path.dirname(__file__), "..", "umbrella_tpu", "trees",
                    "sequoia_tree-3x4.json")


def _runtime(seed, max_len):
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=512,
        tie_word_embeddings=False, eos_token_id=-1)
    params = init_llama_params(cfg, jax.random.PRNGKey(seed), max_len,
                               jnp.float32)
    return ModelRuntime(cfg, params, max_len, dtype=jnp.float32)


def _engine(max_len, **kw):
    eng = BatchedStaticEngine(
        draft_model_name=_runtime(1, max_len), target_model_name=_runtime(0, max_len),
        batch_size=2, dtype=jnp.float32, growmap_path=TREE, max_length=max_len,
        eos_token_ids=[-1], tokenizer=None, safe_buffer=16, **kw)
    eng.initialize()
    return eng


def test_admit_bucket_clamped_near_cache_end():
    """A prompt whose padded prefill bucket would extend past max_length must
    NOT corrupt committed state (dynamic slices clamp out-of-range starts):
    tokens decoded after a near-cap admission in a short-cache engine must
    equal the long-cache engine's."""
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 120, size=160).astype(np.int32)  # bucket 256 > 200-0

    eng_small = _engine(200)  # 160 < 200 - 2*16, but next_bucket(160)=256 > 200
    assert eng_small.admit(0, prompt)
    s0 = int(eng_small.num_nodes[0])
    for _ in range(3):
        eng_small.step()
    got = eng_small.tokens_host[0, s0: int(eng_small.num_nodes[0])].tolist()

    eng_big = _engine(512)
    assert eng_big.admit(0, prompt)
    for _ in range(3):
        eng_big.step()
    ref = eng_big.tokens_host[0, s0: int(eng_big.num_nodes[0])].tolist()
    assert got == ref and len(ref) >= 3
    # and the committed prompt survived intact in the short-cache engine
    np.testing.assert_array_equal(eng_small.tokens_host[0, :160], prompt)


def test_single_slot_prefill_bucket_clamped_near_cache_end():
    """Same hazard in the single-slot engines: a 160-token prompt in a
    max_length=200 engine picks bucket 256 > 200 without the clamp."""
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.speculation.static_engine import StaticEngine

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, 120, size=160).astype(np.int32)

    def _decode(max_len):
        eng = StaticEngine(
            draft_model_name=_runtime(1, max_len),
            target_model_name=_runtime(0, max_len), dtype=jnp.float32,
            growmap=growmap_from_spec(3, 4), max_length=max_len,
            eos_token_ids=[-1], safe_buffer=16, temperature=0.0)
        eng.initialize()
        assert eng._prefill(prompt)
        start = eng.num_nodes
        for _ in range(2):
            eng.build_tree()
            eng.verify()
        return eng, eng.tokens_host[start: eng.num_nodes].tolist()

    eng_small, got = _decode(200)
    _, ref = _decode(512)
    assert got == ref and len(ref) >= 2
    np.testing.assert_array_equal(eng_small.tokens_host[:160], prompt)


def test_step_accepts_scalar_sampling_params():
    eng = _engine(256)
    assert eng.admit(0, [1, 9, 23])
    out = eng.step(temperature=0.5, topp=0.9, penalty=1.2)  # scalars, B=2
    assert 0 in out
    # penalties below 1 are valid HF semantics and must engage the penalty path
    eng.step(penalty=0.5)
    assert any(k[0] for k in eng._step_cache)  # a use_pen=True variant compiled


def test_run_clamps_output_to_budget_and_accepts_ndarray():
    eng = _engine(256)
    reqs = [dict(input_ids=np.asarray([1, 9, 23, 7]), max_new_tokens=5),
            dict(input_ids=[5, 2, 61], max_new_tokens=4)]
    outs = eng.run(reqs)
    # <= max_new_tokens committed + 1 trailing token, never tree_size overshoot
    assert 1 <= len(outs[0]["generated_tokens"]) <= 6
    assert 1 <= len(outs[1]["generated_tokens"]) <= 5
