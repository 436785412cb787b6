"""Pipeline-parallel INFERENCE: staged decode with per-stage KV must be
token-identical with the unsharded engine (greedy). Covers dense (packed) and
AWQ (stacked-layered) targets, plus the scratch-tail KV isolation property.

Counterpart of the TP equality tests (test_training_and_parallel.py); the
reference has no intra-model parallelism at all (SURVEY §2) — PP inference is
the capacity axis of the north-star extension (parallel/pipeline.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import random_awq_runtime, random_runtime
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.static_engine import StaticEngine

MAX_LEN = 256


def _cfg(vocab=256):
    return ModelConfig(
        vocab_size=vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, max_position_embeddings=MAX_LEN,
        tie_word_embeddings=True, eos_token_id=-1,
    )


def _engine(target, draft, **kw):
    gm = growmap_from_spec(3, 4, acc=[0.5, 0.3, 0.2, 0.1])
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=gm, max_length=MAX_LEN, eos_token_ids=[-1], temperature=0.0,
        safe_buffer=32, seed=0, **kw)
    eng.initialize()
    return eng


def _decode(eng, prompt, steps=6):
    assert eng._prefill(prompt)
    for _ in range(steps):
        eng.build_tree()
        eng.verify()
    return eng.tokens_host[: eng.num_nodes + 1].tolist()


PROMPT = np.asarray([5, 9, 17, 3, 44, 71, 20, 8], np.int32)


@pytest.mark.parametrize("stages", [2, 4])
def test_pp_decode_matches_unsharded_dense(stages):
    cfg = _cfg()
    ref = _decode(_engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                          random_runtime(cfg, MAX_LEN, jnp.float32, seed=1)),
                  PROMPT)
    pp = _decode(_engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                         random_runtime(cfg, MAX_LEN, jnp.float32, seed=1),
                         pipeline_parallel=stages),
                 PROMPT)
    assert pp == ref
    assert len(ref) > len(PROMPT) + 6  # actually decoded


def test_pp_decode_matches_unsharded_awq():
    cfg = _cfg()
    kw = dict(max_length=MAX_LEN, dtype=jnp.float32, seed=2, group_size=32,
              quantize_lm_head=False)
    ref = _decode(_engine(random_awq_runtime(cfg, **kw),
                          random_runtime(cfg, MAX_LEN, jnp.float32, seed=1)),
                  PROMPT)
    pp = _decode(_engine(random_awq_runtime(cfg, **kw),
                         random_runtime(cfg, MAX_LEN, jnp.float32, seed=1),
                         pipeline_parallel=2),
                 PROMPT)
    assert pp == ref


def test_pp_fused_decode_loop():
    """The whole-request fused lax.while_loop decode compiles and runs with the
    shard_map staged forward inside it, and matches stepwise PP decode."""
    cfg = _cfg()
    step = _decode(_engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                           random_runtime(cfg, MAX_LEN, jnp.float32, seed=1),
                           pipeline_parallel=2),
                   PROMPT, steps=5)
    eng = _engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                  random_runtime(cfg, MAX_LEN, jnp.float32, seed=1),
                  pipeline_parallel=2)
    assert eng._prefill(PROMPT)
    n0 = eng.num_nodes
    steps = eng._decode_fused(len(step) - len(PROMPT) - 2)
    assert steps >= 1
    fused = eng.tokens_host[: eng.num_nodes + 1].tolist()
    assert fused == step[: len(fused)]


def test_pp_kv_scratch_isolated():
    """Garbage-tick KV writes land in the scratch tail: the live [0, max_length)
    region of each stage's cache matches the unsharded engine's cache."""
    cfg = _cfg()
    ref_eng = _engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                      random_runtime(cfg, MAX_LEN, jnp.float32, seed=1))
    pp_eng = _engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                     random_runtime(cfg, MAX_LEN, jnp.float32, seed=1),
                     pipeline_parallel=2)
    _decode(ref_eng, PROMPT, steps=3)
    _decode(pp_eng, PROMPT, steps=3)
    n = ref_eng.num_nodes
    k_ref = np.asarray(ref_eng.kv_target.k)[:, :, :n]
    k_pp = np.asarray(pp_eng.kv_target.k)[:, :, :n]
    np.testing.assert_allclose(k_pp, k_ref, rtol=2e-5, atol=2e-5)
    assert pp_eng.kv_target.k.shape[2] == MAX_LEN + 512  # scratch tail exists


def test_pp_decode_int8_kv_matches_unsharded_int8():
    """PP staging composes with the int8 KV cache: quantized writes/compaction
    happen per stage and the scratch-tail diversion covers the scale planes."""
    cfg = _cfg()
    ref = _decode(_engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                          random_runtime(cfg, MAX_LEN, jnp.float32, seed=1),
                          kv_dtype="int8"),
                  PROMPT)
    pp = _decode(_engine(random_runtime(cfg, MAX_LEN, jnp.float32, seed=0),
                         random_runtime(cfg, MAX_LEN, jnp.float32, seed=1),
                         kv_dtype="int8", pipeline_parallel=2),
                 PROMPT)
    assert pp == ref
