"""Continuous batching: the batched multi-slot engine must produce, for every slot,
exactly the tokens the single-slot engine produces (greedy, same weights), with
per-slot lengths and admissions/evictions interleaved."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.models.batched import (
    batched_llama_forward, init_batched_kv, slot_llama_forward)
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.models.llama import llama_forward
from umbrella_tpu.ops.masks import causal_mask_rows
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.serving.batched_engine import BatchedStaticEngine, ContinuousBatcher
from umbrella_tpu.speculation.static_engine import StaticEngine

from test_static_engine import MAX_LEN, _cfg, _greedy_ar_decode


@pytest.fixture(scope="module")
def models():
    target = random_runtime(_cfg(), MAX_LEN, seed=0)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    return draft, target


def test_batched_forward_matches_single(models):
    draft, target = models
    B, S = 3, 5
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 97, (B, S)), jnp.int32)
    offsets = jnp.asarray([0, 7, 3], jnp.int32)
    pos = offsets[:, None] + jnp.arange(S)[None, :]
    masks = jnp.stack([causal_mask_rows(offsets[b], S, MAX_LEN) for b in range(B)])

    kv_b = init_batched_kv(target.cfg, B, MAX_LEN, jnp.float32)
    got, kv_b = jax.jit(lambda p, kv, i, po, m, o: batched_llama_forward(
        p, target.args, kv, i, po, m, o))(target.params, kv_b, ids, pos, masks, offsets)

    for b in range(B):
        kv = init_kv_cache(target.cfg, MAX_LEN, jnp.float32)
        ref, _ = llama_forward(target.params, target.args, kv, ids[b], pos[b],
                               masks[b], offsets[b])
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_slot_forward_matches_single(models):
    _, target = models
    B, S = 2, 4
    ids = jnp.asarray([5, 17, 3, 88], jnp.int32)
    pos = jnp.arange(S)
    mask = causal_mask_rows(0, S, MAX_LEN)
    kv_b = init_batched_kv(target.cfg, B, MAX_LEN, jnp.float32)
    got, kv_b = jax.jit(lambda p, kv: slot_llama_forward(
        p, target.args, kv, ids, pos, mask, jnp.int32(1), jnp.int32(0)))(
        target.params, kv_b)
    kv = init_kv_cache(target.cfg, MAX_LEN, jnp.float32)
    ref, _ = llama_forward(target.params, target.args, kv, ids, pos, mask, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # slot 0 KV untouched
    assert float(jnp.abs(kv_b.k[:, 0]).sum()) == 0.0
    assert float(jnp.abs(kv_b.k[:, 1]).sum()) > 0.0


def _batched_engine(models, B=3):
    draft, target = models
    eng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target, batch_size=B,
        dtype=jnp.float32, growmap=growmap_from_spec(3, 4), max_length=MAX_LEN,
        safe_buffer=32, eos_token_ids=[-1])
    eng.initialize()
    return eng


def test_batched_greedy_matches_single_slot_engines(models):
    """Three slots with different prompt lengths decode together; every slot's
    output must equal the AR oracle on the same weights."""
    draft, target = models
    eng = _batched_engine(models, B=3)
    prompts = [[1, 17, 42, 9], [3, 3, 7], [50, 60, 70, 80, 90, 11]]
    starts = []
    for b, p in enumerate(prompts):
        assert eng.admit(b, p)
        starts.append(int(eng.num_nodes[b]))
    for _ in range(5):
        eng.step()
    for b, p in enumerate(prompts):
        produced = eng.tokens_host[b, starts[b]: int(eng.num_nodes[b]) + 1].tolist()
        assert len(produced) >= 6
        oracle = _greedy_ar_decode(target, p, len(produced))
        assert produced == oracle[: len(produced)], f"slot {b} diverged"


def test_continuous_batching_run_more_requests_than_slots(models):
    draft, target = models
    eng = _batched_engine(models, B=2)
    prompts = [[1, 17, 42, 9], [3, 3, 7], [50, 60, 70], [8, 9], [11, 12, 13]]
    reqs = [dict(input_ids=p, max_new_tokens=8) for p in prompts]
    results = eng.run(reqs)
    assert all(r is not None for r in results)
    for p, r in zip(prompts, results):
        toks = r["generated_tokens"]
        assert len(toks) >= 8
        oracle = _greedy_ar_decode(target, p, len(toks))
        assert toks == oracle[: len(toks)]


def test_continuous_batcher_futures(models):
    eng = _batched_engine(models, B=2)
    batcher = ContinuousBatcher(eng)
    batcher.start()
    try:
        futs = [batcher.submit(input_ids=[1, 17, 42, 9], max_new_tokens=6),
                batcher.submit(input_ids=[3, 3, 7], max_new_tokens=6),
                batcher.submit(input_ids=[8, 9], max_new_tokens=6)]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        batcher.shutdown()
    _, target = models
    for f, (p, out) in zip(futs, zip([[1, 17, 42, 9], [3, 3, 7], [8, 9]], outs)):
        toks = out["generated_tokens"]
        assert len(toks) >= 6
        oracle = _greedy_ar_decode(target, p, len(toks))
        assert toks == oracle[: len(toks)]


def test_batched_stochastic_step_runs(models):
    eng = _batched_engine(models, B=2)
    assert eng.admit(0, [1, 17, 42, 9])
    assert eng.admit(1, [3, 3, 7])
    out = eng.step(temperature=[0.8, 0.0], topp=[0.9, 0.9], penalty=[1.1, 1.0])
    assert set(out) == {0, 1}
    assert all(a >= 1 for a, _ in out.values())


def test_step_many_segment_matches_stepwise(models):
    """A fused 4-step segment must leave identical state (tokens/num_nodes) to
    four individual step() calls, and respect per-slot stop_at budgets."""
    draft, target = models
    eng_a = _batched_engine(models, B=2)
    eng_b = _batched_engine(models, B=2)
    prompts = [[1, 17, 42, 9], [3, 3, 7]]
    for b, p in enumerate(prompts):
        assert eng_a.admit(b, p) and eng_b.admit(b, p)
    for _ in range(4):
        eng_a.step()
    stop_at = [int(eng_b.num_nodes[b]) + 1000 for b in range(2)]
    steps = eng_b.step_many(4, stop_at)
    assert list(steps) == [4, 4]
    assert list(eng_a.num_nodes) == list(eng_b.num_nodes)
    for b in range(2):
        nn = int(eng_a.num_nodes[b])
        assert eng_a.tokens_host[b, :nn + 1].tolist() == \
            eng_b.tokens_host[b, :nn + 1].tolist(), f"slot {b}"
    # budget stop: slot 0 gets a tiny budget, slot 1 keeps going
    eng_c = _batched_engine(models, B=2)
    st = []
    for b, p in enumerate(prompts):
        assert eng_c.admit(b, p)
        st.append(int(eng_c.num_nodes[b]))
    eng_c.step_many(6, [st[0] + 2, st[0] + 10**6])
    assert not eng_c.active[0]          # budget hit -> deactivated on device
    assert int(eng_c.num_nodes[0]) >= st[0] + 2
    assert eng_c.active[1]
    # outputs still match the AR oracle
    toks = eng_c.tokens_host[0, st[0]: int(eng_c.num_nodes[0]) + 1].tolist()
    oracle = _greedy_ar_decode(target, prompts[0], len(toks))
    assert toks == oracle[: len(toks)]


def test_batched_int8_kv_forward_tracks_fp(models):
    """int8 batched KV (per-slot scales, kv_dtype="int8"): the batched forward
    with a quantized cache stays close to the fp-cache forward."""
    _, target = models
    B, S = 2, 5
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, 97, (B, S)), jnp.int32)
    offsets = jnp.asarray([0, 6], jnp.int32)
    pos = offsets[:, None] + jnp.arange(S)[None, :]
    masks = jnp.stack([causal_mask_rows(offsets[b], S, MAX_LEN) for b in range(B)])

    kv_q = init_batched_kv(target.cfg, B, MAX_LEN, "int8")
    assert kv_q.quantized and kv_q.k.dtype == jnp.int8
    got_q, kv_q = batched_llama_forward(
        target.params, target.args, kv_q, ids, pos, masks, offsets)
    kv_f = init_batched_kv(target.cfg, B, MAX_LEN, jnp.float32)
    got_f, _ = batched_llama_forward(
        target.params, target.args, kv_f, ids, pos, masks, offsets)
    # int8 KV quantization error is small relative to logit scale
    err = np.abs(np.asarray(got_q) - np.asarray(got_f)).max()
    ref = np.abs(np.asarray(got_f)).max()
    assert err < 0.05 * ref, (err, ref)


def test_batched_engine_int8_kv_decode(models):
    """kv_dtype="int8" through the serving engine: decode runs, commits, and the
    compaction preserves quantized scales."""
    draft, target = models
    eng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target, batch_size=2,
        dtype=jnp.float32, growmap=growmap_from_spec(3, 4), max_length=MAX_LEN,
        safe_buffer=32, eos_token_ids=[-1], kv_dtype="int8")
    eng.initialize()
    assert eng.kv_target.quantized and eng.kv_target.k.dtype == jnp.int8
    assert eng.admit(0, [1, 17, 42, 9]) and eng.admit(1, [3, 3, 7])
    starts = [int(eng.num_nodes[b]) for b in range(2)]
    for _ in range(4):
        eng.step()
    for b in range(2):
        toks = eng.tokens_host[b, starts[b]: int(eng.num_nodes[b])]
        assert int(eng.num_nodes[b]) - starts[b] >= 4
        assert (toks >= 0).all() and (toks < target.cfg.vocab_size).all()


def test_batched_b8_mixed_greedy_stochastic_slots(models):
    """B=8, half the slots stochastic: greedy slots must stay TOKEN-IDENTICAL to
    the single-slot AR oracle regardless of what their neighbors sample."""
    draft, target = models
    eng = _batched_engine(models, B=8)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 97, rng.integers(2, 7)).tolist() for _ in range(8)]
    starts = []
    for b, p in enumerate(prompts):
        assert eng.admit(b, p)
        starts.append(int(eng.num_nodes[b]))
    tv = np.asarray([0.0, 0.9, 0.0, 0.7, 0.0, 1.1, 0.0, 0.8], np.float32)
    for _ in range(4):
        eng.step(temperature=tv, topp=np.full(8, 0.9, np.float32),
                 penalty=np.ones(8, np.float32))
    for b in range(0, 8, 2):  # the greedy slots
        produced = eng.tokens_host[b, starts[b]: int(eng.num_nodes[b]) + 1].tolist()
        assert len(produced) >= 5
        oracle = _greedy_ar_decode(target, prompts[b], len(produced))
        assert produced == oracle[: len(produced)], f"greedy slot {b} diverged"
    for b in range(1, 8, 2):  # stochastic slots made progress
        assert int(eng.num_nodes[b]) - starts[b] >= 4


def test_batched_engine_with_quantized_draft():
    """Batched forwards route AwqTensor weights (layers + tied W4 head) through
    the AWQ-aware linear/head paths (bench.py's batched4 configuration)."""
    from umbrella_tpu.config import ModelConfig
    from umbrella_tpu.quantization.loader import quantize_runtime

    cfg = ModelConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=MAX_LEN,
                      eos_token_id=2, tie_word_embeddings=True)
    target = random_runtime(cfg, MAX_LEN, seed=0)
    draft = quantize_runtime(random_runtime(cfg, MAX_LEN, seed=1),
                             dtype=jnp.float32, quantize_lm_head=True)
    eng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target, batch_size=2,
        dtype=jnp.float32, growmap=growmap_from_spec(3, 4), max_length=MAX_LEN,
        eos_token_ids=[-1], segment_steps=2)
    eng.initialize()
    res = eng.run([dict(input_ids=[1, 17, 42, 9], max_new_tokens=8),
                   dict(input_ids=[3, 3, 7], max_new_tokens=8)])
    # quantized DRAFT never changes greedy output: must match the fp AR oracle
    fp_target = target

    def _ar(p, n):
        from umbrella_tpu.models.kv_cache import init_kv_cache
        from umbrella_tpu.models.llama import llama_forward
        from umbrella_tpu.ops.masks import causal_mask_rows
        kv = init_kv_cache(cfg, MAX_LEN, jnp.float32)
        lg, kv = llama_forward(fp_target.params, fp_target.args, kv,
                               jnp.asarray(p, jnp.int32), jnp.arange(len(p)),
                               causal_mask_rows(0, len(p), MAX_LEN), 0)
        out = [int(np.argmax(np.asarray(lg[-1])))]
        for t in range(len(p), len(p) + n - 1):
            lg, kv = llama_forward(fp_target.params, fp_target.args, kv,
                                   jnp.asarray([out[-1]], jnp.int32),
                                   jnp.asarray([t]),
                                   causal_mask_rows(t, 1, MAX_LEN), t)
            out.append(int(np.argmax(np.asarray(lg[0]))))
        return out

    for p, r in zip([[1, 17, 42, 9], [3, 3, 7]], res):
        toks = r["generated_tokens"]
        assert len(toks) >= 8
        assert toks == _ar(p, len(toks))[: len(toks)]
