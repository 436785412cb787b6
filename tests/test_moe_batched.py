"""MoE x continuous batching (VERDICT r4 item 4).

The framework's flagship serving mode (BatchedStaticEngine) must serve its own
MoE family: batched/slot MoE forwards (models/batched.py), `expert_parallel`
config-reachable for engine "batched_static", B-slot tokens identical to the
single-slot MoE engine, incl. EP=2 on the CPU mesh.
"""
import os

import jax.numpy as jnp
import numpy as np

from umbrella_tpu.speculation.auto_engine import AutoEngine

from test_api_server import _FakeTokenizer
from test_moe_config import MAX_LEN, TREE, _write_moe_dir


def _config(target, draft, **kw):
    return dict(
        model=target, draft_model=draft, engine="batched_static",
        growmap_path=TREE, max_length=MAX_LEN, safe_buffer=16,
        temperature=0.0, eos_token_ids=[-1], tokenizer=_FakeTokenizer(),
        dtype=jnp.float32, batch_size=2, segment_steps=2, **kw)


def _single_slot_tokens(target, draft, prompt, n_new):
    eng = AutoEngine.from_config(**dict(
        model=target, draft_model=draft, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, safe_buffer=16, temperature=0.0,
        eos_token_ids=[-1], tokenizer=_FakeTokenizer(), dtype=jnp.float32))
    eng.initialize()
    out = eng.generate(input_ids=list(prompt), max_new_tokens=n_new)
    return out["generated_tokens"][:n_new]


def _batched_tokens(config, prompts, n_new):
    eng = AutoEngine.from_config(**dict(config))
    eng.initialize()
    res = eng.run([dict(input_ids=list(p), max_new_tokens=n_new)
                   for p in prompts])
    return [r["generated_tokens"][:n_new] for r in res]


def test_batched_moe_matches_single_slot(tmp_path):
    """B=2 slots of the batched MoE engine decode token-identically with the
    single-slot MoE engine (greedy)."""
    target, _, hf_cfg = _write_moe_dir(tmp_path)
    draft, _, _ = _write_moe_dir(tmp_path, "draft", seed=3)
    rng = np.random.default_rng(0)
    p1 = rng.integers(0, hf_cfg.vocab_size, size=6).tolist()
    p2 = rng.integers(0, hf_cfg.vocab_size, size=11).tolist()
    ref1 = _single_slot_tokens(target, draft, p1, 12)
    ref2 = _single_slot_tokens(target, draft, p2, 12)
    got = _batched_tokens(_config(target, draft), [p1, p2], 12)
    assert got[0] == ref1
    assert got[1] == ref2


def test_batched_moe_expert_parallel_identity(tmp_path):
    """`expert_parallel: 2` on engine "batched_static" shards the stacked
    expert tensors over the 'expert' mesh; committed tokens identical to the
    unsharded batched engine (and the experts really are sharded)."""
    target, _, hf_cfg = _write_moe_dir(tmp_path)
    draft, _, _ = _write_moe_dir(tmp_path, "draft", seed=3)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, hf_cfg.vocab_size, size=n).tolist()
               for n in (5, 9)]
    ref = _batched_tokens(_config(target, draft), prompts, 10)

    eng = AutoEngine.from_config(**_config(target, draft, expert_parallel=2))
    eng.initialize()
    assert eng.ep_mesh is not None and eng.ep_mesh.shape["expert"] == 2
    spec = eng.target_model.params["layers"]["expert_gate"].sharding.spec
    assert spec[1] == "expert"
    assert eng.draft_model.params["layers"]["expert_up"].sharding.spec[1] \
        == "expert"
    res = eng.run([dict(input_ids=list(p), max_new_tokens=10)
                   for p in prompts])
    got = [r["generated_tokens"][:10] for r in res]
    assert got == ref


def test_batched_moe_through_continuous_batcher(tmp_path):
    """The full serving path (ContinuousBatcher, pipelined loop) over the MoE
    family: same tokens as direct run(), perf contract filled."""
    from umbrella_tpu.serving.batched_engine import ContinuousBatcher

    target, _, hf_cfg = _write_moe_dir(tmp_path)
    draft, _, _ = _write_moe_dir(tmp_path, "draft", seed=3)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, hf_cfg.vocab_size, size=n).tolist()
               for n in (4, 7, 5)]
    ref = _batched_tokens(_config(target, draft), prompts, 8)

    eng = AutoEngine.from_config(**_config(target, draft))
    eng.initialize()
    batcher = ContinuousBatcher(eng)
    batcher.start()
    try:
        futs = [batcher.submit(input_ids=list(p), max_new_tokens=8)
                for p in prompts]
        res = [f.result(timeout=300) for f in futs]
    finally:
        batcher.shutdown()
    assert [r["generated_tokens"][:8] for r in res] == ref
    assert all(r["time_per_output_token"] > 0 for r in res)


def test_batched_rejects_moe_tensor_parallel(tmp_path):
    target, _, _ = _write_moe_dir(tmp_path)
    eng = AutoEngine.from_config(**_config(target, target, tensor_parallel=2,
                                           expert_parallel=0))
    try:
        eng.initialize()
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_batched_moe_int8_kv_progresses(tmp_path):
    """Batched MoE composes with the int8 KV cache (config
    serve_batched_mixtral_ep.json ships kv_dtype int8): prefix-identical
    decisions with fp KV on the tiny model, full budget progress."""
    target, _, hf_cfg = _write_moe_dir(tmp_path)
    draft, _, _ = _write_moe_dir(tmp_path, "draft", seed=3)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, hf_cfg.vocab_size, size=6).tolist()]
    fp = _batched_tokens(_config(target, draft), prompts, 8)
    i8 = _batched_tokens(_config(target, draft, kv_dtype="int8"), prompts, 8)
    n = min(len(fp[0]), len(i8[0]), 3)
    assert i8[0][:n] == fp[0][:n]
    assert len(i8[0]) >= 8
