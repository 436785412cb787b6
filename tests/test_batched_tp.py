"""Sharded continuous batching: `tensor_parallel: N` on the BATCHED engine
(north-star config[4] — "70B weights+KV tensor-sharded ... continuous batching").

The reference cannot express this composition at all: its KV cache has no batch
dim (`umbrella/attn/cache.py:18-34`) and its server serializes requests through
one worker on one GPU (`umbrella/api/server.py:43-55`). Here B slots decode in
one compiled step over a TP mesh: target weights Megatron-sharded, batched KV
sharded on kv heads, draft replicated — per-slot committed tokens must be
IDENTICAL to the unsharded batched engine's.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import ModelRuntime
from umbrella_tpu.models.llama import init_llama_params
from umbrella_tpu.serving.batched_engine import BatchedStaticEngine

MAX_LEN = 256
TREE = os.path.join(os.path.dirname(__file__), "..", "umbrella_tpu", "trees",
                    "sequoia_tree-3x4.json")


def _cfg():
    return ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=MAX_LEN,
        tie_word_embeddings=False, eos_token_id=-1)


def _runtime(seed):
    cfg = _cfg()
    params = init_llama_params(cfg, jax.random.PRNGKey(seed), MAX_LEN,
                               jnp.float32, packed=False)
    return ModelRuntime(cfg, params, MAX_LEN, dtype=jnp.float32)


def _drive(tp, n_steps=3):
    eng = BatchedStaticEngine(
        draft_model_name=_runtime(1), target_model_name=_runtime(0),
        batch_size=2, dtype=jnp.float32, growmap_path=TREE, max_length=MAX_LEN,
        eos_token_ids=[-1], tokenizer=object(), safe_buffer=16,
        tensor_parallel=tp)
    eng.initialize()
    assert eng.admit(0, [1, 9, 23, 7])
    assert eng.admit(1, [5, 2, 61, 11, 30])
    starts = [int(eng.num_nodes[b]) for b in range(2)]
    for _ in range(n_steps):
        eng.step()
    return eng, [eng.tokens_host[b, starts[b]: int(eng.num_nodes[b])].tolist()
                 for b in range(2)]


def test_tp_batched_engine_token_identity():
    eng_tp, toks_tp = _drive(tp=2)
    assert eng_tp.mesh is not None and eng_tp.mesh.shape["model"] == 2
    assert getattr(eng_tp.target_model, "_tp", False)
    # target weights actually sharded, batched KV sharded on kv heads (axis 2)
    spec = eng_tp.target_model.params["layers"]["wq"].sharding.spec
    assert spec[-1] == "model"
    kv_spec = eng_tp.kv_target.k.sharding.spec
    assert kv_spec[2] == "model"
    # draft replicated
    d_spec = eng_tp.draft_model.params["layers"]["wq"].sharding.spec
    assert all(ax is None for ax in d_spec)

    _, toks_ref = _drive(tp=0)
    assert toks_tp == toks_ref
    assert all(len(t) >= 3 for t in toks_ref)


def test_tp_batched_step_many_and_run():
    """The fused segment loop (step_many/run) traces the shard_map forward inside
    lax.while_loop; per-request results must match the unsharded engine's."""
    def _run(tp):
        eng = BatchedStaticEngine(
            draft_model_name=_runtime(1), target_model_name=_runtime(0),
            batch_size=2, dtype=jnp.float32, growmap_path=TREE,
            max_length=MAX_LEN, eos_token_ids=[-1], tokenizer=None,
            safe_buffer=16, segment_steps=4, tensor_parallel=tp)
        eng.initialize()
        reqs = [dict(input_ids=[1, 9, 23, 7], max_new_tokens=12),
                dict(input_ids=[5, 2, 61, 11, 30], max_new_tokens=12),
                dict(input_ids=[17, 3], max_new_tokens=8)]
        return [r["generated_tokens"] for r in eng.run(reqs)]

    assert _run(2) == _run(0)


def test_tp_batched_config_end_to_end(tmp_path):
    """Config-only UX: `engine: batched_static` + `tensor_parallel: 2` in JSON
    drives a sharded batched engine (serve_batched_8b_v5e.json + TP at test
    scale) through AutoEngine.from_config."""
    from test_tp_config import _write_fp_dir

    from umbrella_tpu.speculation.auto_engine import AutoEngine

    target = _write_fp_dir(tmp_path, "target", seed=0)
    draft = _write_fp_dir(tmp_path, "draft", seed=1)
    config = dict(
        model=target, draft_model=draft, engine="batched_static",
        growmap_path=TREE, max_length=128, safe_buffer=16, batch_size=2,
        temperature=0.0, eos_token_ids=[-1], tokenizer=object(),
        dtype=jnp.float32)

    def _toks(cfg):
        eng = AutoEngine.from_config(**dict(cfg))
        eng.initialize()
        assert eng.admit(0, [1, 9, 23, 7])
        start = int(eng.num_nodes[0])
        for _ in range(3):
            eng.step()
        return eng, eng.tokens_host[0, start: int(eng.num_nodes[0])].tolist()

    eng_tp, toks_tp = _toks(dict(config, tensor_parallel=2))
    assert eng_tp.mesh is not None
    assert "wq" in eng_tp.target_model.params["layers"]  # packed=False load
    _, toks_ref = _toks(config)
    assert toks_tp == toks_ref and len(toks_ref) >= 3


def test_tp_batched_int8_kv_matches_unsharded_int8():
    """TP x int8-KV composition: per-slot scales shard with their kv heads."""
    def _drive_int8(tp):
        eng = BatchedStaticEngine(
            draft_model_name=_runtime(1), target_model_name=_runtime(0),
            batch_size=2, dtype=jnp.float32, growmap_path=TREE,
            max_length=MAX_LEN, eos_token_ids=[-1], tokenizer=object(),
            safe_buffer=16, kv_dtype="int8", tensor_parallel=tp)
        eng.initialize()
        assert eng.admit(0, [1, 9, 23, 7])
        start = int(eng.num_nodes[0])
        for _ in range(3):
            eng.step()
        return eng, eng.tokens_host[0, start: int(eng.num_nodes[0])].tolist()

    eng_tp, toks_tp = _drive_int8(2)
    assert eng_tp.kv_target.quantized
    assert eng_tp.kv_target.k_scale.sharding.spec[2] == "model"
    _, toks_ref = _drive_int8(0)
    assert toks_tp == toks_ref and len(toks_ref) >= 3


def test_batched_rejects_pipeline_parallel_and_offload():
    with pytest.raises(ValueError, match="pipeline_parallel"):
        BatchedStaticEngine(
            draft_model_name=_runtime(1), target_model_name=_runtime(0),
            growmap_path=TREE, pipeline_parallel=2)
    with pytest.raises(ValueError, match="offload"):
        BatchedStaticEngine(
            draft_model_name=_runtime(1), target_model_name=_runtime(0),
            growmap_path=TREE, offload=True)
