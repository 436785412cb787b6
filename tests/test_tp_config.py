"""Config-driven tensor parallelism: `tensor_parallel: N` in a JSON config must
drive a sharded engine through the reference's config-only UX
(`AutoEngine.from_config` -> engine, ref `speculation/auto_engine.py:12-22`,
`app/chatbot.py:14-24`) — loaders switch to packed=False, `shard_runtime` shards
the target and replicates the draft, and committed tokens are identical to the
unsharded engine's. This is the flagship `chat_config_70b_awq_pod.json` path at
test scale."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.speculation.auto_engine import AutoEngine

MAX_LEN = 128
TREE = os.path.join(os.path.dirname(__file__), "..", "umbrella_tpu", "trees",
                    "sequoia_tree-3x4.json")


def _write_fp_dir(tmp_path, name, seed, heads=4, kv_heads=4):
    """Tiny HF-format fp checkpoint dir (save_pretrained layout)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False, eos_token_id=-1,
    )
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    d = os.path.join(tmp_path, name)
    model.save_pretrained(d, safe_serialization=True)
    return d


def _decode_tokens(config, n_steps=3):
    eng = AutoEngine.from_config(**dict(config))
    eng.initialize()
    assert eng._prefill(np.asarray([1, 9, 23, 7], np.int32))
    start = eng.num_nodes
    for _ in range(n_steps):
        eng.build_tree()
        eng.verify()
    return eng, eng.tokens_host[start : eng.num_nodes].tolist()


def test_tensor_parallel_fp_config_end_to_end(tmp_path):
    target = _write_fp_dir(tmp_path, "target", seed=0)
    draft = _write_fp_dir(tmp_path, "draft", seed=1)
    config = dict(
        model=target, draft_model=draft, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, safe_buffer=16, temperature=0.0,
        eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32,
    )
    eng_tp, toks_tp = _decode_tokens(dict(config, tensor_parallel=4))
    assert eng_tp.mesh is not None and eng_tp.mesh.shape["model"] == 4
    assert getattr(eng_tp.target_model, "_tp", False)
    # loaders actually went packed=False (TP requirement)
    assert "wq" in eng_tp.target_model.params["layers"]
    spec = eng_tp.target_model.params["layers"]["wq"].sharding.spec
    assert spec[-1] == "model"

    _, toks_ref = _decode_tokens(config)
    assert toks_tp == toks_ref
    assert len(toks_tp) >= 3


def test_tensor_parallel_awq_config_end_to_end(tmp_path):
    """AWQ checkpoint dir + tensor_parallel in config -> sharded W4 engine
    (the 70B-AWQ pod layout at test scale: column/row AWQ specs, split-halves
    row repack)."""
    from test_checkpoint_load import _write_awq_dir

    cfg = ModelConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=MAX_LEN, eos_token_id=-1, tie_word_embeddings=False)
    tdir = os.path.join(tmp_path, "target_awq")
    os.makedirs(tdir)
    _write_awq_dir(tdir, cfg)
    draft = _write_fp_dir(tmp_path, "draft", seed=2, heads=4, kv_heads=2)

    config = dict(
        model=tdir, draft_model=draft, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, safe_buffer=16, temperature=0.0,
        eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32,
    )
    eng_tp, toks_tp = _decode_tokens(dict(config, tensor_parallel=2))
    from umbrella_tpu.quantization.awq import AwqTensor

    assert getattr(eng_tp.target_model, "_tp", False)
    layers = eng_tp.target_model.params["layers"]
    assert isinstance(layers["wq"][0], AwqTensor)  # unpacked per-layer W4

    _, toks_ref = _decode_tokens(config)
    assert toks_tp == toks_ref
    assert len(toks_tp) >= 3


def test_tensor_parallel_offload_rejected(tmp_path):
    target = _write_fp_dir(tmp_path, "target", seed=0)
    config = dict(
        model=target, draft_model=target, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, tensor_parallel=4, offload=True,
        eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32,
    )
    eng = AutoEngine.from_config(**config)
    with pytest.raises(AssertionError, match="mutually exclusive"):
        eng.initialize()


def test_pipeline_parallel_config_end_to_end(tmp_path):
    """`pipeline_parallel: N` in the config drives a staged-decode engine through
    the same config-only UX (configs/chat_config_70b_awq_pp4.json at test scale);
    committed tokens identical to the unsharded engine."""
    target = _write_fp_dir(tmp_path, "target_pp", seed=0)
    draft = _write_fp_dir(tmp_path, "draft_pp", seed=1)
    config = dict(
        model=target, draft_model=draft, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, safe_buffer=16, temperature=0.0,
        eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32,
    )
    _, ref = _decode_tokens(config)
    eng, pp = _decode_tokens(dict(config, pipeline_parallel=2))
    assert pp == ref and len(ref) >= 3
    assert getattr(eng.target_model, "_pp", False)
