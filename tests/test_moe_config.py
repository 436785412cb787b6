"""Config-reachable MoE serving (VERDICT r3 item 6).

The reference reaches every model variant through config + registry dispatch
(`/root/reference/umbrella/models/auto_model.py:156-182`) but is dense-MLP only;
here the TPU-native MoE family (models/moe.py) is reachable the same way: a
Mixtral-format checkpoint dir resolves to family "moe" in the registry, loads
through `load_moe_params`, and `expert_parallel: N` in a JSON config shards the
stacked expert tensors over an N-device 'expert' mesh with committed tokens
identical to the unsharded engine's.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.models.auto_model import AutoModelLM
from umbrella_tpu.ops.masks import causal_mask_rows
from umbrella_tpu.speculation.auto_engine import AutoEngine

MAX_LEN = 128
TREE = os.path.join(os.path.dirname(__file__), "..", "umbrella_tpu", "trees",
                    "sequoia_tree-3x4.json")


def _hf_tiny_mixtral(seed=0, n_experts=4, top_k=2):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(seed)
    hf_cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=n_experts, num_experts_per_tok=top_k,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None, eos_token_id=-1,
    )
    model = MixtralForCausalLM(hf_cfg)
    model.eval()
    return model, hf_cfg


def _write_moe_dir(tmp_path, name="moe_target", seed=0):
    model, hf_cfg = _hf_tiny_mixtral(seed=seed)
    d = os.path.join(str(tmp_path), name)
    model.save_pretrained(d, safe_serialization=True)
    return d, model, hf_cfg


def test_moe_dir_matches_hf(tmp_path):
    """Mixtral save_pretrained dir -> registry resolves family 'moe', loads the
    stacked expert pytree, and decode-forward logits match HF's."""
    import torch

    d, model, hf_cfg = _write_moe_dir(tmp_path)
    rt = AutoModelLM.from_pretrained(d, max_length=MAX_LEN, dtype=jnp.float32)
    assert rt.family == "moe"
    assert rt.cfg.num_local_experts == hf_cfg.num_local_experts
    assert rt.params["layers"]["expert_gate"].shape == (2, 4, 64, 128)

    ids = np.random.default_rng(1).integers(0, hf_cfg.vocab_size, size=9)
    logits, _ = rt.forward(
        rt.params, rt.init_kv(), jnp.asarray(ids, jnp.int32),
        jnp.arange(len(ids)), causal_mask_rows(0, len(ids), MAX_LEN), 0)
    with torch.no_grad():
        ref = model(torch.tensor(ids)[None]).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def _decode_tokens(config, n_steps=3):
    eng = AutoEngine.from_config(**dict(config))
    eng.initialize()
    assert eng._prefill(np.asarray([1, 9, 23, 7], np.int32))
    start = eng.num_nodes
    for _ in range(n_steps):
        eng.build_tree()
        eng.verify()
    return eng, eng.tokens_host[start:eng.num_nodes].tolist()


def test_expert_parallel_config_end_to_end(tmp_path):
    """`expert_parallel: 2` + a Mixtral checkpoint dir drives an EP-sharded
    engine through the config-only UX; tokens identical to unsharded."""
    from test_tp_config import _write_fp_dir

    target, _, _ = _write_moe_dir(tmp_path)
    draft = _write_fp_dir(str(tmp_path), "draft", seed=1, heads=4, kv_heads=2)
    config = dict(
        model=target, draft_model=draft, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, safe_buffer=16, temperature=0.0,
        eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32,
    )
    eng_ep, toks_ep = _decode_tokens(dict(config, expert_parallel=2))
    assert eng_ep.mesh is not None and eng_ep.mesh.shape["expert"] == 2
    assert eng_ep.target_model.family == "moe"
    spec = eng_ep.target_model.params["layers"]["expert_gate"].sharding.spec
    assert spec[1] == "expert"

    _, toks_ref = _decode_tokens(config)
    assert toks_ep == toks_ref
    assert len(toks_ep) >= 3


def test_moe_draft_expert_parallel(tmp_path):
    """An MoE model also serves as the DRAFT (both models EP-sharded)."""
    target, _, _ = _write_moe_dir(tmp_path, "t", seed=0)
    draft, _, _ = _write_moe_dir(tmp_path, "d", seed=3)
    config = dict(
        model=target, draft_model=draft, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, safe_buffer=16, temperature=0.0,
        eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32,
    )
    eng, toks = _decode_tokens(dict(config, expert_parallel=2))
    assert eng.draft_model.family == "moe"
    assert eng.draft_model.params["layers"]["expert_up"].sharding.spec[1] == "expert"
    _, toks_ref = _decode_tokens(config)
    assert toks == toks_ref and len(toks) >= 3


def test_moe_int8_kv_matches_fp_kv(tmp_path):
    """MoE decode composes with the int8 KV cache (llama_attention path —
    in-kernel/per-row dequant): same committed tokens as fp KV on a
    concentrated-logit model."""
    from test_tp_config import _write_fp_dir

    target, _, _ = _write_moe_dir(tmp_path)
    draft = _write_fp_dir(str(tmp_path), "draft", seed=1, heads=4, kv_heads=2)
    config = dict(
        model=target, draft_model=draft, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, safe_buffer=16, temperature=0.0,
        eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32,
    )
    _, toks_fp = _decode_tokens(config)
    _, toks_i8 = _decode_tokens(dict(config, kv_dtype="int8"))
    # int8 KV quantization can flip near-ties on a random tiny model; require
    # agreement on the prefix (identical first decisions) and progress
    n = min(len(toks_fp), len(toks_i8), 3)
    assert toks_i8[:n] == toks_fp[:n]
    assert len(toks_i8) >= 3


def test_expert_parallel_rejects_dense_target(tmp_path):
    from test_tp_config import _write_fp_dir

    target = _write_fp_dir(str(tmp_path), "dense", seed=0, heads=4, kv_heads=2)
    config = dict(
        model=target, draft_model=target, engine="static", growmap_path=TREE,
        max_length=MAX_LEN, expert_parallel=2, eos_token_ids=[-1],
        tokenizer=object(), dtype=jnp.float32,
    )
    eng = AutoEngine.from_config(**config)
    with pytest.raises(AssertionError, match="MoE"):
        eng.initialize()
