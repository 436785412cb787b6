"""End-to-end checkpoint-DIRECTORY loading through the registry path.

The other golden tests feed in-memory state dicts into `params_from_hf_state_dict`;
these exercise the full disk flow the reference uses (HF `from_pretrained` on a hub id
or local dir, reference `llama.py:38,155`): config.json discovery
(`ModelConfig.from_pretrained`), sharded *.safetensors / pytorch_model.bin reading
(`weights._load_state_dict_np`), AWQ auto-detection from `quantization_config`
(`auto_model.AutoModelLM.from_pretrained`), and the offload loader — all from files
written to a temp dir (the hub is unreachable in this sandbox; `save_pretrained`
produces the identical on-disk format).
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import AutoModelLM
from umbrella_tpu.ops.masks import causal_mask_rows

MAX_LEN = 64


def _hf_tiny_llama(seed=0):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=False,
    )
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model, hf_cfg


def _ref_logits(model, ids):
    import torch

    with torch.no_grad():
        return model(torch.tensor(ids)[None]).logits[0].numpy()


def _run(runtime, ids, dtype=jnp.float32):
    ids_j = jnp.asarray(ids, jnp.int32)
    pos = jnp.arange(len(ids))
    mask = causal_mask_rows(0, len(ids), MAX_LEN)
    if hasattr(runtime, "streamed_forward"):
        logits, _ = runtime.streamed_forward(
            runtime.init_kv(), ids_j, pos, mask, jnp.int32(0))
    else:
        logits, _ = runtime.forward(
            runtime.params, runtime.init_kv(), ids_j, pos, mask, 0)
    return np.asarray(logits)


@pytest.mark.parametrize("sharded", [False, True])
def test_fp_safetensors_dir_matches_hf(tmp_path, sharded):
    """save_pretrained dir (single + sharded-with-index safetensors) ->
    AutoModelLM.from_pretrained -> logits match HF."""
    model, hf_cfg = _hf_tiny_llama()
    kw = {"max_shard_size": "40KB"} if sharded else {}
    model.save_pretrained(str(tmp_path), safe_serialization=True, **kw)
    if sharded:
        n_shards = len([f for f in os.listdir(tmp_path) if f.endswith(".safetensors")])
        assert n_shards > 1, "test meant to cover the multi-file glob path"

    rt = AutoModelLM.from_pretrained(str(tmp_path), max_length=MAX_LEN,
                                     dtype=jnp.float32)
    assert rt.cfg.vocab_size == hf_cfg.vocab_size
    ids = np.random.default_rng(1).integers(0, hf_cfg.vocab_size, size=9)
    np.testing.assert_allclose(_run(rt, ids), _ref_logits(model, ids),
                               rtol=2e-3, atol=2e-3)


def test_fp_torch_bin_dir_matches_hf(tmp_path):
    """Legacy pytorch_model.bin checkpoints load through the same path."""
    model, hf_cfg = _hf_tiny_llama(seed=1)
    model.save_pretrained(str(tmp_path), safe_serialization=False)
    assert any(f.startswith("pytorch_model") and f.endswith(".bin")
               for f in os.listdir(tmp_path))

    rt = AutoModelLM.from_pretrained(str(tmp_path), max_length=MAX_LEN,
                                     dtype=jnp.float32)
    ids = np.random.default_rng(2).integers(0, hf_cfg.vocab_size, size=7)
    np.testing.assert_allclose(_run(rt, ids), _ref_logits(model, ids),
                               rtol=2e-3, atol=2e-3)


def test_fp_dir_offload_matches_resident(tmp_path):
    """offload=True from a directory (reference LlamaOffload.alloc path,
    `llama.py:150-194`) matches the resident runtime exactly."""
    model, hf_cfg = _hf_tiny_llama(seed=2)
    model.save_pretrained(str(tmp_path), safe_serialization=True)

    resident = AutoModelLM.from_pretrained(str(tmp_path), max_length=MAX_LEN,
                                           dtype=jnp.float32)
    off = AutoModelLM.from_pretrained(str(tmp_path), offload=True,
                                      max_length=MAX_LEN, dtype=jnp.float32,
                                      num_cache_layers=1)
    ids = np.random.default_rng(3).integers(0, hf_cfg.vocab_size, size=8)
    np.testing.assert_allclose(_run(off, ids), _run(resident, ids),
                               rtol=1e-5, atol=1e-5)


def test_qwen_padded_vocab_is_trimmed(tmp_path):
    """Qwen2.5 checkpoints pad the embedding (152064 stored, 151936 served,
    reference qwen.py:12,27,47): the registry caps cfg.vocab_size and the loaders
    slice embed/lm_head, so logits match HF's on the served vocab."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from umbrella_tpu.models.auto_model import QWEN25_VOCAB

    torch.manual_seed(3)
    hf_cfg = Qwen2Config(
        vocab_size=QWEN25_VOCAB + 128, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = Qwen2ForCausalLM(hf_cfg)
    model.eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)

    rt = AutoModelLM.from_pretrained(str(tmp_path), max_length=MAX_LEN,
                                     dtype=jnp.float32)
    assert rt.cfg.vocab_size == QWEN25_VOCAB
    assert rt.params["embed"].shape[0] == QWEN25_VOCAB
    assert rt.params["lm_head"].shape[-1] == QWEN25_VOCAB

    ids = np.random.default_rng(4).integers(0, QWEN25_VOCAB, size=6)
    got = _run(rt, ids)
    ref = _ref_logits(model, ids)[:, :QWEN25_VOCAB]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def _write_awq_dir(tmp_path, cfg: ModelConfig, group_size=64, seed=0):
    """Write an AutoAWQ-GEMM-format checkpoint dir (the on-disk format of e.g.
    hugging-quants/Meta-Llama-3.1-8B-Instruct-AWQ-INT4)."""
    from safetensors.numpy import save_file

    from test_mistral_and_awq_offload import _synthetic_awq_sd

    sd = _synthetic_awq_sd(cfg, seed=seed)
    save_file(sd, os.path.join(tmp_path, "model.safetensors"))
    d = cfg.to_dict()
    d.pop("quantization", None)
    d["quantization_config"] = {
        "quant_method": "awq", "bits": 4, "group_size": group_size,
        "version": "gemm", "zero_point": True,
    }
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(d, f)
    return sd


@pytest.mark.parametrize("offload", [False, True])
def test_awq_dir_autodetect_and_load(tmp_path, offload):
    """quantization_config in config.json routes through load_awq_runtime; the
    loaded runtime matches the in-memory AWQ conversion of the same tensors."""
    from umbrella_tpu.models.auto_model import ModelRuntime
    from umbrella_tpu.quantization.loader import awq_params_from_hf_state_dict

    cfg = ModelConfig(
        vocab_size=128, hidden_size=128, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=MAX_LEN,
        eos_token_id=2, tie_word_embeddings=False)
    sd = _write_awq_dir(tmp_path, cfg)

    rt = AutoModelLM.from_pretrained(str(tmp_path), offload=offload,
                                     max_length=MAX_LEN, dtype=jnp.float32,
                                     num_cache_layers=1)
    assert rt.cfg.quantization and rt.cfg.quantization["method"] == "awq"

    params = awq_params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    oracle = ModelRuntime(cfg, params, MAX_LEN, dtype=jnp.float32)
    ids = np.random.default_rng(5).integers(0, cfg.vocab_size, size=7)
    np.testing.assert_allclose(_run(rt, ids), _run(oracle, ids),
                               rtol=1e-4, atol=1e-4)


def test_exit_layer_truncates_draft(tmp_path):
    """exit_layer=k loads only the first k decoder layers (early-exit draft,
    reference llama.py:421,450-451) and matches an HF model truncated the same way."""
    model, hf_cfg = _hf_tiny_llama(seed=3)
    model.save_pretrained(str(tmp_path), safe_serialization=True)

    rt = AutoModelLM.from_pretrained(str(tmp_path), max_length=MAX_LEN,
                                     dtype=jnp.float32, exit_layer=1)
    assert rt.params["layers"]["wqkv"].shape[0] == 1

    model.model.layers = model.model.layers[:1]
    ids = np.random.default_rng(7).integers(0, hf_cfg.vocab_size, size=9)
    np.testing.assert_allclose(_run(rt, ids), _ref_logits(model, ids),
                               rtol=2e-3, atol=2e-3)
