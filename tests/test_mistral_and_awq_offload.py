"""Mistral head_dim override golden test + synthetic AWQ-offload checkpoint load."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.models.llama import StaticModelArgs, llama_forward
from umbrella_tpu.models.weights import params_from_hf_state_dict
from umbrella_tpu.ops.masks import causal_mask_rows

MAX_LEN = 64


def test_mistral_head_dim_override_matches_hf():
    """Mistral allows head_dim != hidden/heads (reference mistral.py:29)."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(0)
    hf_cfg = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,  # != 64/4
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None,
        attn_implementation="eager",
    )
    model = MistralForCausalLM(hf_cfg)
    model.eval()

    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_dict(hf_cfg.to_dict())
    assert cfg.resolved_head_dim == 32
    params = params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    args = StaticModelArgs.from_config(cfg)
    assert args.head_dim == 32

    S = 9
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, size=S)
    with torch.no_grad():
        ref = model(torch.tensor(ids)[None]).logits[0].numpy()
    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    logits, _ = llama_forward(
        params, args, kv, jnp.asarray(ids), jnp.arange(S),
        causal_mask_rows(0, S, MAX_LEN), 0)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def _synthetic_awq_sd(cfg: ModelConfig, seed=0):
    """Build an HF-AutoAWQ-format state dict with random int4 weights."""
    from umbrella_tpu.quantization.awq import pack_awq_numpy

    rng = np.random.default_rng(seed)
    H, D = cfg.hidden_size, cfg.resolved_head_dim
    Hq = cfg.num_attention_heads * D
    KV = cfg.num_key_value_heads * D
    I, V, g = cfg.intermediate_size, cfg.vocab_size, 64
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": rng.standard_normal((V, H)).astype(np.float32) * 0.02,
    }

    def qlin(name, k, n_out, layer):
        iw = rng.integers(0, 16, (k, n_out)).astype(np.int8)
        iz = rng.integers(0, 16, (k // g, n_out)).astype(np.int8)
        sc = rng.uniform(0.005, 0.02, (k // g, n_out)).astype(np.float32)
        qw, qz = pack_awq_numpy(iw, iz)
        base = f"model.layers.{layer}.{name}"
        sd[base + ".qweight"] = qw
        sd[base + ".qzeros"] = qz
        sd[base + ".scales"] = sc

    for l in range(cfg.num_hidden_layers):
        sd[f"model.layers.{l}.input_layernorm.weight"] = np.ones(H, np.float32)
        sd[f"model.layers.{l}.post_attention_layernorm.weight"] = np.ones(H, np.float32)
        qlin("self_attn.q_proj", H, Hq, l)
        qlin("self_attn.k_proj", H, KV, l)
        qlin("self_attn.v_proj", H, KV, l)
        qlin("self_attn.o_proj", Hq, H, l)
        qlin("mlp.gate_proj", H, I, l)
        qlin("mlp.up_proj", H, I, l)
        qlin("mlp.down_proj", I, H, l)
    return sd


def test_awq_offload_matches_awq_resident():
    """AWQ + offload (the reference's 70B-on-consumer-GPU combination): the
    layer-streamed quantized runtime must match the resident quantized runtime."""
    from umbrella_tpu.models.auto_model import ModelRuntime
    from umbrella_tpu.offload.streaming import OffloadModelRuntime
    from umbrella_tpu.quantization.loader import awq_params_from_hf_state_dict

    cfg = ModelConfig(
        vocab_size=128, hidden_size=128, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=MAX_LEN,
        eos_token_id=2, tie_word_embeddings=False)
    sd = _synthetic_awq_sd(cfg)

    params = awq_params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    resident = ModelRuntime(cfg, params, MAX_LEN, dtype=jnp.float32)
    off = OffloadModelRuntime.from_state_dict(
        sd, cfg, MAX_LEN, dtype=jnp.float32, quantized=True, num_cache_layers=1)

    S = 7
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 128, S), jnp.int32)
    pos = jnp.arange(S)
    mask = causal_mask_rows(0, S, MAX_LEN)
    ref, _ = resident.forward(resident.params, resident.init_kv(), ids, pos, mask, 0)
    got, _ = off.streamed_forward(off.init_kv(), ids, pos, mask, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
