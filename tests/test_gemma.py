"""Gemma2 golden-parity vs HF transformers on a tiny random model."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.gemma import (
    GemmaStaticArgs, gemma2_forward, gemma_params_from_hf_state_dict)
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.ops.masks import causal_mask_rows

MAX_LEN = 64


def _hf_tiny_gemma(seed=0):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(seed)
    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=16, sliding_window=16, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    model = Gemma2ForCausalLM(cfg)
    model.eval()
    return model, cfg


def test_gemma2_forward_matches_hf():
    import torch

    model, hf_cfg = _hf_tiny_gemma()
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_dict(hf_cfg.to_dict())
    params = gemma_params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    args = GemmaStaticArgs.from_config(cfg)
    assert args.attn_softcap == 50.0 and args.final_softcap == 30.0

    S = 24  # > sliding_window so the windowed layers actually mask something
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, size=S)
    with torch.no_grad():
        ref = model(torch.tensor(ids)[None]).logits[0].numpy()

    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    logits, kv = gemma2_forward(
        params, args, kv, jnp.asarray(ids), jnp.arange(S),
        causal_mask_rows(0, S, MAX_LEN), 0)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=3e-3, atol=3e-3)


def test_gemma2_incremental_decode_consistency():
    model, hf_cfg = _hf_tiny_gemma(seed=2)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_dict(hf_cfg.to_dict())
    params = gemma_params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    args = GemmaStaticArgs.from_config(cfg)

    S = 20
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, size=S)
    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    full, _ = gemma2_forward(params, args, kv, jnp.asarray(ids), jnp.arange(S),
                             causal_mask_rows(0, S, MAX_LEN), 0)
    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    rows = []
    for t in range(S):
        lg, kv = gemma2_forward(params, args, kv, jnp.asarray(ids[t:t+1]),
                                jnp.asarray([t]), causal_mask_rows(t, 1, MAX_LEN), t)
        rows.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.stack(rows), np.asarray(full), rtol=3e-3, atol=3e-3)
