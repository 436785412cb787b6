"""Golden-parity: our functional llama forward vs HF transformers on tiny random
models — the correctness oracle the reference only had informally via
`examples/hf_generate.py` (SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.models.llama import StaticModelArgs, llama_forward
from umbrella_tpu.models.weights import params_from_hf_state_dict
from umbrella_tpu.ops.masks import causal_mask_rows

MAX_LEN = 64


def _hf_tiny_llama(seed=0, qwen_bias=False, kv_heads=2):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM, Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    common = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=kv_heads, max_position_embeddings=512,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
    )
    if qwen_bias:
        hf_cfg = Qwen2Config(**common)
        model = Qwen2ForCausalLM(hf_cfg)
    else:
        hf_cfg = LlamaConfig(**common, attention_bias=False)
        model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model, hf_cfg


def _convert(model, hf_cfg):
    sd = {k: v.detach().to("cpu").float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_dict(hf_cfg.to_dict())
    params = params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    return cfg, params


@pytest.mark.parametrize("qwen_bias", [False, True])
def test_forward_matches_hf(qwen_bias):
    import torch

    model, hf_cfg = _hf_tiny_llama(qwen_bias=qwen_bias)
    cfg, params = _convert(model, hf_cfg)
    args = StaticModelArgs.from_config(cfg)

    S = 9
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, size=S)
    with torch.no_grad():
        ref = model(torch.tensor(ids)[None]).logits[0].numpy()

    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    mask = causal_mask_rows(0, S, MAX_LEN)
    logits, kv = llama_forward(
        params, args, kv, jnp.asarray(ids), jnp.arange(S), mask, 0
    )
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_incremental_decode_matches_full_forward():
    """KV-cache correctness: token-at-a-time == one-shot full forward."""
    model, hf_cfg = _hf_tiny_llama(seed=3)
    cfg, params = _convert(model, hf_cfg)
    args = StaticModelArgs.from_config(cfg)

    S = 7
    ids = np.random.default_rng(5).integers(0, cfg.vocab_size, size=S)

    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    full_logits, _ = llama_forward(
        params, args, kv, jnp.asarray(ids), jnp.arange(S), causal_mask_rows(0, S, MAX_LEN), 0
    )

    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    step_logits = []
    for t in range(S):
        lg, kv = llama_forward(
            params, args, kv, jnp.asarray(ids[t : t + 1]), jnp.asarray([t]),
            causal_mask_rows(t, 1, MAX_LEN), t,
        )
        step_logits.append(np.asarray(lg[0]))
    np.testing.assert_allclose(
        np.stack(step_logits), np.asarray(full_logits), rtol=2e-3, atol=2e-3
    )


def test_greedy_decode_matches_hf_generate():
    import torch

    model, hf_cfg = _hf_tiny_llama(seed=7)
    cfg, params = _convert(model, hf_cfg)
    args = StaticModelArgs.from_config(cfg)

    prompt = np.array([1, 5, 9, 13])
    with torch.no_grad():
        ref = model.generate(
            torch.tensor(prompt)[None], max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0].numpy()

    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    S = len(prompt)
    logits, kv = llama_forward(
        params, args, kv, jnp.asarray(prompt), jnp.arange(S), causal_mask_rows(0, S, MAX_LEN), 0
    )
    out = list(prompt)
    tok = int(np.argmax(np.asarray(logits[-1])))
    out.append(tok)
    for t in range(S, S + 7):
        lg, kv = llama_forward(
            params, args, kv, jnp.asarray([tok]), jnp.asarray([t]),
            causal_mask_rows(t, 1, MAX_LEN), t,
        )
        tok = int(np.argmax(np.asarray(lg[0])))
        out.append(tok)
    np.testing.assert_array_equal(np.array(out), ref)
