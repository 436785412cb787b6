"""Checkpoint loading: HF safetensors / torch state dicts -> stacked jax pytrees.

Replaces the reference's pattern of instantiating a full torch `LlamaForCausalLM` and
stripping tensors off it layer by layer (`umbrella/models/llama.py:38-72`). We read
tensors straight from the checkpoint files (no torch module graph), transpose linear
weights to [in, out], and stack per-layer tensors along a leading layer axis for
`lax.scan`.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.rope import rope_params


def _load_state_dict_np(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors of a checkpoint dir as numpy (fp32/bf16 preserved)."""
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for name in sf.keys():
                    tensors[name] = sf.get_tensor(name)
        return tensors
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for name, t in sd.items():
                tensors[name] = t.to(torch.float32).numpy()
        return tensors
    raise FileNotFoundError(f"no safetensors/bin checkpoint found under {path}")


def _to_jnp(a: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(a).astype(dtype)


def trim_vocab_rows(a: np.ndarray, vocab: int) -> np.ndarray:
    """Slice a [V_ckpt, ...] embedding/lm_head matrix down to the serving vocab.

    Qwen2.5 checkpoints store a padded embedding (152064 rows) but serve 151936
    tokens (reference trims with a hardcoded constant, ref `qwen.py:12,27,47`);
    the registry lowers cfg.vocab_size and loaders slice here. No-op when the
    checkpoint matches."""
    return a[:vocab] if a.shape[0] > vocab else a


def load_llama_params(
    path: str,
    cfg: ModelConfig,
    max_length: int,
    dtype=jnp.bfloat16,
    n_layers: Optional[int] = None,
    packed: bool = True,
) -> dict:
    """Build the llama-family param pytree from an HF (non-quantized) checkpoint.

    Handles Llama/Mistral and Qwen2.5 (attention biases). AWQ checkpoints go through
    quantization/awq.py instead.
    """
    sd = _load_state_dict_np(path)
    return params_from_hf_state_dict(sd, cfg, max_length, dtype, n_layers=n_layers,
                                     packed=packed)


def params_from_hf_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: ModelConfig,
    max_length: int,
    dtype=jnp.bfloat16,
    n_layers: Optional[int] = None,
    packed: bool = True,
) -> dict:
    n = n_layers if n_layers is not None else cfg.num_hidden_layers
    P = "model."

    def get(name):
        a = sd[name]
        if a.dtype == np.float16 or str(a.dtype) == "bfloat16":
            a = a.astype(np.float32)
        return a

    def stack_linear(fmt):
        # HF stores [out, in]; we want [layer, in, out]
        return _to_jnp(np.stack([get(fmt.format(i)).T for i in range(n)]), dtype)

    def stack_packed(fmts):
        return _to_jnp(np.stack([
            np.concatenate([get(f.format(i)).T for f in fmts], axis=-1)
            for i in range(n)]), dtype)

    def stack_vec(fmt):
        return _to_jnp(np.stack([get(fmt.format(i)) for i in range(n)]), dtype)

    def stack_vec_packed(fmts):
        return _to_jnp(np.stack([
            np.concatenate([get(f.format(i)) for f in fmts], axis=-1)
            for i in range(n)]), dtype)

    layers = {
        "input_norm": stack_vec(P + "layers.{}.input_layernorm.weight"),
        "post_norm": stack_vec(P + "layers.{}.post_attention_layernorm.weight"),
        "wo": stack_linear(P + "layers.{}.self_attn.o_proj.weight"),
        "down": stack_linear(P + "layers.{}.mlp.down_proj.weight"),
    }
    qkv_fmts = [P + "layers.{}.self_attn.q_proj.weight",
                P + "layers.{}.self_attn.k_proj.weight",
                P + "layers.{}.self_attn.v_proj.weight"]
    gu_fmts = [P + "layers.{}.mlp.gate_proj.weight", P + "layers.{}.mlp.up_proj.weight"]
    has_bias = P + "layers.0.self_attn.q_proj.bias" in sd
    if packed:
        layers["wqkv"] = stack_packed(qkv_fmts)
        layers["gate_up"] = stack_packed(gu_fmts)
        if has_bias:
            layers["bqkv"] = stack_vec_packed([
                P + "layers.{}.self_attn.q_proj.bias",
                P + "layers.{}.self_attn.k_proj.bias",
                P + "layers.{}.self_attn.v_proj.bias"])
    else:
        layers["wq"], layers["wk"], layers["wv"] = (stack_linear(f) for f in qkv_fmts)
        layers["gate"], layers["up"] = (stack_linear(f) for f in gu_fmts)
        if has_bias:
            layers["bq"] = stack_vec(P + "layers.{}.self_attn.q_proj.bias")
            layers["bk"] = stack_vec(P + "layers.{}.self_attn.k_proj.bias")
            layers["bv"] = stack_vec(P + "layers.{}.self_attn.v_proj.bias")

    params = {
        "embed": _to_jnp(trim_vocab_rows(get(P + "embed_tokens.weight"), cfg.vocab_size), dtype),
        "final_norm": _to_jnp(get(P + "norm.weight"), dtype),
        "layers": layers,
        **rope_params(cfg),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _to_jnp(
            trim_vocab_rows(get("lm_head.weight"), cfg.vocab_size).T, dtype)
    return params
