"""Gemma2 functional forward.

Arch deltas vs the llama family (reference `umbrella/models/gemma.py` /
`gemma_layer.py`): 4 RMS norms per layer with (1+w) scaling, embed scaled by
sqrt(hidden), attention-logit and final-logit softcapping, sliding-window attention on
even layers (`gemma_layer.py:59-60`), gelu-tanh MLP, and HF's query_pre_attn_scalar
attention scale (which the reference omits — we follow HF, our correctness oracle).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import ModelConfig
from ..ops.attention import attend
from ..ops.norms import gemma_rms_norm
from ..ops.rope import apply_rope, rope_params
from ..ops.select import embed_lookup
from .kv_cache import KVCache, update_layer
from .llama import _linear


class GemmaStaticArgs(NamedTuple):
    num_heads: int
    num_kv_heads: int
    head_dim: int
    hidden_size: int
    rms_eps: float
    n_layers: int
    attn_scale: float
    attn_softcap: float
    final_softcap: float
    sliding_window: int
    # set to the mesh axis name inside shard_map for tensor-parallel batched
    # forwards (models/batched.py gemma pair): psum after wo/down BEFORE the
    # post norms (they are nonlinear), all-gather for a vocab-sharded head
    tp_axis: str | None = None

    @classmethod
    def from_config(cls, cfg: ModelConfig, n_layers: Optional[int] = None) -> "GemmaStaticArgs":
        qpas = cfg.query_pre_attn_scalar or cfg.resolved_head_dim
        return cls(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.resolved_head_dim,
            hidden_size=cfg.hidden_size,
            rms_eps=cfg.rms_norm_eps,
            n_layers=n_layers if n_layers is not None else cfg.num_hidden_layers,
            attn_scale=float(qpas) ** -0.5,
            attn_softcap=float(cfg.attn_logit_softcapping or 0.0),
            final_softcap=float(cfg.final_logit_softcapping or 0.0),
            sliding_window=int(cfg.sliding_window or 0),
        )


def gemma2_layer(args: GemmaStaticArgs, lw: dict, hidden, kv: KVCache, layer_idx,
                 is_sliding, position_ids, attn_mask, sliding_mask, write_offset,
                 inv_freq, rope_scale) -> Tuple[jnp.ndarray, KVCache]:
    S = hidden.shape[0]
    D = args.head_dim
    mask = jnp.where(is_sliding, sliding_mask, attn_mask)

    residual = hidden
    x = gemma_rms_norm(hidden, lw["input_norm"], args.rms_eps)
    q = _linear(x, lw["wq"]).reshape(S, args.num_heads, D)
    k = _linear(x, lw["wk"]).reshape(S, args.num_kv_heads, D)
    v = _linear(x, lw["wv"]).reshape(S, args.num_kv_heads, D)
    q, k = apply_rope(q, k, inv_freq, rope_scale, position_ids)
    kv = update_layer(kv, layer_idx, k, v, write_offset)
    out = attend(q, kv.k, kv.v, mask, kv_limit=write_offset + S,
                 scale=args.attn_scale, logits_soft_cap=args.attn_softcap,
                 k_scale=kv.k_scale, v_scale=kv.v_scale, layer_idx=layer_idx)
    out = _linear(out.reshape(S, args.num_heads * D), lw["wo"])
    out = gemma_rms_norm(out, lw["post_attn_norm"], args.rms_eps)
    hidden = residual + out

    residual = hidden
    x = gemma_rms_norm(hidden, lw["pre_ff_norm"], args.rms_eps)
    gate = jax.nn.gelu(_linear(x, lw["gate"]), approximate=True)
    mlp = _linear(gate * _linear(x, lw["up"]), lw["down"])
    mlp = gemma_rms_norm(mlp, lw["post_ff_norm"], args.rms_eps)
    return residual + mlp, kv


def gemma2_forward(params: dict, args: GemmaStaticArgs, kv: KVCache,
                   input_ids, position_ids, attn_mask, write_offset):
    layers = params["layers"]
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]
    hidden = embed_lookup(params["embed"], input_ids, params["final_norm"].dtype)
    hidden = hidden * jnp.asarray(args.hidden_size ** 0.5, hidden.dtype)

    # even layers use sliding-window attention (gemma_layer.py:59-60); constraint is
    # expressed in slot space (committed slot == position; tree offsets < window)
    S, L = attn_mask.shape
    cols = lax.broadcasted_iota(jnp.int32, (S, L), 1)
    qpos = position_ids[:, None]
    sliding_mask = attn_mask & (cols > qpos - max(args.sliding_window, 1))

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, is_sliding, lw = xs
        hidden, kv = gemma2_layer(args, lw, hidden, kv, layer_idx, is_sliding,
                                  position_ids, attn_mask, sliding_mask,
                                  write_offset, inv_freq, rope_scale)
        return (hidden, kv), None

    layer_ids = jax.lax.iota(jnp.int32, args.n_layers)
    is_sliding = (layer_ids % 2) == 0
    (hidden, kv), _ = lax.scan(body, (hidden, kv), (layer_ids, is_sliding, layers))

    hidden = gemma_rms_norm(hidden, params["final_norm"], args.rms_eps)
    head = params.get("lm_head")
    if head is None:
        logits = jnp.dot(hidden, params["embed"].T, preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32)
    if args.final_softcap > 0:
        logits = args.final_softcap * jnp.tanh(logits / args.final_softcap)
    return logits, kv


def gemma_params_from_hf_state_dict(sd, cfg: ModelConfig, max_length: int,
                                    dtype=jnp.bfloat16, n_layers: Optional[int] = None) -> dict:
    from .weights import _to_jnp

    n = n_layers if n_layers is not None else cfg.num_hidden_layers
    P = "model."

    def get(name):
        a = sd[name]
        return a.astype(np.float32) if a.dtype == np.float16 else a

    def stack_linear(fmt):
        return _to_jnp(np.stack([get(fmt.format(i)).T for i in range(n)]), dtype)

    def stack_vec(fmt):
        return _to_jnp(np.stack([get(fmt.format(i)) for i in range(n)]), dtype)

    layers = {
        "input_norm": stack_vec(P + "layers.{}.input_layernorm.weight"),
        "post_attn_norm": stack_vec(P + "layers.{}.post_attention_layernorm.weight"),
        "pre_ff_norm": stack_vec(P + "layers.{}.pre_feedforward_layernorm.weight"),
        "post_ff_norm": stack_vec(P + "layers.{}.post_feedforward_layernorm.weight"),
        "wq": stack_linear(P + "layers.{}.self_attn.q_proj.weight"),
        "wk": stack_linear(P + "layers.{}.self_attn.k_proj.weight"),
        "wv": stack_linear(P + "layers.{}.self_attn.v_proj.weight"),
        "wo": stack_linear(P + "layers.{}.self_attn.o_proj.weight"),
        "gate": stack_linear(P + "layers.{}.mlp.gate_proj.weight"),
        "up": stack_linear(P + "layers.{}.mlp.up_proj.weight"),
        "down": stack_linear(P + "layers.{}.mlp.down_proj.weight"),
    }
    params = {
        "embed": _to_jnp(get(P + "embed_tokens.weight"), dtype),
        "final_norm": _to_jnp(get(P + "norm.weight"), dtype),
        "layers": layers,
        **rope_params(cfg),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _to_jnp(get("lm_head.weight").T, dtype)
    return params


def load_gemma_params(path: str, cfg: ModelConfig, max_length: int, dtype=jnp.bfloat16,
                      n_layers: Optional[int] = None) -> dict:
    from .weights import _load_state_dict_np

    return gemma_params_from_hf_state_dict(
        _load_state_dict_np(path), cfg, max_length, dtype, n_layers=n_layers)
