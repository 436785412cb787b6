"""Llama-family functional forward (covers Llama 2/3.x, Qwen2.5, Mistral).

A from-scratch, jit-first re-design of the reference's hand-rolled torch forward
(`umbrella/models/llama.py:75-134`, `qwen_layer.py:36-38` for QKV biases,
`mistral.py:29` for head_dim override). Differences from the reference, by design:

- Pure function of (params, kv, inputs) -> (logits, kv); the engine jits whole
  draft/verify phases around it and donates the KV buffers.
- Layers are stacked arrays traversed with `lax.scan` — one compiled layer body,
  no Python-level per-layer dispatch (the XLA analogue of CUDA-graphing the loop).
- bf16 weights/activations on the MXU, fp32 softmax/norm accumulation, fp32 logits.

Param pytree (all linear weights stored [in, out]):
  embed [V, H], lm_head [H, V] (absent => tied), final_norm [H],
  layers: dict of stacked arrays with leading dim n_layers:
    input_norm, post_norm [n, H]
    wq [n, H, H_q], wk/wv [n, H, KVH*D], wo [n, H_q, H]
    gate/up [n, H, I], down [n, I, H]
    optional bq [n, H_q], bk/bv [n, KVH*D]   (Qwen2.5 attention_bias)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..ops.attention import attend
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_params
from ..ops.select import embed_lookup
from .kv_cache import KVCache, update_layer


class StaticModelArgs(NamedTuple):
    """Hashable static description threaded through jit."""
    num_heads: int
    num_kv_heads: int
    head_dim: int
    hidden_size: int
    rms_eps: float
    n_layers: int
    awq_act_int8: bool = False  # W4A8 opt-in (ModelConfig.awq_act == "int8")
    # Tensor-parallel mesh axis. When set, the forward runs INSIDE shard_map with
    # local shapes (num_heads/num_kv_heads are per-shard counts) and inserts the
    # Megatron-style collectives itself: psum after wo and down, all-gather of
    # vocab-sharded logits (parallel/mesh.py builds these args).
    tp_axis: Optional[str] = None

    @classmethod
    def from_config(cls, cfg: ModelConfig, n_layers: Optional[int] = None) -> "StaticModelArgs":
        return cls(
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.resolved_head_dim,
            hidden_size=cfg.hidden_size,
            rms_eps=cfg.rms_norm_eps,
            n_layers=n_layers if n_layers is not None else cfg.num_hidden_layers,
            awq_act_int8=getattr(cfg, "awq_act", "bf16") == "int8",
        )


def _linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None,
            act_int8: bool = False) -> jnp.ndarray:
    """Dense or quantized linear; w may be an array [in, out], an AwqTensor,
    an AwqLayerView (stacked W4 weights + traced layer index), or an
    Int4FTensor (factorized-scale W4, int8-MXU draft path)."""
    from ..quantization.awq import AwqLayerView, AwqTensor, awq_matmul
    from ..quantization.int4f import Int4FTensor

    if isinstance(w, Int4FTensor):
        from ..ops.pallas.w4a8f import int4f_matmul

        return int4f_matmul(x, w, b)
    if isinstance(w, (AwqTensor, AwqLayerView)):
        return awq_matmul(x, w, b, act_int8=act_int8)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def split_scan_layers(layers: dict):
    """Partition stacked per-layer params: AwqTensor entries whole (for the
    layered W4A16 kernel), dense entries as scan xs.

    MEASURED SLOWER on v5e (2026-08): routing the 8B AWQ verify through the
    layered kernel cost +8 ms/step (27.6 vs 19.4 ms target fwd) — the
    scalar-prefetch grid spec adds per-call overhead (gate_up 223 vs 185 us,
    down 130 vs 48 us), while XLA's latency-hiding scheduler already overlaps
    the scan's per-layer weight-slice materialization with compute (a dense
    scan-xs dot measures within 3 us of a fixed-weight dot). Kept (with tests)
    for contexts where the slice copies cannot overlap; NOT used by default."""
    from ..quantization.awq import AwqTensor

    awq = {k: v for k, v in layers.items() if isinstance(v, AwqTensor)}
    dense = {k: v for k, v in layers.items() if not isinstance(v, AwqTensor)}
    return awq, dense


def view_scan_layer(awq: dict, dense_sliced: dict, layer_idx) -> dict:
    """Per-iteration layer weights: sliced dense entries + AwqLayerViews."""
    from ..quantization.awq import AwqLayerView

    lw = dict(dense_sliced)
    for k, v in awq.items():
        lw[k] = AwqLayerView(v, layer_idx)
    return lw


def _attn_projections(args: StaticModelArgs, lw: dict, hidden):
    """q/k/v activations; supports packed ("wqkv", like the reference's
    LlamaPackedLayer, ref llama.py:475-478) and unpacked layouts."""
    Hq = args.num_heads * args.head_dim
    KV = args.num_kv_heads * args.head_dim
    a8 = args.awq_act_int8
    if "wqkv" in lw:
        qkv = _linear(hidden, lw["wqkv"], lw.get("bqkv"), act_int8=a8)
        return qkv[..., :Hq], qkv[..., Hq:Hq + KV], qkv[..., Hq + KV:]
    return (_linear(hidden, lw["wq"], lw.get("bq"), act_int8=a8),
            _linear(hidden, lw["wk"], lw.get("bk"), act_int8=a8),
            _linear(hidden, lw["wv"], lw.get("bv"), act_int8=a8))


def _mlp_gate_up(lw: dict, hidden, act_int8: bool = False):
    if "gate_up" in lw:
        gu = _linear(hidden, lw["gate_up"], act_int8=act_int8)
        half = gu.shape[-1] // 2
        return gu[..., :half], gu[..., half:]
    return (_linear(hidden, lw["gate"], act_int8=act_int8),
            _linear(hidden, lw["up"], act_int8=act_int8))


def _mlp_act(lw: dict, hidden, act_int8: bool = False):
    """silu(gate) * up for the layer's MLP input projection. Routes packed AWQ
    gate_up through quantization/awq.awq_gate_up_silu, whose default is the
    COMPOSED sequence — the fused single-kernel variant measured slower on v5e
    (see ops/pallas/w4a16.w4a16_gate_up_silu) and stays opt-in for A/B runs."""
    from ..quantization.awq import AwqTensor, awq_gate_up_silu

    gu = lw.get("gate_up")
    if isinstance(gu, AwqTensor) and not act_int8:
        return awq_gate_up_silu(hidden, gu)
    gate, up = _mlp_gate_up(lw, hidden, act_int8=act_int8)
    return jax.nn.silu(gate) * up


def llama_attention(
    args: StaticModelArgs,
    lw: dict,  # single-layer weights (no leading layer dim)
    hidden: jnp.ndarray,  # [S, H]
    kv: KVCache,
    layer_idx,
    position_ids: jnp.ndarray,
    attn_mask: jnp.ndarray,
    write_offset,
    inv_freq: jnp.ndarray,
    rope_scale,
) -> Tuple[jnp.ndarray, KVCache]:
    S = hidden.shape[0]
    D = args.head_dim
    q, k, v = _attn_projections(args, lw, hidden)
    q = q.reshape(S, args.num_heads, D)
    k = k.reshape(S, args.num_kv_heads, D)
    v = v.reshape(S, args.num_kv_heads, D)
    q, k = apply_rope(q, k, inv_freq, rope_scale, position_ids)

    kv = update_layer(kv, layer_idx, k, v, write_offset)
    out = attend(q, kv.k, kv.v, attn_mask, kv_limit=write_offset + S,
                 k_scale=kv.k_scale, v_scale=kv.v_scale, layer_idx=layer_idx)
    out = _linear(out.reshape(S, args.num_heads * D), lw["wo"],
                  act_int8=args.awq_act_int8)
    if args.tp_axis is not None:  # row-parallel wo: sum the K-partial products
        out = lax.psum(out, args.tp_axis)
    return out, kv


def llama_layer(
    args: StaticModelArgs,
    lw: dict,
    hidden: jnp.ndarray,
    kv: KVCache,
    layer_idx,
    position_ids,
    attn_mask,
    write_offset,
    inv_freq,
    rope_scale,
) -> Tuple[jnp.ndarray, KVCache]:
    residual = hidden
    hidden = rms_norm(hidden, lw["input_norm"], args.rms_eps)
    attn_out, kv = llama_attention(
        args, lw, hidden, kv, layer_idx, position_ids, attn_mask, write_offset,
        inv_freq, rope_scale
    )
    hidden = residual + attn_out
    residual = hidden
    hidden = rms_norm(hidden, lw["post_norm"], args.rms_eps)
    act = _mlp_act(lw, hidden, act_int8=args.awq_act_int8)
    hidden = _linear(act, lw["down"], act_int8=args.awq_act_int8)
    if args.tp_axis is not None:  # row-parallel down: sum the K-partial products
        hidden = lax.psum(hidden, args.tp_axis)
    return residual + hidden, kv


def llama_forward(
    params: dict,
    args: StaticModelArgs,
    kv: KVCache,
    input_ids: jnp.ndarray,  # [S]
    position_ids: jnp.ndarray,  # [S]
    attn_mask: jnp.ndarray,  # [S, L] bool
    write_offset,  # scalar slot index
) -> Tuple[jnp.ndarray, KVCache]:
    """Full forward; returns (fp32 logits [S, V], updated kv)."""
    layers = params["layers"]
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]
    hidden = embed_lookup(params["embed"], input_ids, params["final_norm"].dtype)

    if any(isinstance(v, tuple) for v in layers.values()):
        # Quantized layers arrive as per-layer TUPLES (loader._stack_awq): the
        # loop is unrolled so each pallas kernel reads its layer's packed
        # weights in place — scanning a stacked array would copy ~163 us/layer
        # (traced on v5e at 8B shapes). Dense entries index with a static i
        # (XLA fuses the slice into the consuming dot for free).
        for i in range(args.n_layers):
            lw = {k: v[i] for k, v in layers.items()}
            hidden, kv = llama_layer(
                args, lw, hidden, kv, i, position_ids, attn_mask, write_offset,
                inv_freq, rope_scale)
    else:
        def body(carry, xs):
            hidden, kv = carry
            layer_idx, lw = xs
            hidden, kv = llama_layer(
                args, lw, hidden, kv, layer_idx, position_ids, attn_mask,
                write_offset, inv_freq, rope_scale
            )
            return (hidden, kv), None

        layer_ids = jax.lax.iota(jnp.int32, args.n_layers)
        (hidden, kv), _ = lax.scan(body, (hidden, kv), (layer_ids, layers))

    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    logits = lm_head_logits(params, hidden)
    if args.tp_axis is not None and "lm_head" in params:
        # vocab-sharded head -> local [S, V/m] logits; engines need the full row
        # (tied heads compute against the replicated embed, already full-width)
        logits = lax.all_gather(logits, args.tp_axis, axis=-1, tiled=True)
    return logits, kv


def lm_head_logits(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """fp32 logits head: tied embedding, dense lm_head, or W4 (AwqTensor) lm_head
    (the untied 8B head is 1 GB in bf16 ~ 1.4 ms/step; fp32 kernel output keeps
    logits exact-accumulated). Shared by the single-slot and batched forwards."""
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(hidden, params["embed"].T, preferred_element_type=jnp.float32)
    else:
        from ..quantization.awq import AwqTensor, awq_matmul
        from ..quantization.int4f import Int4FTensor

        if isinstance(lm_head, Int4FTensor):
            from ..ops.pallas.w4a8f import int4f_matmul

            logits = int4f_matmul(hidden, lm_head, out_dtype=jnp.float32)
        elif isinstance(lm_head, AwqTensor):
            logits = awq_matmul(hidden, lm_head, out_dtype=jnp.float32)
        else:
            logits = jnp.dot(hidden, lm_head, preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32)


def init_llama_params(
    cfg: ModelConfig, key: jax.Array, max_length: int, dtype=jnp.bfloat16,
    n_layers: Optional[int] = None, packed: bool = True,
) -> dict:
    """Random-init params (tiny-model tests; real weights come from models/weights.py).

    packed=True fuses QKV and gate|up projections (fewer matmul launches); TP
    sharding requires packed=False (column shards would straddle section bounds).
    """
    n = n_layers if n_layers is not None else cfg.num_hidden_layers
    H, D = cfg.hidden_size, cfg.resolved_head_dim
    Hq = cfg.num_attention_heads * D
    KV = cfg.num_key_value_heads * D
    I, V = cfg.intermediate_size, cfg.vocab_size
    keys = iter(jax.random.split(key, 16))

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = {
        "input_norm": jnp.ones((n, H), dtype),
        "post_norm": jnp.ones((n, H), dtype),
        "wo": w(next(keys), (n, Hq, H)),
        "down": w(next(keys), (n, I, H)),
    }
    if packed:
        layers["wqkv"] = w(next(keys), (n, H, Hq + 2 * KV))
        layers["gate_up"] = w(next(keys), (n, H, 2 * I))
        if cfg.attention_bias:
            layers["bqkv"] = jnp.zeros((n, Hq + 2 * KV), dtype)
    else:
        layers["wq"] = w(next(keys), (n, H, Hq))
        layers["wk"] = w(next(keys), (n, H, KV))
        layers["wv"] = w(next(keys), (n, H, KV))
        layers["gate"] = w(next(keys), (n, H, I))
        layers["up"] = w(next(keys), (n, H, I))
        if cfg.attention_bias:
            layers["bq"] = jnp.zeros((n, Hq), dtype)
            layers["bk"] = jnp.zeros((n, KV), dtype)
            layers["bv"] = jnp.zeros((n, KV), dtype)

    params = {
        "embed": w(next(keys), (V, H)),
        "final_norm": jnp.ones((H,), dtype),
        "layers": layers,
        **rope_params(cfg),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(next(keys), (H, V))
    return params
