"""Batched (multi-slot) llama forward + KV cache for continuous batching.

The reference is strictly batch-1 — its KV cache has no batch dimension
(`umbrella/attn/cache.py:18-34`) and its server serializes requests through one
worker (`umbrella/api/server.py:43-55`). This module is the TPU-native extension the
north star asks for: B request SLOTS decode in one compiled step, each slot with its
own committed length (`num_nodes[b]`) and KV window.

Design rules (CLAUDE.md axon runtime):
- No vmap over indexing ops — a vmapped dynamic_slice lowers to a gather, which
  poisons this runtime's dispatch path. Per-slot slices/updates are UNROLLED Python
  loops over the static slot count B (each iteration a cheap contiguous DMA);
  everything dense (projections, rope, attention einsums, norms) batches naturally.
- KV layout [n_layers, B, kv_heads, L, head_dim]: slot-major windows are contiguous,
  so per-slot writes/compaction touch one [KVH, S, D] block.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from ..ops.attention import attend_batched
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..ops.select import embed_lookup, onehot
from .llama import (StaticModelArgs, _attn_projections, _linear, _mlp_act,
                    lm_head_logits)


class BatchedKVCache(NamedTuple):
    k: jnp.ndarray  # [n_layers, B, kv_heads, L, head_dim] (bf16/f32, int8 when quantized)
    v: jnp.ndarray
    # [n_layers, B, kv_heads, L] — int8 mode. No trailing singleton: see
    # models/kv_cache.KVCache (a [..., L, 1] Pallas input is lane-padded 128x).
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_batched_kv(cfg: ModelConfig, batch: int, max_length: int,
                    dtype=jnp.bfloat16, num_layers: Optional[int] = None) -> BatchedKVCache:
    n = num_layers if num_layers is not None else cfg.num_hidden_layers
    shape = (n, batch, cfg.num_key_value_heads, max_length, cfg.resolved_head_dim)
    if dtype in ("int8", jnp.int8):
        sshape = shape[:-1]
        return BatchedKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32))
    return BatchedKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def update_layer_batched(kv: BatchedKVCache, layer_idx, k_new, v_new, offsets):
    """Write [B, S, KVH, D] new keys/values at per-slot offsets (unrolled writes)."""
    from .kv_cache import _quantize_block

    B = k_new.shape[0]
    k, v, ks, vs = kv.k, kv.v, kv.k_scale, kv.v_scale
    for b in range(B):
        kb = k_new[b].transpose(1, 0, 2)[None, None]  # [1,1,KVH,S,D]
        vb = v_new[b].transpose(1, 0, 2)[None, None]
        idx = (layer_idx, b, 0, offsets[b], 0)
        if kv.quantized:
            kq, kss = _quantize_block(kb)
            vq, vss = _quantize_block(vb)
            sidx = (layer_idx, b, 0, offsets[b])
            k = lax.dynamic_update_slice(k, kq, idx)
            v = lax.dynamic_update_slice(v, vq, idx)
            ks = lax.dynamic_update_slice(ks, kss, sidx)
            vs = lax.dynamic_update_slice(vs, vss, sidx)
        else:
            k = lax.dynamic_update_slice(k, kb.astype(k.dtype), idx)
            v = lax.dynamic_update_slice(v, vb.astype(v.dtype), idx)
    return BatchedKVCache(k, v, ks, vs)


def update_layer_slot(kv: BatchedKVCache, layer_idx, k_new, v_new, slot, offset):
    """Write [S, KVH, D] new keys/values for ONE (traced) slot at `offset`."""
    from .kv_cache import _quantize_block

    kb = k_new.transpose(1, 0, 2)[None, None]
    vb = v_new.transpose(1, 0, 2)[None, None]
    idx = (layer_idx, slot, 0, offset, 0)
    if kv.quantized:
        kq, ks = _quantize_block(kb)
        vq, vs = _quantize_block(vb)
        sidx = (layer_idx, slot, 0, offset)
        return BatchedKVCache(
            k=lax.dynamic_update_slice(kv.k, kq, idx),
            v=lax.dynamic_update_slice(kv.v, vq, idx),
            k_scale=lax.dynamic_update_slice(kv.k_scale, ks, sidx),
            v_scale=lax.dynamic_update_slice(kv.v_scale, vs, sidx))
    return BatchedKVCache(
        k=lax.dynamic_update_slice(kv.k, kb.astype(kv.k.dtype), idx),
        v=lax.dynamic_update_slice(kv.v, vb.astype(kv.v.dtype), idx))


def gather_compact_batched(kv: BatchedKVCache, local_indices, offsets, accept_lens):
    """Per-slot KV compaction (see kv_cache.gather_compact): for each slot b, copy
    accepted tree slots `local_indices[b]` down to the linear prefix at offsets[b],
    zero the rest of the window. Unrolled over slots; one-hot select (exact)."""
    B, tree_size = local_indices.shape
    pos = lax.iota(jnp.int32, tree_size)

    k, v, ks, vs = kv.k, kv.v, kv.k_scale, kv.v_scale
    n_layers, _, kvh, _, D = k.shape
    for b in range(B):
        valid = (pos < accept_lens[b])[:, None]
        sel = onehot(local_indices[b], tree_size, jnp.float32) * valid

        def compact(buf):
            if buf is None:
                return None
            if buf.ndim == 4:  # int8 scales [n_layers, B, KVH, L]
                window = lax.dynamic_slice(
                    buf, (0, b, 0, offsets[b]), (n_layers, 1, kvh, tree_size))
                new = jnp.einsum("ts,lbks->lbkt", sel,
                                 window.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                return lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                                (0, b, 0, offsets[b]))
            last = buf.shape[-1]
            window = lax.dynamic_slice(
                buf, (0, b, 0, offsets[b], 0), (n_layers, 1, kvh, tree_size, last))
            new = jnp.einsum("ts,lbksd->lbktd", sel, window.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            if buf.dtype == jnp.int8:
                new = jnp.round(new)  # exact one-hot select; round guards fp noise
            new = new.astype(buf.dtype)
            return lax.dynamic_update_slice(buf, new, (0, b, 0, offsets[b], 0))

        k, v, ks, vs = compact(k), compact(v), compact(ks), compact(vs)
    return BatchedKVCache(k, v, ks, vs)


def batched_llama_forward(
    params: dict,
    args: StaticModelArgs,
    kv: BatchedKVCache,
    input_ids: jnp.ndarray,     # [B, S]
    position_ids: jnp.ndarray,  # [B, S]
    attn_mask: jnp.ndarray,     # [B, S, L] bool
    write_offsets: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """All-slots decode forward; returns (fp32 logits [B, S, V], updated kv)."""
    B, S = input_ids.shape
    H, D = args.num_heads, args.head_dim
    KVH = args.num_kv_heads
    scale = 1.0 / (D ** 0.5)
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]

    dt = params["final_norm"].dtype
    # one flat lookup for all slots (on TPU: a single pipelined-DMA kernel call)
    hidden = embed_lookup(params["embed"], input_ids.reshape(-1), dt) \
        .reshape(B, S, -1)

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, lw = xs
        residual = hidden
        x = rms_norm(hidden, lw["input_norm"], args.rms_eps)
        q, k, v = _attn_projections(args, lw, x)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, KVH, D)
        v = v.reshape(B, S, KVH, D)
        # rope is pure positionwise math — vmap is gather-free
        q, k = jax.vmap(lambda qq, kk, pp: apply_rope(
            qq, kk, inv_freq, rope_scale, pp))(q, k, position_ids)
        kv = update_layer_batched(kv, layer_idx, k, v, write_offsets)
        out = attend_batched(
            q, kv.k, kv.v, attn_mask, kv_limits=write_offsets + S,
            layer_idx=layer_idx, scale=scale,
            k_scale=kv.k_scale, v_scale=kv.v_scale).reshape(B, S, H * D)
        attn = _linear(out, lw["wo"])
        if args.tp_axis is not None:  # row-parallel wo: sum the K-partial products
            attn = lax.psum(attn, args.tp_axis)
        hidden = residual + attn
        residual = hidden
        x = rms_norm(hidden, lw["post_norm"], args.rms_eps)
        mlp = _linear(_mlp_act(lw, x), lw["down"])
        if args.tp_axis is not None:  # row-parallel down
            mlp = lax.psum(mlp, args.tp_axis)
        hidden = residual + mlp
        return (hidden, kv), None

    layers = params["layers"]
    if any(isinstance(v, tuple) for v in layers.values()):
        # per-layer AWQ tuples: unroll (see llama.llama_forward / loader._stack_awq)
        for i in range(args.n_layers):
            (hidden, kv), _ = body((hidden, kv), (i, {k: v[i] for k, v in layers.items()}))
    else:
        layer_ids = lax.iota(jnp.int32, args.n_layers)
        (hidden, kv), _ = lax.scan(body, (hidden, kv), (layer_ids, layers))

    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    logits = lm_head_logits(params, hidden)
    if args.tp_axis is not None and "lm_head" in params:
        # vocab-sharded head -> local [B, S, V/m] logits; gather the full row
        logits = lax.all_gather(logits, args.tp_axis, axis=-1, tiled=True)
    return logits, kv


def _gemma_sliding_mask(attn_mask, position_ids, window: int):
    """Per-slot sliding constraint in slot space (committed slot == position;
    see gemma.gemma2_forward). attn_mask [..., S, L], position_ids [..., S]."""
    cols = lax.broadcasted_iota(jnp.int32, attn_mask.shape, attn_mask.ndim - 1)
    return attn_mask & (cols > position_ids[..., None] - max(window, 1))


def batched_gemma2_forward(
    params: dict,
    args,                       # GemmaStaticArgs
    kv: BatchedKVCache,
    input_ids: jnp.ndarray,     # [B, S]
    position_ids: jnp.ndarray,  # [B, S]
    attn_mask: jnp.ndarray,     # [B, S, L] bool
    write_offsets: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """All-slots Gemma2 decode forward (arch deltas vs batched_llama_forward:
    4 (1+w)-norms, sqrt(H) embed scale, attn/final softcaps, even-layer sliding
    window, gelu-tanh MLP — reference `umbrella/models/gemma.py:36-159`)."""
    from ..ops.norms import gemma_rms_norm

    B, S = input_ids.shape
    H, D, KVH = args.num_heads, args.head_dim, args.num_kv_heads
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]

    dt = params["final_norm"].dtype
    hidden = embed_lookup(params["embed"], input_ids.reshape(-1), dt) \
        .reshape(B, S, -1)
    hidden = hidden * jnp.asarray(args.hidden_size ** 0.5, hidden.dtype)
    sliding_mask = _gemma_sliding_mask(attn_mask, position_ids,
                                       args.sliding_window)

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, is_sliding, lw = xs
        mask = jnp.where(is_sliding, sliding_mask, attn_mask)
        residual = hidden
        x = gemma_rms_norm(hidden, lw["input_norm"], args.rms_eps)
        q = _linear(x, lw["wq"]).reshape(B, S, H, D)
        k = _linear(x, lw["wk"]).reshape(B, S, KVH, D)
        v = _linear(x, lw["wv"]).reshape(B, S, KVH, D)
        q, k = jax.vmap(lambda qq, kk, pp: apply_rope(
            qq, kk, inv_freq, rope_scale, pp))(q, k, position_ids)
        kv = update_layer_batched(kv, layer_idx, k, v, write_offsets)
        out = attend_batched(
            q, kv.k, kv.v, mask, kv_limits=write_offsets + S,
            layer_idx=layer_idx, scale=args.attn_scale,
            logits_soft_cap=args.attn_softcap,
            k_scale=kv.k_scale, v_scale=kv.v_scale).reshape(B, S, H * D)
        out = _linear(out, lw["wo"])
        if args.tp_axis is not None:
            # row-parallel wo: psum BEFORE post_attn_norm (norms are nonlinear)
            out = lax.psum(out, args.tp_axis)
        out = gemma_rms_norm(out, lw["post_attn_norm"], args.rms_eps)
        hidden = residual + out
        residual = hidden
        x = gemma_rms_norm(hidden, lw["pre_ff_norm"], args.rms_eps)
        gate = jax.nn.gelu(_linear(x, lw["gate"]), approximate=True)
        mlp = _linear(gate * _linear(x, lw["up"]), lw["down"])
        if args.tp_axis is not None:  # row-parallel down, ditto
            mlp = lax.psum(mlp, args.tp_axis)
        mlp = gemma_rms_norm(mlp, lw["post_ff_norm"], args.rms_eps)
        return (residual + mlp, kv), None

    layer_ids = lax.iota(jnp.int32, args.n_layers)
    (hidden, kv), _ = lax.scan(
        body, (hidden, kv), (layer_ids, (layer_ids % 2) == 0, params["layers"]))

    hidden = gemma_rms_norm(hidden, params["final_norm"], args.rms_eps)
    head = params.get("lm_head")
    if head is None:
        logits = jnp.dot(hidden, params["embed"].T,
                         preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
        if args.tp_axis is not None:  # vocab-sharded head -> gather full row
            logits = lax.all_gather(logits, args.tp_axis, axis=-1, tiled=True)
    logits = logits.astype(jnp.float32)
    if args.final_softcap > 0:
        logits = args.final_softcap * jnp.tanh(logits / args.final_softcap)
    return logits, kv


def slot_gemma2_forward(
    params: dict,
    args,                       # GemmaStaticArgs
    kv: BatchedKVCache,
    input_ids: jnp.ndarray,     # [S]
    position_ids: jnp.ndarray,  # [S]
    attn_mask: jnp.ndarray,     # [S, L] bool
    slot,                       # traced scalar slot id
    write_offset,               # traced scalar
) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """Single-slot Gemma2 forward (prefill path of the batched engine)."""
    from ..ops.norms import gemma_rms_norm

    S = input_ids.shape[0]
    H, D, KVH = args.num_heads, args.head_dim, args.num_kv_heads
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]

    hidden = embed_lookup(params["embed"], input_ids, params["final_norm"].dtype)
    hidden = hidden * jnp.asarray(args.hidden_size ** 0.5, hidden.dtype)
    sliding_mask = _gemma_sliding_mask(attn_mask, position_ids,
                                       args.sliding_window)

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, is_sliding, lw = xs
        mask = jnp.where(is_sliding, sliding_mask, attn_mask)
        residual = hidden
        x = gemma_rms_norm(hidden, lw["input_norm"], args.rms_eps)
        q = _linear(x, lw["wq"]).reshape(S, H, D)
        k = _linear(x, lw["wk"]).reshape(S, KVH, D)
        v = _linear(x, lw["wv"]).reshape(S, KVH, D)
        q, k = apply_rope(q, k, inv_freq, rope_scale, position_ids)
        kv = update_layer_slot(kv, layer_idx, k, v, slot, write_offset)
        out = attend_batched(
            q[None], kv.k, kv.v, mask[None],
            kv_limits=jnp.asarray(write_offset + S, jnp.int32).reshape(1),
            layer_idx=layer_idx, slots=jnp.asarray(slot, jnp.int32).reshape(1),
            scale=args.attn_scale, logits_soft_cap=args.attn_softcap,
            k_scale=kv.k_scale, v_scale=kv.v_scale)[0].reshape(S, H * D)
        out = _linear(out, lw["wo"])
        if args.tp_axis is not None:
            out = lax.psum(out, args.tp_axis)
        out = gemma_rms_norm(out, lw["post_attn_norm"], args.rms_eps)
        hidden = residual + out
        residual = hidden
        x = gemma_rms_norm(hidden, lw["pre_ff_norm"], args.rms_eps)
        gate = jax.nn.gelu(_linear(x, lw["gate"]), approximate=True)
        mlp = _linear(gate * _linear(x, lw["up"]), lw["down"])
        if args.tp_axis is not None:
            mlp = lax.psum(mlp, args.tp_axis)
        mlp = gemma_rms_norm(mlp, lw["post_ff_norm"], args.rms_eps)
        return (residual + mlp, kv), None

    layer_ids = lax.iota(jnp.int32, args.n_layers)
    (hidden, kv), _ = lax.scan(
        body, (hidden, kv), (layer_ids, (layer_ids % 2) == 0, params["layers"]))

    hidden = gemma_rms_norm(hidden, params["final_norm"], args.rms_eps)
    head = params.get("lm_head")
    if head is None:
        logits = jnp.dot(hidden, params["embed"].T,
                         preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
        if args.tp_axis is not None:
            logits = lax.all_gather(logits, args.tp_axis, axis=-1, tiled=True)
    logits = logits.astype(jnp.float32)
    if args.final_softcap > 0:
        logits = args.final_softcap * jnp.tanh(logits / args.final_softcap)
    return logits, kv


def batched_moe_forward(
    params: dict,
    args: StaticModelArgs,
    kv: BatchedKVCache,
    input_ids: jnp.ndarray,     # [B, S]
    position_ids: jnp.ndarray,  # [B, S]
    attn_mask: jnp.ndarray,     # [B, S, L] bool
    write_offsets: jnp.ndarray,  # [B]
    top_k: int = 2,
) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """All-slots MoE decode forward: batched_llama_forward's attention over the
    batched KV cache + the dense-dispatch top-k MoE MLP (models/moe.moe_mlp,
    already [B, S, H]-shaped — continuous batching composes with expert
    parallelism for free: with params sharded P(None, 'expert', ...) GSPMD
    partitions the per-expert einsums and inserts one psum for the combine).
    The reference has neither MoE nor batching (SURVEY §2: dense-MLP only,
    batch-1 KV `umbrella/attn/cache.py:18-34`)."""
    from .moe import moe_mlp

    B, S = input_ids.shape
    H, D, KVH = args.num_heads, args.head_dim, args.num_kv_heads
    scale = 1.0 / (D ** 0.5)
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]

    dt = params["final_norm"].dtype
    hidden = embed_lookup(params["embed"], input_ids.reshape(-1), dt) \
        .reshape(B, S, -1)

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, lw = xs
        residual = hidden
        x = rms_norm(hidden, lw["input_norm"], args.rms_eps)
        q, k, v = _attn_projections(args, lw, x)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, KVH, D)
        v = v.reshape(B, S, KVH, D)
        q, k = jax.vmap(lambda qq, kk, pp: apply_rope(
            qq, kk, inv_freq, rope_scale, pp))(q, k, position_ids)
        kv = update_layer_batched(kv, layer_idx, k, v, write_offsets)
        out = attend_batched(
            q, kv.k, kv.v, attn_mask, kv_limits=write_offsets + S,
            layer_idx=layer_idx, scale=scale,
            k_scale=kv.k_scale, v_scale=kv.v_scale).reshape(B, S, H * D)
        hidden = residual + _linear(out, lw["wo"])
        residual = hidden
        x = rms_norm(hidden, lw["post_norm"], args.rms_eps)
        mlp, _aux = moe_mlp(lw, x, top_k=top_k)
        return (residual + mlp, kv), None

    layer_ids = lax.iota(jnp.int32, args.n_layers)
    (hidden, kv), _ = lax.scan(body, (hidden, kv), (layer_ids, params["layers"]))

    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    logits = lm_head_logits(params, hidden)
    return logits, kv


def slot_moe_forward(
    params: dict,
    args: StaticModelArgs,
    kv: BatchedKVCache,
    input_ids: jnp.ndarray,     # [S]
    position_ids: jnp.ndarray,  # [S]
    attn_mask: jnp.ndarray,     # [S, L] bool
    slot,                       # traced scalar slot id
    write_offset,               # traced scalar
    top_k: int = 2,
) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """Single-slot MoE forward (prefill path of the batched engine)."""
    from .moe import moe_mlp

    S = input_ids.shape[0]
    H, D, KVH = args.num_heads, args.head_dim, args.num_kv_heads
    scale = 1.0 / (D ** 0.5)
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]

    hidden = embed_lookup(params["embed"], input_ids, params["final_norm"].dtype)

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, lw = xs
        residual = hidden
        x = rms_norm(hidden, lw["input_norm"], args.rms_eps)
        q, k, v = _attn_projections(args, lw, x)
        q = q.reshape(S, H, D)
        k = k.reshape(S, KVH, D)
        v = v.reshape(S, KVH, D)
        q, k = apply_rope(q, k, inv_freq, rope_scale, position_ids)
        kv = update_layer_slot(kv, layer_idx, k, v, slot, write_offset)
        out = attend_batched(
            q[None], kv.k, kv.v, attn_mask[None],
            kv_limits=jnp.asarray(write_offset + S, jnp.int32).reshape(1),
            layer_idx=layer_idx, slots=jnp.asarray(slot, jnp.int32).reshape(1),
            scale=scale, k_scale=kv.k_scale, v_scale=kv.v_scale)[0] \
            .reshape(S, H * D)
        hidden = residual + _linear(out, lw["wo"])
        residual = hidden
        x = rms_norm(hidden, lw["post_norm"], args.rms_eps)
        mlp, _aux = moe_mlp(lw, x[None], top_k=top_k)
        return (residual + mlp[0], kv), None

    layer_ids = lax.iota(jnp.int32, args.n_layers)
    (hidden, kv), _ = lax.scan(body, (hidden, kv), (layer_ids, params["layers"]))

    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    logits = lm_head_logits(params, hidden)
    return logits, kv


def slot_llama_forward(
    params: dict,
    args: StaticModelArgs,
    kv: BatchedKVCache,
    input_ids: jnp.ndarray,     # [S]
    position_ids: jnp.ndarray,  # [S]
    attn_mask: jnp.ndarray,     # [S, L] bool
    slot,                       # traced scalar slot id
    write_offset,               # traced scalar
) -> Tuple[jnp.ndarray, BatchedKVCache]:
    """Single-sequence forward for one slot of a batched cache (prefill path)."""
    S = input_ids.shape[0]
    H, D, KVH = args.num_heads, args.head_dim, args.num_kv_heads
    scale = 1.0 / (D ** 0.5)
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]

    hidden = embed_lookup(params["embed"], input_ids, params["final_norm"].dtype)

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, lw = xs
        residual = hidden
        x = rms_norm(hidden, lw["input_norm"], args.rms_eps)
        q, k, v = _attn_projections(args, lw, x)
        q = q.reshape(S, H, D)
        k = k.reshape(S, KVH, D)
        v = v.reshape(S, KVH, D)
        q, k = apply_rope(q, k, inv_freq, rope_scale, position_ids)
        kv = update_layer_slot(kv, layer_idx, k, v, slot, write_offset)
        out = attend_batched(
            q[None], kv.k, kv.v, attn_mask[None],
            kv_limits=jnp.asarray(write_offset + S, jnp.int32).reshape(1),
            layer_idx=layer_idx, slots=jnp.asarray(slot, jnp.int32).reshape(1),
            scale=scale, k_scale=kv.k_scale, v_scale=kv.v_scale)[0] \
            .reshape(S, H * D)
        attn = _linear(out, lw["wo"])
        if args.tp_axis is not None:  # row-parallel wo: sum the K-partial products
            attn = lax.psum(attn, args.tp_axis)
        hidden = residual + attn
        residual = hidden
        x = rms_norm(hidden, lw["post_norm"], args.rms_eps)
        mlp = _linear(_mlp_act(lw, x), lw["down"])
        if args.tp_axis is not None:  # row-parallel down
            mlp = lax.psum(mlp, args.tp_axis)
        hidden = residual + mlp
        return (hidden, kv), None

    layers = params["layers"]
    if any(isinstance(v, tuple) for v in layers.values()):
        # per-layer AWQ tuples: unroll (see llama.llama_forward / loader._stack_awq)
        for i in range(args.n_layers):
            (hidden, kv), _ = body((hidden, kv), (i, {k: v[i] for k, v in layers.items()}))
    else:
        layer_ids = lax.iota(jnp.int32, args.n_layers)
        (hidden, kv), _ = lax.scan(body, (hidden, kv), (layer_ids, layers))

    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    logits = lm_head_logits(params, hidden)
    if args.tp_axis is not None and "lm_head" in params:
        logits = lax.all_gather(logits, args.tp_axis, axis=-1, tiled=True)
    return logits, kv
