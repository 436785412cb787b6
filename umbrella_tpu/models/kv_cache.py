"""Functional linear KV cache.

Layout `[num_layers, kv_heads, max_length, head_dim]` — the reference's
`StaticKV_Cache` layout (`umbrella/attn/cache.py:112-119`), chosen over the
`[L, heads, D]` variant because it tiles directly onto TPU (slot axis on sublanes,
head_dim on lanes) and feeds the flash kernel with zero transposes. Updated with
`lax.dynamic_update_slice` under jit (buffers are donated by the engine, so XLA
updates in place — the TPU analogue of the reference's `index_copy_`).

`gather_compact` is the fixed-shape reformulation of `gather_kv_incremental`
(`cache.py:136-144`): the accept path arrives padded to `tree_size`; gathered slots
beyond `accept_len` are zeroed, exactly like the reference zeroes the tail.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig


class KVCache(NamedTuple):
    k: jnp.ndarray  # [layers, kv_heads, max_len, head_dim] (bf16/f32, or int8 when quantized)
    v: jnp.ndarray
    # [layers, kv_heads, max_len] — int8 mode only. NO trailing singleton dim:
    # a [..., L, 1] layout is padded 128x in lane tiles when materialized
    # uncompressed for a Pallas call input (measured: two 4 GB HLO temps for
    # 32 MB of scales at B=16, the round-4 B=16-int8 compile OOM).
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_kv_cache(cfg: ModelConfig, max_length: int, dtype=jnp.bfloat16,
                  num_layers: int | None = None) -> KVCache:
    n_layers = num_layers if num_layers is not None else cfg.num_hidden_layers
    shape = (n_layers, cfg.num_key_value_heads, max_length, cfg.resolved_head_dim)
    if dtype in ("int8", jnp.int8):
        sshape = shape[:-1]
        return KVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32))
    return KVCache(k=jnp.zeros(shape, dtype=dtype), v=jnp.zeros(shape, dtype=dtype))


def _quantize_block(x: jnp.ndarray):
    """[..., S, D] fp -> (int8 values, f32 per-row scales [..., S])."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def update_layer(
    kv: KVCache,
    layer_idx: int,
    k_new: jnp.ndarray,  # [S, kv_heads, head_dim]
    v_new: jnp.ndarray,
    offset,  # scalar slot index (may be traced)
) -> KVCache:
    idx = (layer_idx, 0, offset, 0)
    k_block = k_new.transpose(1, 0, 2)[None]  # [1, KVH, S, D]
    v_block = v_new.transpose(1, 0, 2)[None]
    if kv.quantized:
        kq, ks = _quantize_block(k_block)
        vq, vs = _quantize_block(v_block)
        sidx = (layer_idx, 0, offset)
        return KVCache(
            k=lax.dynamic_update_slice(kv.k, kq, idx),
            v=lax.dynamic_update_slice(kv.v, vq, idx),
            k_scale=lax.dynamic_update_slice(kv.k_scale, ks, sidx),
            v_scale=lax.dynamic_update_slice(kv.v_scale, vs, sidx),
        )
    return KVCache(
        k=lax.dynamic_update_slice(kv.k, k_block.astype(kv.k.dtype), idx),
        v=lax.dynamic_update_slice(kv.v, v_block.astype(kv.v.dtype), idx),
    )


def gather_compact(
    kv: KVCache,
    local_indices: jnp.ndarray,  # [tree_size] tree-LOCAL slot ids (0..tree_size)
    offset,  # scalar: compaction destination == tree window start (committed length)
    accept_len,  # scalar: number of valid entries in `local_indices`
) -> KVCache:
    """Copy accepted tree slots down to the linear prefix; zero the rest of the window.

    Gather-free: slice the tree window, select rows with a one-hot matmul (exact —
    each output row has at most one source), write the window back. See
    ops/select.py for why runtime gathers are banned.
    """
    from ..ops.select import onehot

    tree_size = local_indices.shape[0]
    pos = lax.iota(jnp.int32, tree_size)
    valid = (pos < accept_len)[:, None]
    sel = onehot(local_indices, tree_size, jnp.float32) * valid  # [T_out, T_src]

    def compact(buf):
        if buf is None:
            return None
        if buf.ndim == 3:  # int8 scales [n_layers, KVH, L]
            n_layers, kvh, _ = buf.shape
            window = lax.dynamic_slice(
                buf, (0, 0, offset), (n_layers, kvh, tree_size))
            new = jnp.einsum("ts,lks->lkt", sel, window.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            return lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                            (0, 0, offset))
        n_layers, kvh, _, last = buf.shape
        window = lax.dynamic_slice(
            buf, (0, 0, offset, 0), (n_layers, kvh, tree_size, last))
        new = jnp.einsum("ts,lksd->lktd", sel, window.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        if buf.dtype == jnp.int8:
            new = jnp.round(new)  # exact one-hot select; round guards fp noise
        new = new.astype(buf.dtype)
        return lax.dynamic_update_slice(buf, new, (0, 0, offset, 0))

    return KVCache(k=compact(kv.k), v=compact(kv.v),
                   k_scale=compact(kv.k_scale), v_scale=compact(kv.v_scale))
