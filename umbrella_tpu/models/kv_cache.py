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
    k: jnp.ndarray  # [layers, kv_heads, max_len, head_dim]
    v: jnp.ndarray


def init_kv_cache(cfg: ModelConfig, max_length: int, dtype=jnp.bfloat16,
                  num_layers: int | None = None) -> KVCache:
    n_layers = num_layers if num_layers is not None else cfg.num_hidden_layers
    shape = (n_layers, cfg.num_key_value_heads, max_length, cfg.resolved_head_dim)
    return KVCache(k=jnp.zeros(shape, dtype=dtype), v=jnp.zeros(shape, dtype=dtype))


def update_layer(
    kv: KVCache,
    layer_idx: int,
    k_new: jnp.ndarray,  # [S, kv_heads, head_dim]
    v_new: jnp.ndarray,
    offset,  # scalar slot index (may be traced)
) -> KVCache:
    idx = (layer_idx, 0, offset, 0)
    k_block = k_new.transpose(1, 0, 2)[None].astype(kv.k.dtype)  # [1, KVH, S, D]
    v_block = v_new.transpose(1, 0, 2)[None].astype(kv.v.dtype)
    return KVCache(
        k=lax.dynamic_update_slice(kv.k, k_block, idx),
        v=lax.dynamic_update_slice(kv.v, v_block, idx),
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

    n_layers, kvh, _, head_dim = kv.k.shape
    tree_size = local_indices.shape[0]
    pos = lax.iota(jnp.int32, tree_size)
    valid = (pos < accept_len)[:, None]
    sel = onehot(local_indices, tree_size, jnp.float32) * valid  # [T_out, T_src]

    def compact(buf):
        window = lax.dynamic_slice(
            buf, (0, 0, offset, 0), (n_layers, kvh, tree_size, head_dim))
        new = jnp.einsum("ts,lksd->lktd", sel, window.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(buf.dtype)
        return lax.dynamic_update_slice(buf, new, (0, 0, offset, 0))

    return KVCache(k=compact(kv.k), v=compact(kv.v))
