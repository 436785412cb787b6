"""Functional linear KV cache.

Layout `[num_layers, max_length, kv_heads, head_dim]`, matching the reference's
`KV_Cache` (`umbrella/attn/cache.py:18-34`) but as an immutable pytree updated with
`lax.dynamic_update_slice` under jit (buffers are donated by the engine, so XLA updates
in place — the TPU analogue of the reference's `index_copy_`).

`gather_compact` is the fixed-shape reformulation of `gather_kv_incremental`
(`cache.py:41-49`): the accept path arrives padded to `tree_size`; gathered slots
beyond `accept_len` are zeroed, exactly like the reference zeroes the tail.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig


class KVCache(NamedTuple):
    k: jnp.ndarray  # [layers, max_len, kv_heads, head_dim]
    v: jnp.ndarray


def init_kv_cache(cfg: ModelConfig, max_length: int, dtype=jnp.bfloat16,
                  num_layers: int | None = None) -> KVCache:
    n_layers = num_layers if num_layers is not None else cfg.num_hidden_layers
    shape = (n_layers, max_length, cfg.num_key_value_heads, cfg.resolved_head_dim)
    return KVCache(k=jnp.zeros(shape, dtype=dtype), v=jnp.zeros(shape, dtype=dtype))


def update_layer(
    kv: KVCache,
    layer_idx: int,
    k_new: jnp.ndarray,  # [S, kv_heads, head_dim]
    v_new: jnp.ndarray,
    offset,  # scalar slot index (may be traced)
) -> KVCache:
    idx = (layer_idx, offset, 0, 0)
    return KVCache(
        k=lax.dynamic_update_slice(kv.k, k_new[None].astype(kv.k.dtype), idx),
        v=lax.dynamic_update_slice(kv.v, v_new[None].astype(kv.v.dtype), idx),
    )


def gather_compact(
    kv: KVCache,
    indices: jnp.ndarray,  # [tree_size] absolute slot ids, padded past accept_len
    offset,  # scalar: compaction destination (committed length before this verify)
    accept_len,  # scalar: number of valid entries in `indices`
) -> KVCache:
    """Copy accepted tree slots down to the linear prefix; zero the rest of the window."""
    tree_size = indices.shape[0]
    pos = jnp.arange(tree_size)
    valid = (pos < accept_len)[None, :, None, None]

    gathered_k = jnp.where(valid, kv.k[:, indices], 0).astype(kv.k.dtype)
    gathered_v = jnp.where(valid, kv.v[:, indices], 0).astype(kv.v.dtype)

    idx = (0, offset, 0, 0)
    return KVCache(
        k=lax.dynamic_update_slice(kv.k, gathered_k, idx),
        v=lax.dynamic_update_slice(kv.v, gathered_v, idx),
    )
