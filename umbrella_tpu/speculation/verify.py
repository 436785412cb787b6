"""Shared verify-phase math: Sequoia/SpecExec token-match acceptance.

Used by both engines (reference duplicates this logic across
`static_speculation_engine.py:283-351` and `dynamic_speculation_engine.py:250-327`).
All fixed-shape, jit-safe; tree metadata (bitmap/parents/node_in_path) may be static
constants (static trees) or traced values (dynamic beam trees).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.kv_cache import gather_compact
from ..ops import sampling as S
from ..ops.select import take_scalar, take_vec


def verify_tail(
    logits,  # [tree_size, V] fp32 target logits over the tree
    kv_t, kv_d, tokens, num_nodes, key,
    temperature, topp, penalty,
    bitmap,  # [tree_size, tree_size] bool ancestor closure incl. self
    parents,  # [tree_size] int32
    node_in_path,  # [tree_size] int32 — path length to each node (depth+1)
    eos_arr,  # [n_eos] int32
    *, tree_size: int, greedy: bool, topk: int, use_pen: bool,
):
    """Sample target tokens, run the accept rule, write accepted+bonus tokens,
    compact both KV caches, and advance num_nodes. Returns
    (tokens, kv_t, kv_d, num_nodes_new, accept_len, eos_found, block[tree_size+1])."""
    ids = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size,))
    if use_pen:
        logits = S.apply_repetition_penalty(logits, tokens, num_nodes + 1, penalty)
    if greedy:
        sampled = S.greedy_sample(logits)
    else:
        sampled = S.sample_top_k_top_p(key, logits, temperature, topk, topp)
    sampled = sampled.astype(jnp.int32)

    # Accept node v iff its token matches the target sample at its parent, for v and
    # every ancestor (mask-weighted ancestor count == path length, ref :313-321).
    accept = (take_vec(sampled, parents) == ids).at[0].set(True)
    anc_count = jnp.sum(
        bitmap.astype(jnp.int32) * accept[None, :].astype(jnp.int32), axis=-1)
    path_ok = anc_count == node_in_path
    accept_len0 = jnp.sum(path_ok).astype(jnp.int32)
    iota = jax.lax.iota(jnp.int32, tree_size)
    path = jnp.sort(jnp.where(path_ok, iota, tree_size))
    path = jnp.clip(path, 0, tree_size - 1)
    last = jnp.max(jnp.where(path_ok, iota, -1))
    bonus = take_scalar(sampled, last)

    acc_tokens = take_vec(ids, path)
    old_block = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size + 1,))
    bidx = jax.lax.iota(jnp.int32, tree_size + 1)
    acc_pad = jnp.concatenate([acc_tokens, acc_tokens[-1:]])
    block = jnp.where(bidx < accept_len0, acc_pad,
                      jnp.where(bidx == accept_len0, bonus, old_block))
    tokens = jax.lax.dynamic_update_slice(tokens, block, (num_nodes,))

    eos_pos = S.find_first_in_set(block, eos_arr, accept_len0 + 1)
    eos_found = eos_pos >= 0
    accept_len = jnp.where(eos_found, eos_pos, accept_len0).astype(jnp.int32)

    kv_t = gather_compact(kv_t, path, num_nodes, accept_len)
    kv_d = gather_compact(kv_d, path, num_nodes, accept_len)
    return tokens, kv_t, kv_d, num_nodes + accept_len, accept_len, eos_found, block
