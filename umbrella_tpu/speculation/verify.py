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
from ..ops.select import onehot


def accept_and_commit(
    ids,        # [B, T] int32 speculated tree tokens
    sampled,    # [B, T] int32 target samples (greedy or stochastic)
    old_block,  # [B, T+1] int32 current token rows at the tree window
    bitmap,     # [T, T] bool ancestor closure incl. self (static or traced)
    parents,    # [T] int32
    node_in_path,  # [T] int32 path length to each node (depth+1)
    eos_arr,    # [E] int32
):
    """The ONE accept-rule implementation (Sequoia token-match + bonus + EOS
    clamp + block assembly), batched over a leading [B] axis. Single-slot
    callers (`verify_tail`, both engines) pass B=1; the batched serving engine
    (`serving/batched_engine.step_fn`) passes B=slots — one kernel of truth, so
    an accept-rule change cannot diverge between the jitted engines (the
    reference hand-duplicates this math across its two engines,
    `static_speculation_engine.py:283-351` / `dynamic_...py:250-327`).

    Accept node v iff its token matches the target sample at its parent, for v
    and every ancestor (mask-weighted ancestor count == path length,
    ref :313-321). All selects are one-hot/einsum (exact, gather-free).

    Returns (block [B, T+1], path [B, T], alen [B], eos_found [B]) where
    `alen` is the EOS-clamped accept length (callers gate it further, e.g. by
    the context cap) and `block` holds accepted tokens + the bonus token
    followed by the old tail."""
    B, T = ids.shape
    psel = onehot(parents, T, jnp.float32)  # [T, T]
    sam_par = jnp.einsum("ts,bs->bt", psel,
                         sampled.astype(jnp.float32)).astype(jnp.int32)
    accept = (sam_par == ids)
    accept = accept.at[:, 0].set(True)
    anc = jnp.einsum("ts,bs->bt", bitmap.astype(jnp.float32),
                     accept.astype(jnp.float32))
    path_ok = anc == node_in_path[None, :].astype(jnp.float32)
    alen0 = jnp.sum(path_ok, axis=1).astype(jnp.int32)
    iota = jax.lax.iota(jnp.int32, T)
    path = jnp.sort(jnp.where(path_ok, iota[None, :], T), axis=1)
    path = jnp.clip(path, 0, T - 1)
    last = jnp.max(jnp.where(path_ok, iota[None, :], -1), axis=1)
    bonus = jnp.sum(jnp.where(iota[None, :] == last[:, None], sampled, 0),
                    axis=1)
    hit = path[:, :, None] == iota[None, None, :]
    acc_tokens = jnp.sum(jnp.where(hit, ids[:, None, :], 0), axis=2)

    bidx = jax.lax.iota(jnp.int32, T + 1)[None, :]
    acc_pad = jnp.concatenate([acc_tokens, acc_tokens[:, -1:]], axis=1)
    block = jnp.where(bidx < alen0[:, None], acc_pad,
                      jnp.where(bidx == alen0[:, None],
                                bonus[:, None], old_block))

    is_eos = jnp.any(block[:, :, None] == eos_arr[None, None, :], axis=-1)
    is_eos &= bidx < (alen0 + 1)[:, None]
    first = jnp.min(jnp.where(is_eos, bidx, T + 1), axis=1)
    eos_found = first <= T
    alen = jnp.where(eos_found, first, alen0).astype(jnp.int32)
    return block, path, alen, eos_found


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

    old_block = jax.lax.dynamic_slice(tokens, (num_nodes,), (tree_size + 1,))
    block, path, accept_len, eos_found = accept_and_commit(
        ids[None], sampled[None], old_block[None],
        bitmap, parents, node_in_path, eos_arr)
    block, path = block[0], path[0]
    accept_len, eos_found = accept_len[0], eos_found[0]
    tokens = jax.lax.dynamic_update_slice(tokens, block, (num_nodes,))

    kv_t = gather_compact(kv_t, path, num_nodes, accept_len)
    kv_d = gather_compact(kv_d, path, num_nodes, accept_len)
    return tokens, kv_t, kv_d, num_nodes + accept_len, accept_len, eos_found, block
