"""Gather-free selection primitives.

The axon TPU runtime permanently degrades its dispatch path (~25ms/call for the rest
of the session) once it executes an HLO kernel that fuses a gather with surrounding
ops. Every hot-path "indexing" operation therefore goes through these one-hot
formulations instead:

- a one-hot row-selection matmul is EXACT (each output element is a sum with at most
  one nonzero term, so no rounding ever occurs), and lands on the MXU;
- integer payloads are carried through f32 matmuls, exact below 2^24 (vocab ids,
  slot indices, and token ids all qualify).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def onehot(idx: jnp.ndarray, n: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[len(idx), n] one-hot rows; out-of-range indices produce all-zero rows."""
    iota = lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    return (idx[:, None] == iota).astype(dtype)


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] for a 2-D [n, d] table — one-hot matmul, exact."""
    sel = onehot(idx, table.shape[0], jnp.float32)
    return jnp.dot(sel, table.astype(jnp.float32),
                   preferred_element_type=jnp.float32).astype(table.dtype)


def take_vec(vec: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """vec[idx] for a 1-D vector (int or float), gather-free."""
    iota = lax.broadcasted_iota(jnp.int32, (idx.shape[0], vec.shape[0]), 1)
    hit = idx[:, None] == iota
    return jnp.sum(jnp.where(hit, vec[None, :], jnp.zeros_like(vec)[None, :]), axis=1)


def take_scalar(vec: jnp.ndarray, i) -> jnp.ndarray:
    """vec[i] for a traced scalar index, gather-free."""
    iota = lax.iota(jnp.int32, vec.shape[0])
    return jnp.sum(jnp.where(iota == i, vec, jnp.zeros_like(vec)))


def embed_lookup(embed: jnp.ndarray, input_ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """embed[input_ids] without an XLA gather.

    A one-hot matmul would read the WHOLE [V, H] table per call (~0.5GB for a 1B
    model). On TPU a single Pallas kernel issues pipelined row DMAs from the
    HBM-resident table (ops/pallas/embed_gather.py); elsewhere a fori_loop of
    dynamic_slice reads exactly S rows (dynamic_slice is on the runtime's
    safe-op list — gathers and closure constants are not, see module docstring).
    """
    S = input_ids.shape[0]
    V, H = embed.shape
    dtype = dtype or embed.dtype

    if jax.default_backend() in ("tpu", "axon"):
        from .pallas.embed_gather import embed_gather

        return embed_gather(embed, input_ids).astype(dtype)

    def body(i, out):
        row_id = lax.dynamic_slice(input_ids, (i,), (1,))[0]
        row = lax.dynamic_slice(embed, (row_id, 0), (1, H))
        return lax.dynamic_update_slice(out, row.astype(dtype), (i, 0))

    return lax.fori_loop(0, S, body, jnp.zeros((S, H), dtype))


def embed_lookup_onehot(embed: jnp.ndarray, input_ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """One-hot matmul variant (reads the full table; kept for comparison/tests)."""
    V, H = embed.shape
    dtype = dtype or embed.dtype
    sel = onehot(input_ids, V, embed.dtype)
    return jnp.dot(sel, embed, preferred_element_type=jnp.float32).astype(dtype)
