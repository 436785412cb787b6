"""On-the-fly attention mask construction.

The reference materializes a persistent `[max_length, 2*max_length]` boolean buffer and
re-slices offset windows from it every iteration
(`umbrella/speculation/static_speculation_engine.py:55,150,345`). On TPU we never
materialize O(L^2) state: each jitted step computes only its own `[S, max_len]` mask
rows from scalars (committed length, query positions) plus the tiny per-tree ancestor
bitmap. Semantics are identical.

Implementation note: the tree window is placed with `lax.dynamic_update_slice` (a
shift), NOT a 2-D-index gather — multi-dimensional-index gathers permanently degrade
the axon TPU runtime's dispatch path (~25ms/call for the rest of the session) and are
banned from every hot path.

KV slot layout (one linear cache per model):
  slots [0, num_nodes)                    committed prefix (always visible)
  slots [num_nodes, num_nodes+tree_size)  current speculation tree (ancestor-visible)
"""
import jax.numpy as jnp
from jax import lax


def causal_mask_rows(
    q_start,  # scalar: absolute slot index of query row 0
    q_len: int,  # static number of query rows
    kv_len: int,  # static total kv slots
) -> jnp.ndarray:
    """Bool [q_len, kv_len]: row i may attend slot j iff j <= q_start + i.

    Used for prefill/append where slot index == position (reference semantics:
    `speculation_utils.make_causal_mask` + window slicing, static engine :150-156).
    """
    rows = lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
    cols = lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    return cols <= (rows + q_start)


def tree_mask_rows(
    num_nodes,  # scalar: committed prefix length (tree root lives at this slot)
    tree_bitmap: jnp.ndarray,  # bool [tree_size, tree_size], ancestor closure incl. self
    kv_len: int,  # static total kv slots
) -> jnp.ndarray:
    """Bool [tree_size, kv_len] mask for a full-tree (verify) pass.

    Node i sees: all committed slots (< num_nodes), plus tree slots j where
    tree_bitmap[i, j - num_nodes] (its ancestors and itself). Equivalent to the
    reference writing `growmap["mask"]` into the tail of its giant mask buffer
    (static engine :79) — but built per step by SHIFTING the 13–64 node bitmap to
    column offset num_nodes.
    """
    tree_size = tree_bitmap.shape[0]
    cols = lax.broadcasted_iota(jnp.int32, (tree_size, kv_len), 1)
    committed = cols < num_nodes
    tree_part = lax.dynamic_update_slice(
        jnp.zeros((tree_size, kv_len), jnp.bool_), tree_bitmap, (0, num_nodes))
    return committed | tree_part


def causal_mask_rows_batched(q_starts, q_len: int, kv_len: int) -> jnp.ndarray:
    """Bool [B, q_len, kv_len]: row (b, i) may attend slot j iff j <= q_starts[b]+i."""
    B = q_starts.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (B, q_len, kv_len), 1)
    cols = lax.broadcasted_iota(jnp.int32, (B, q_len, kv_len), 2)
    return cols <= (rows + q_starts[:, None, None])


def _tree_part_batched(rows_bitmap: jnp.ndarray, num_nodes, kv_len: int):
    """Place [R, T] bitmap rows at per-slot column offset num_nodes[b] -> [B, R, kv_len].

    Gather-free: sel[b, t, l] = (l == num_nodes[b] + t) is a one-hot placement
    matrix and the shift becomes an exact einsum — the batched analogue of the
    single-slot `dynamic_update_slice` shift (same rationale: no 2-D-index
    gathers on this runtime, module docstring)."""
    T = rows_bitmap.shape[1]
    tpos = lax.broadcasted_iota(jnp.int32, (num_nodes.shape[0], T, kv_len), 1)
    cols = lax.broadcasted_iota(jnp.int32, (num_nodes.shape[0], T, kv_len), 2)
    sel = (cols == num_nodes[:, None, None] + tpos).astype(jnp.float32)
    part = jnp.einsum("rt,btl->brl", rows_bitmap.astype(jnp.float32), sel,
                      preferred_element_type=jnp.float32)
    return part > 0.5


def tree_mask_rows_batched(num_nodes, tree_bitmap: jnp.ndarray,
                           kv_len: int) -> jnp.ndarray:
    """Bool [B, tree_size, kv_len]: per-slot verify masks (tree_mask_rows over a
    vector of committed lengths, with NO per-slot python unrolling — one traced
    computation regardless of B)."""
    B = num_nodes.shape[0]
    tree_size = tree_bitmap.shape[0]
    cols = lax.broadcasted_iota(jnp.int32, (B, tree_size, kv_len), 2)
    committed = cols < num_nodes[:, None, None]
    return committed | _tree_part_batched(tree_bitmap, num_nodes, kv_len)


def tree_level_mask_rows_batched(num_nodes, tree_bitmap: jnp.ndarray,
                                 row_start: int, n_rows: int,
                                 kv_len: int) -> jnp.ndarray:
    """Bool [B, n_rows, kv_len] draft-level masks for all slots at once."""
    B = num_nodes.shape[0]
    rows = lax.slice_in_dim(tree_bitmap, row_start, row_start + n_rows, axis=0)
    cols = lax.broadcasted_iota(jnp.int32, (B, n_rows, kv_len), 2)
    committed = cols < num_nodes[:, None, None]
    return committed | _tree_part_batched(rows, num_nodes, kv_len)


def tree_level_mask_rows(
    num_nodes,  # scalar committed prefix length
    tree_bitmap: jnp.ndarray,  # bool [tree_size, tree_size]
    row_start: int,  # static: first tree-node id of this level (levels are contiguous)
    n_rows: int,  # static: number of query rows (level size)
    kv_len: int,
) -> jnp.ndarray:
    """Bool [n_rows, kv_len] for one draft tree level (nodes row_start..row_start+n)."""
    rows = lax.slice_in_dim(tree_bitmap, row_start, row_start + n_rows, axis=0)
    cols = lax.broadcasted_iota(jnp.int32, (n_rows, kv_len), 1)
    committed = cols < num_nodes
    tree_part = lax.dynamic_update_slice(
        jnp.zeros((n_rows, kv_len), jnp.bool_), rows, (0, num_nodes))
    return committed | tree_part
