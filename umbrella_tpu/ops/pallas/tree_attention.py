"""Flash attention over the linear KV cache with arbitrary (tree/causal) masks.

TPU-native replacement for `flashinfer.single_prefill_with_kv_cache(custom_mask=...)`
(reference `umbrella/attn/cache.py:77-85`). Design:

- Online-softmax flash loop over KV blocks; scores never hit HBM.
- GQA-native: grid dim 0 is the KV head; the q block carries that head's `group`
  query rows, so K/V blocks stream through VMEM exactly once per kv head.
- The live-window bound `kv_limit` (committed prefix + tree) is a scalar-prefetch
  argument: KV block index maps CLAMP to the last needed block, and Mosaic's
  pipeline skips re-fetch when the block index repeats — so decode reads only
  O(num_nodes + tree_size) KV bytes, not O(max_length). The reference's eager mask
  slicing (`cache.py:82`: custom_mask[:, :kv_offset]) achieved this dynamically;
  here the shapes stay static and the DMA clamp does it.
- The boolean mask rows are streamed per block ([S, bk] slices of the engine's
  computed mask); fine-grained semantics (tree ancestry) live entirely in the mask.

Accepts optional `logits_soft_cap` (Gemma2) applied pre-softmax.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _scalar(nb, i=0):
    """Scalar-prefetch element: an SMEM ref in compiled mode, array in interpret."""
    try:
        return nb[i]
    except (TypeError, IndexError):
        return nb


def _flash_kernel(nb_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
                  m_ref, l_ref, acc_ref, *, scale: float, soft_cap: float,
                  groups: int, bk: int, layered: bool = False):
    j = pl.program_id(1)
    num_needed = _scalar(nb_ref)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < num_needed)
    def _():
        q = q_ref[0]  # [SG, D]
        k = k_ref[0][0] if layered else k_ref[0]  # [bk, D]
        v = v_ref[0][0] if layered else v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        if soft_cap > 0.0:
            s = soft_cap * jnp.tanh(s / soft_cap)
        mask = mask_ref[:]  # [S, bk] bool
        S = mask.shape[0]
        mask_sg = jnp.broadcast_to(mask[:, None, :], (S, groups, bk)).reshape(S * groups, bk)
        s = jnp.where(mask_sg, s, NEG_INF)

        m_prev = m_ref[:]  # [SG, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [SG, bk]
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(out_ref.dtype)


def _flash_kernel_q(nb_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, out_ref,
                    m_ref, l_ref, acc_ref, *, scale: float, soft_cap: float,
                    groups: int, bk: int, layered: bool = False):
    """int8-KV variant. Scales are [bk] LANE vectors (cache layout [..., L] with
    no trailing 1 — see models/kv_cache.KVCache) applied in score space:
      s_true[i, j] = (q_i . k_int_j) * ks[j],  out = sum_j p_j * vs[j] * v_int_j
    — mathematically identical to dequantizing the (bk, D) blocks, lane-aligned
    (free broadcasts), and the HBM traffic stays int8."""
    j = pl.program_id(1)
    # scale blocks carry ALL kv heads ([KVH, bk] — a (1, bk) block would
    # violate the sublane-divisibility rule); pick this head's row with an
    # iota mask + sublane reduce (KVH rows, trivial)
    h = pl.program_id(0)
    num_needed = _scalar(nb_ref)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < num_needed)
    def _():
        q = q_ref[0]  # [SG, D]
        kr = k_ref[0][0] if layered else k_ref[0]
        vr = v_ref[0][0] if layered else v_ref[0]

        def pick(ref):
            s2 = (ref[0] if layered else ref[:]).astype(jnp.float32)  # [KVH, bk]
            rows = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0)
            return jnp.sum(jnp.where(rows == h, s2, 0.0), axis=0)  # [bk]

        ksr = pick(ks_ref)
        vsr = pick(vs_ref)
        k = kr.astype(q.dtype)  # raw int8 values; scale folds into the scores
        v = vr.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale * ksr[None, :]
        if soft_cap > 0.0:
            s = soft_cap * jnp.tanh(s / soft_cap)
        mask = mask_ref[:]  # [S, bk] bool
        S = mask.shape[0]
        mask_sg = jnp.broadcast_to(mask[:, None, :], (S, groups, bk)).reshape(S * groups, bk)
        s = jnp.where(mask_sg, s, NEG_INF)

        m_prev = m_ref[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            (p * vsr[None, :]).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(out_ref.dtype)


def _flash_kernel_b(nb_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
                    m_ref, l_ref, acc_ref, *, scale: float, soft_cap: float,
                    groups: int, bk: int, batch: int):
    """Batched (multi-slot) variant: grid (B, KVH, nK); each slot b has its own
    live-window bound nb_ref[1 + batch + b] and cache row nb_ref[1 + b]."""
    b = pl.program_id(0)
    j = pl.program_id(2)
    num_needed = nb_ref[1 + batch + b]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < num_needed)
    def _():
        q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])  # [SG, D]
        k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])  # [bk, D]
        v = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        if soft_cap > 0.0:
            s = soft_cap * jnp.tanh(s / soft_cap)
        mask = mask_ref[...].reshape(mask_ref.shape[-2], mask_ref.shape[-1])  # [S, bk]
        S = mask.shape[0]
        mask_sg = jnp.broadcast_to(mask[:, None, :], (S, groups, bk)).reshape(S * groups, bk)
        s = jnp.where(mask_sg, s, NEG_INF)

        m_prev = m_ref[:]  # [SG, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)) \
            .astype(out_ref.dtype).reshape(out_ref.shape)


def _flash_kernel_bq(nb_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, mask_ref, out_ref,
                     m_ref, l_ref, acc_ref, *, scale: float, soft_cap: float,
                     groups: int, bk: int, batch: int):
    """Batched int8-KV variant: [bk] lane-vector scales folded into score space
    (see _flash_kernel_q) — HBM traffic stays int8, no (bk, D) dequant pass."""
    b = pl.program_id(0)
    # scale blocks carry ALL kv heads ([KVH, bk]); this head's row is selected
    # in-kernel with an iota mask + sublane reduce
    h = pl.program_id(1)
    j = pl.program_id(2)
    num_needed = nb_ref[1 + batch + b]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < num_needed)
    def _():
        q = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
        kr = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
        vr = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])

        def pick(ref):
            s2 = ref[...].reshape(ref.shape[-2], ref.shape[-1]).astype(jnp.float32)
            rows = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0)
            return jnp.sum(jnp.where(rows == h, s2, 0.0), axis=0)  # [bk]

        ksr = pick(ks_ref)
        vsr = pick(vs_ref)
        k = kr.astype(q.dtype)  # raw int8 values; scale folds into the scores
        v = vr.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale * ksr[None, :]
        if soft_cap > 0.0:
            s = soft_cap * jnp.tanh(s / soft_cap)
        mask = mask_ref[...].reshape(mask_ref.shape[-2], mask_ref.shape[-1])
        S = mask.shape[0]
        mask_sg = jnp.broadcast_to(mask[:, None, :], (S, groups, bk)).reshape(S * groups, bk)
        s = jnp.where(mask_sg, s, NEG_INF)

        m_prev = m_ref[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            (p * vsr[None, :]).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        out_ref[...] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)) \
            .astype(out_ref.dtype).reshape(out_ref.shape)


@functools.partial(
    jax.jit, static_argnames=("scale", "soft_cap", "block_k", "interpret"))
def attend_flash_batched(
    q: jnp.ndarray,  # [B, S, H, D]
    k_cache: jnp.ndarray,  # [n_layers, Bc, KVH, L, D] (Bc >= B cache slots)
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,  # [B, S, L] bool
    kv_limits,  # [B] int32 — per-slot exclusive bound on live kv slots
    layer_idx,  # scalar — layer to attend in
    slots=None,  # [B] int32 cache-slot per grid row; None => identity (0..B-1)
    scale: float | None = None,
    soft_cap: float = 0.0,
    block_k: int = 512,
    interpret: bool = False,
    k_scale: jnp.ndarray | None = None,  # [n_layers, Bc, KVH, L] — int8 KV mode
    v_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-slot flash tree-attention over a batched layered KV cache.

    The per-slot `kv_limits` DMA clamp is the batched engine's analogue of the
    reference's per-request mask slicing (`cache.py:82`): each slot reads only
    O(its own live window) KV bytes, so the batched step stays ~flat in
    max_length. The kernel also indexes the layer itself (scalar prefetch),
    avoiding the XLA [B, KVH, L, D] per-layer slice copy of the dense path.
    `slots` indirection serves the one-slot prefill path ([1, S, H, D] q against
    an arbitrary cache row)."""
    B, S, H, D = q.shape
    n_layers_, Bc, KVH, L, _ = k_cache.shape
    groups = H // KVH
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    bk = min(block_k, L)
    assert L % bk == 0, (L, bk)
    nK = L // bk

    SG = S * groups
    qg = q.reshape(B, S, KVH, groups, D).transpose(0, 2, 1, 3, 4).reshape(B, KVH, SG, D)

    # scalar prefetch: [0]=layer, [1:1+B]=cache slot per grid row,
    # [1+B:1+2B]=live kv blocks per slot
    num_needed = jnp.minimum((kv_limits + bk - 1) // bk, nK).astype(jnp.int32)
    slot_arr = (jax.lax.iota(jnp.int32, B) if slots is None
                else jnp.asarray(slots, jnp.int32))
    scalars = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1), slot_arr, num_needed])

    def _nb(nb, b):
        return _scalar(nb, 1 + B + b)

    q_spec = pl.BlockSpec((1, 1, SG, D), lambda b, h, j, nb: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (1, 1, 1, bk, D),
        lambda b, h, j, nb: (_scalar(nb, 0), _scalar(nb, 1 + b), h,
                             jnp.minimum(j, _nb(nb, b) - 1), 0),
        memory_space=pltpu.VMEM)
    # KVH < 8 (e.g. gemma-2-2b KVH=4, or TP shards of an 8-KVH model) keeps
    # the second-to-minor block dim below the fp32 sublane tile; A/B'd on real
    # v5e (KVH=4 int8, 2026-08): Mosaic pads the sub-tile block and the kernel
    # matches the dense oracle to normal bf16-accumulation tolerance (~6e-3).
    sc_spec = pl.BlockSpec(
        (1, 1, KVH, bk),
        lambda b, h, j, nb: (_scalar(nb, 0), _scalar(nb, 1 + b), 0,
                             jnp.minimum(j, _nb(nb, b) - 1)),
        memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (1, S, bk), lambda b, h, j, nb: (b, 0, jnp.minimum(j, _nb(nb, b) - 1)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, SG, D), lambda b, h, j, nb: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((SG, 1), jnp.float32),
        pltpu.VMEM((SG, 1), jnp.float32),
        pltpu.VMEM((SG, D), jnp.float32),
    ]
    quantized = k_scale is not None
    kern = functools.partial(
        (_flash_kernel_bq if quantized else _flash_kernel_b),
        scale=float(scale), soft_cap=float(soft_cap), groups=groups, bk=bk,
        batch=B)
    if quantized:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, KVH, nK),
            in_specs=[q_spec, kv_spec, kv_spec, sc_spec, sc_spec, mask_spec],
            out_specs=out_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, KVH, SG, D), q.dtype),
            interpret=interpret,
        )(scalars, qg, k_cache, v_cache, k_scale.astype(jnp.float32),
          v_scale.astype(jnp.float32), mask)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, KVH, nK),
            in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
            out_specs=out_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, KVH, SG, D), q.dtype),
            interpret=interpret,
        )(scalars, qg, k_cache, v_cache, mask)

    return out.reshape(B, KVH, S, groups, D).transpose(0, 2, 1, 3, 4) \
        .reshape(B, S, H, D)


@functools.partial(
    jax.jit, static_argnames=("scale", "soft_cap", "block_k", "interpret"))
def attend_flash(
    q: jnp.ndarray,  # [S, H, D]
    k_cache: jnp.ndarray,  # [KVH, L, D] head-major, or [n_layers, KVH, L, D] + layer_idx
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,  # [S, L] bool
    kv_limit,  # scalar — exclusive upper bound on live kv slots
    scale: float | None = None,
    soft_cap: float = 0.0,
    block_k: int = 512,
    interpret: bool = False,
    k_scale: jnp.ndarray | None = None,  # [(n,) KVH, L] — int8 KV mode
    v_scale: jnp.ndarray | None = None,
    layer_idx=None,  # scalar — index into 4-D caches (avoids an XLA slice copy)
) -> jnp.ndarray:
    S, H, D = q.shape
    layered = k_cache.ndim == 4
    if layered:
        assert layer_idx is not None
        _n_layers, KVH, L, _ = k_cache.shape
    else:
        KVH, L, _ = k_cache.shape
    groups = H // KVH
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    bk = min(block_k, L)
    assert L % bk == 0, (L, bk)
    nK = L // bk

    SG = S * groups
    # q rows grouped by kv head: [KVH, S*groups, D]
    qg = q.reshape(S, KVH, groups, D).transpose(1, 0, 2, 3).reshape(KVH, SG, D)

    # scalar prefetch: [0] = number of live kv blocks, [1] = layer index
    num_needed = jnp.minimum((kv_limit + bk - 1) // bk, nK)
    scalars = jnp.stack([num_needed.astype(jnp.int32),
                         (jnp.int32(0) if layer_idx is None
                          else jnp.asarray(layer_idx, jnp.int32))])

    q_spec = pl.BlockSpec((1, SG, D), lambda h, j, nb: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    if layered:
        kv_spec = pl.BlockSpec(
            (1, 1, bk, D),
            lambda h, j, nb: (_scalar(nb, 1), h, jnp.minimum(j, _scalar(nb) - 1), 0),
            memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec(
            (1, KVH, bk),
            lambda h, j, nb: (_scalar(nb, 1), 0, jnp.minimum(j, _scalar(nb) - 1)),
            memory_space=pltpu.VMEM)
    else:
        kv_spec = pl.BlockSpec(
            (1, bk, D),
            lambda h, j, nb: (h, jnp.minimum(j, _scalar(nb) - 1), 0),
            memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec(
            (KVH, bk),
            lambda h, j, nb: (0, jnp.minimum(j, _scalar(nb) - 1)),
            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((S, bk), lambda h, j, nb: (0, jnp.minimum(j, _scalar(nb) - 1)),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, SG, D), lambda h, j, nb: (h, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((SG, 1), jnp.float32),
        pltpu.VMEM((SG, 1), jnp.float32),
        pltpu.VMEM((SG, D), jnp.float32),
    ]
    quantized = k_scale is not None
    kern = functools.partial(
        (_flash_kernel_q if quantized else _flash_kernel),
        scale=float(scale), soft_cap=float(soft_cap), groups=groups, bk=bk,
        layered=layered)
    if quantized:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(KVH, nK),
            in_specs=[q_spec, kv_spec, kv_spec, sc_spec, sc_spec, mask_spec],
            out_specs=out_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((KVH, SG, D), q.dtype),
            interpret=interpret,
        )(scalars, qg, k_cache, v_cache, k_scale.astype(jnp.float32),
          v_scale.astype(jnp.float32), mask)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(KVH, nK),
            in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
            out_specs=out_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((KVH, SG, D), q.dtype),
            interpret=interpret,
        )(scalars, qg, k_cache, v_cache, mask)

    return out.reshape(KVH, S, groups, D).transpose(1, 0, 2, 3).reshape(S, H, D)
