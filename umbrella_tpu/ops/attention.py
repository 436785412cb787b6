"""Masked attention over a linear KV cache.

TPU-native replacement for `flashinfer.single_prefill_with_kv_cache(custom_mask=...)`
(reference: `umbrella/attn/cache.py:77-85`). Two paths:

- `attend_dense`: jnp einsum attention with an explicit bool mask — the reference
  semantics, XLA-fused, used for small S (tree decode) and as the oracle in tests.
- `attend_flash`: Pallas flash-attention kernel (ops/pallas/tree_attention.py) that
  streams the KV cache through VMEM and never materializes [S, L] score tiles in HBM.

Shapes (batch size 1 engine, like the reference):
  q:        [S, H, D]
  k_cache:  [KVH, L, D]   (linear slot-indexed cache, head-major)
  v_cache:  [KVH, L, D]
  mask:     [S, L] bool   (True = may attend)
Returns [S, H, D].
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax


# "auto": flash kernel on TPU, dense einsum elsewhere; "dense"/"flash" force a path.
ATTN_BACKEND = "auto"


def _flash_available() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def attend(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,  # [KVH, L, D], or the FULL [n, KVH, L, D] cache + layer_idx
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,
    kv_limit=None,  # scalar upper bound on live kv slots (enables DMA clamping)
    scale: Optional[float] = None,
    logits_soft_cap: float = 0.0,
    k_scale: Optional[jnp.ndarray] = None,  # [(n,) KVH, L] — int8 KV cache mode
    v_scale: Optional[jnp.ndarray] = None,
    layer_idx=None,  # with 4-D caches: the flash kernel indexes the layer itself,
                     # avoiding an XLA dynamic-slice copy of the layer's KV per call
) -> jnp.ndarray:
    """Backend-dispatching attention; semantics of attend_dense."""
    from jax import lax

    layered = k_cache.ndim == 4
    L = k_cache.shape[-2]
    use_flash = ATTN_BACKEND == "flash" or (ATTN_BACKEND == "auto" and _flash_available())
    if use_flash and kv_limit is not None and L % 256 == 0:
        from .pallas.tree_attention import attend_flash

        S, H, D = q.shape
        groups = H // k_cache.shape[-3]
        block_k = 512 if S * groups <= 512 else 256
        return attend_flash(q, k_cache, v_cache, mask, kv_limit, scale=scale,
                            soft_cap=logits_soft_cap, block_k=block_k,
                            k_scale=k_scale, v_scale=v_scale,
                            layer_idx=layer_idx if layered else None)
    if layered:
        k_cache = lax.dynamic_index_in_dim(k_cache, layer_idx, axis=0, keepdims=False)
        v_cache = lax.dynamic_index_in_dim(v_cache, layer_idx, axis=0, keepdims=False)
        if k_scale is not None:
            k_scale = lax.dynamic_index_in_dim(k_scale, layer_idx, axis=0, keepdims=False)
            v_scale = lax.dynamic_index_in_dim(v_scale, layer_idx, axis=0, keepdims=False)
    if k_scale is not None:
        k_cache = (k_cache.astype(jnp.float32) * k_scale[..., None]).astype(q.dtype)
        v_cache = (v_cache.astype(jnp.float32) * v_scale[..., None]).astype(q.dtype)
    return attend_dense(q, k_cache, v_cache, mask, scale=scale,
                        logits_soft_cap=logits_soft_cap)


def attend_batched(
    q: jnp.ndarray,          # [B, S, H, D]
    k_cache: jnp.ndarray,    # [n_layers, Bc, KVH, L, D] full batched cache
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,       # [B, S, L] bool
    kv_limits,               # [B] — per-slot exclusive bound on live kv slots
    layer_idx,               # scalar layer to attend in
    slots=None,              # [B] cache-slot indirection (prefill); None => 0..B-1
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [n, Bc, KVH, L] — int8 KV mode
    v_scale: Optional[jnp.ndarray] = None,
    logits_soft_cap: float = 0.0,  # Gemma2 pre-softmax tanh cap
) -> jnp.ndarray:
    """Multi-slot attention over a batched layered KV cache (continuous-batching
    engine). Flash path: per-slot kv_limit DMA clamp + in-kernel layer indexing
    (no [B, KVH, L, D] slice copy per layer); dense path: the fallback/oracle."""
    from jax import lax

    B, S, H, D = q.shape
    L = k_cache.shape[-2]
    use_flash = ATTN_BACKEND == "flash" or (ATTN_BACKEND == "auto" and _flash_available())
    if use_flash and L % 256 == 0:
        from .pallas.tree_attention import attend_flash_batched

        groups = H // k_cache.shape[-3]
        block_k = 512 if S * groups <= 512 else 256
        return attend_flash_batched(
            q, k_cache, v_cache, mask, kv_limits, layer_idx, slots=slots,
            scale=scale, soft_cap=logits_soft_cap, block_k=block_k,
            k_scale=k_scale, v_scale=v_scale)

    kl = lax.dynamic_index_in_dim(k_cache, layer_idx, axis=0, keepdims=False)
    vl = lax.dynamic_index_in_dim(v_cache, layer_idx, axis=0, keepdims=False)
    ksl = vsl = None
    if k_scale is not None:
        ksl = lax.dynamic_index_in_dim(k_scale, layer_idx, axis=0, keepdims=False)
        vsl = lax.dynamic_index_in_dim(v_scale, layer_idx, axis=0, keepdims=False)
    if slots is not None:
        # per-slot row gather, unrolled over the static batch (prefill path)
        def take(buf):
            if buf is None:
                return None
            return jnp.concatenate([
                lax.dynamic_slice(buf, (slots[b],) + (0,) * (buf.ndim - 1),
                                  (1,) + buf.shape[1:]) for b in range(B)])
        kl, vl, ksl, vsl = take(kl), take(vl), take(ksl), take(vsl)
    if ksl is not None:
        kl = (kl.astype(jnp.float32) * ksl[..., None]).astype(q.dtype)
        vl = (vl.astype(jnp.float32) * vsl[..., None]).astype(q.dtype)

    KVH = kl.shape[1]
    groups = H // KVH
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    qg = q.reshape(B, S, KVH, groups, D)
    scores = jnp.einsum("bskgd,bkld->bkgsl", qg, kl,
                        preferred_element_type=jnp.float32) * scale
    if logits_soft_cap and logits_soft_cap > 0.0:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
    scores = jnp.where(mask[:, None, None, :, :], scores,
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(vl.dtype)
    out = jnp.einsum("bkgsl,bkld->bskgd", probs, vl)
    return out.reshape(B, S, H, D)


def attend_dense(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,
    scale: Optional[float] = None,
    logits_soft_cap: float = 0.0,
) -> jnp.ndarray:
    S, H, D = q.shape
    KVH, L, _ = k_cache.shape
    groups = H // KVH
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    qg = q.reshape(S, KVH, groups, D)
    # scores [KVH, groups, S, L]
    scores = jnp.einsum("skgd,kld->kgsl", qg, k_cache, preferred_element_type=jnp.float32)
    scores = scores * scale
    if logits_soft_cap and logits_soft_cap > 0.0:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
    scores = jnp.where(mask[None, None, :, :], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("kgsl,kld->skgd", probs, v_cache)
    return out.reshape(S, H, D)
