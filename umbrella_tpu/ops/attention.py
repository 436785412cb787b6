"""Masked attention over a linear KV cache.

TPU-native replacement for `flashinfer.single_prefill_with_kv_cache(custom_mask=...)`
(reference: `umbrella/attn/cache.py:77-85`). Two paths:

- `attend_dense`: jnp einsum attention with an explicit bool mask — the reference
  semantics, XLA-fused, used for small S (tree decode) and as the oracle in tests.
- `attend_flash`: Pallas flash-attention kernel (ops/pallas/tree_attention.py) that
  streams the KV cache through VMEM and never materializes [S, L] score tiles in HBM.

Shapes (batch size 1 engine, like the reference):
  q:        [S, H, D]
  k_cache:  [L, KVH, D]   (linear slot-indexed cache)
  v_cache:  [L, KVH, D]
  mask:     [S, L] bool   (True = may attend)
Returns [S, H, D].
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax


def attend_dense(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,
    scale: Optional[float] = None,
    logits_soft_cap: float = 0.0,
) -> jnp.ndarray:
    S, H, D = q.shape
    L, KVH, _ = k_cache.shape
    groups = H // KVH
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    qg = q.reshape(S, KVH, groups, D)
    # scores [KVH, groups, S, L]
    scores = jnp.einsum("skgd,lkd->kgsl", qg, k_cache, preferred_element_type=jnp.float32)
    scores = scores * scale
    if logits_soft_cap and logits_soft_cap > 0.0:
        scores = logits_soft_cap * jnp.tanh(scores / logits_soft_cap)
    scores = jnp.where(mask[None, None, :, :], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("kgsl,lkd->skgd", probs, v_cache)
    return out.reshape(S, H, D)
