"""Batched (multi-slot) flash tree-attention kernel vs the dense oracle
(interpret mode on CPU), incl. per-slot kv limits, slot indirection (prefill
path), and the int8-KV in-kernel dequant variant. Mirrors test_flash_attention
for the continuous-batching path (reference memory discipline:
`umbrella/attn/cache.py:77-87`, here per-slot)."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.ops.pallas.tree_attention import attend_flash_batched


def _rand(shape, rng, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def _dense_oracle(q, kl, vl, mask, soft_cap=0.0):
    """q [B,S,H,D]; kl/vl [B,KVH,L,D] fp; mask [B,S,L]."""
    B, S, H, D = q.shape
    KVH = kl.shape[1]
    G = H // KVH
    qg = q.reshape(B, S, KVH, G, D)
    scores = np.einsum("bskgd,bkld->bkgsl", qg, kl) / np.sqrt(D)
    if soft_cap > 0.0:
        scores = soft_cap * np.tanh(scores / soft_cap)
    scores = np.where(mask[:, None, None, :, :], scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bkgsl,bkld->bskgd", probs, vl).reshape(B, S, H, D)


@pytest.mark.parametrize("B,S,H,KVH,D,L", [
    (4, 8, 8, 4, 64, 256),
    (2, 16, 4, 4, 128, 512),
])
def test_batched_flash_matches_dense(B, S, H, KVH, D, L):
    rng = np.random.default_rng(0)
    n_layers = 2
    layer = 1
    q = _rand((B, S, H, D), rng)
    kc = _rand((n_layers, B, KVH, L, D), rng)
    vc = _rand((n_layers, B, KVH, L, D), rng)
    limits = rng.integers(S, L, B).astype(np.int32)
    mask = rng.random((B, S, L)) > 0.4
    for b in range(B):
        mask[b, :, limits[b]:] = False
        mask[b, :, 0] = True

    out = attend_flash_batched(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(mask),
        jnp.asarray(limits), jnp.int32(layer), block_k=128, interpret=True)
    ref = _dense_oracle(q, kc[layer], vc[layer], mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_batched_flash_per_slot_limit_isolation():
    """Each slot's DMA clamp is independent: garbage beyond slot b's limit must
    not affect slot b even when another slot's limit extends further."""
    rng = np.random.default_rng(1)
    B, S, H, KVH, D, L = 2, 8, 4, 2, 64, 512
    q = _rand((B, S, H, D), rng)
    kc = _rand((1, B, KVH, L, D), rng)
    vc = _rand((1, B, KVH, L, D), rng)
    limits = np.asarray([128, 512], np.int32)
    mask = np.zeros((B, S, L), bool)
    mask[0, :, :128] = True
    mask[1, :, :512] = True

    out1 = attend_flash_batched(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(mask),
        jnp.asarray(limits), jnp.int32(0), block_k=128, interpret=True)
    kc2, vc2 = kc.copy(), vc.copy()
    kc2[0, 0, :, 128:] = 1e6  # garbage beyond slot 0's live window only
    vc2[0, 0, :, 128:] = 1e6
    out2 = attend_flash_batched(
        jnp.asarray(q), jnp.asarray(kc2), jnp.asarray(vc2), jnp.asarray(mask),
        jnp.asarray(limits), jnp.int32(0), block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               rtol=1e-5, atol=1e-5)


def test_batched_flash_slot_indirection():
    """slots=[s] reads cache row s (the one-slot prefill path)."""
    rng = np.random.default_rng(2)
    Bc, S, H, KVH, D, L = 4, 8, 4, 2, 64, 256
    q = _rand((1, S, H, D), rng)
    kc = _rand((1, Bc, KVH, L, D), rng)
    vc = _rand((1, Bc, KVH, L, D), rng)
    mask = np.tril(np.ones((S, L), bool))[None]
    for slot in (0, 2, 3):
        out = attend_flash_batched(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(mask),
            jnp.asarray([S], jnp.int32), jnp.int32(0),
            slots=jnp.asarray([slot], jnp.int32), block_k=128, interpret=True)
        ref = _dense_oracle(q, kc[0, slot][None], vc[0, slot][None], mask)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_batched_flash_int8_kv():
    """int8-KV variant dequantizes per-slot-scaled blocks in VMEM; matches the
    dense oracle on the dequantized values."""
    rng = np.random.default_rng(3)
    B, S, H, KVH, D, L = 2, 8, 4, 2, 64, 256
    n_layers, layer = 2, 0
    q = _rand((B, S, H, D), rng)
    kq = rng.integers(-127, 128, (n_layers, B, KVH, L, D)).astype(np.int8)
    vq = rng.integers(-127, 128, (n_layers, B, KVH, L, D)).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (n_layers, B, KVH, L)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (n_layers, B, KVH, L)).astype(np.float32)
    limits = np.asarray([100, 256], np.int32)
    mask = rng.random((B, S, L)) > 0.3
    for b in range(B):
        mask[b, :, limits[b]:] = False
        mask[b, :, 0] = True

    out = attend_flash_batched(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq), jnp.asarray(mask),
        jnp.asarray(limits), jnp.int32(layer), block_k=128, interpret=True,
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))
    ref = _dense_oracle(q, (kq[layer].astype(np.float32) * ks[layer][..., None]),
                        (vq[layer].astype(np.float32) * vs[layer][..., None]), mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)

    # int8 x soft-cap composition (batched gemma2 with int8 KV): the cap must
    # apply to the DEQUANTIZED scores (after the per-column k-scale fold)
    cap = 30.0
    out_sc = attend_flash_batched(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq), jnp.asarray(mask),
        jnp.asarray(limits), jnp.int32(layer), block_k=128, interpret=True,
        soft_cap=cap, k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))
    ref_sc = _dense_oracle(
        q, (kq[layer].astype(np.float32) * ks[layer][..., None]),
        (vq[layer].astype(np.float32) * vs[layer][..., None]), mask,
        soft_cap=cap)
    np.testing.assert_allclose(np.asarray(out_sc), ref_sc, rtol=2e-3, atol=2e-3)
