"""Unit tests for core math ops vs independent (numpy/torch) references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.ops.masks import causal_mask_rows, tree_level_mask_rows, tree_mask_rows
from umbrella_tpu.ops.norms import gemma_rms_norm, rms_norm
from umbrella_tpu.ops.rope import apply_rope, precompute_rope_cache
from umbrella_tpu.ops import sampling
from umbrella_tpu.ops.attention import attend_dense


def test_rms_norm_matches_hf():
    import torch

    x = np.random.randn(5, 32).astype(np.float32)
    w = np.random.randn(32).astype(np.float32)
    eps = 1e-5
    # HF LlamaRMSNorm semantics
    xt = torch.tensor(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    ref = (xt * torch.rsqrt(var + eps)) * torch.tensor(w)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_gemma_rms_norm_uses_one_plus_weight():
    x = np.random.randn(3, 16).astype(np.float32)
    w = np.zeros(16, dtype=np.float32)
    got = gemma_rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6)
    plain = rms_norm(jnp.asarray(x), jnp.asarray(np.ones(16, np.float32)), 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain), rtol=1e-6)


def test_rope_matches_torch_reference():
    cfg = ModelConfig(hidden_size=64, num_attention_heads=4, rope_theta=10000.0)
    from umbrella_tpu.ops.rope import rope_params

    rp = rope_params(cfg)
    S, H, D = 6, 4, 16
    q = np.random.randn(S, H, D).astype(np.float32)
    k = np.random.randn(S, 2, D).astype(np.float32)
    pos = np.array([0, 1, 2, 5, 7, 9])

    # numpy reference (HF apply_rotary_pos_emb with unsqueeze_dim=1 on [S,H,D])
    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    freqs = np.outer(pos, inv)
    emb = np.concatenate([freqs, freqs], -1)
    rc, rs = np.cos(emb)[:, None, :], np.sin(emb)[:, None, :]

    def rot(x):
        return np.concatenate([-x[..., D // 2:], x[..., : D // 2]], -1)

    ref_q = q * rc + rot(q) * rs
    qj, kj = apply_rope(jnp.asarray(q), jnp.asarray(k), rp["rope_inv_freq"],
                        rp["rope_scale"], jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(qj), ref_q, rtol=1e-4, atol=1e-4)


def test_llama3_rope_scaling_changes_low_freqs():
    cfg = ModelConfig(
        hidden_size=64, num_attention_heads=4, rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 8192,
        },
    )
    from umbrella_tpu.ops.rope import compute_inv_freq

    scaled, att = compute_inv_freq(cfg)
    base, _ = compute_inv_freq(ModelConfig(hidden_size=64, num_attention_heads=4, rope_theta=500000.0))
    assert att == 1.0
    assert np.allclose(scaled[0], base[0])  # high freq untouched
    assert scaled[-1] < base[-1]  # low freq divided


def test_causal_mask_rows():
    m = np.asarray(causal_mask_rows(3, 4, 10))
    for i in range(4):
        for j in range(10):
            assert m[i, j] == (j <= 3 + i)


def test_tree_mask_rows_matches_reference_window_semantics():
    # 5-node tree: 0 -> {1, 2}, 1 -> {3}, 2 -> {4}
    bitmap = np.array([
        [1, 0, 0, 0, 0],
        [1, 1, 0, 0, 0],
        [1, 0, 1, 0, 0],
        [1, 1, 0, 1, 0],
        [1, 0, 1, 0, 1],
    ], dtype=bool)
    num_nodes = 7
    m = np.asarray(tree_mask_rows(num_nodes, jnp.asarray(bitmap), 16))
    assert m[:, :7].all()  # committed prefix fully visible
    np.testing.assert_array_equal(m[:, 7:12], bitmap)
    assert not m[:, 12:].any()

    lvl = np.asarray(tree_level_mask_rows(num_nodes, jnp.asarray(bitmap), 3, 2, 16))
    np.testing.assert_array_equal(lvl, m[[3, 4]])


def test_attend_dense_gqa_matches_naive():
    S, H, KVH, D, L = 4, 4, 2, 8, 12
    rng = np.random.default_rng(0)
    q = rng.standard_normal((S, H, D), dtype=np.float32)
    k = rng.standard_normal((KVH, L, D), dtype=np.float32)
    v = rng.standard_normal((KVH, L, D), dtype=np.float32)
    mask = rng.random((S, L)) > 0.3
    mask[:, 0] = True  # every row attends something
    out = np.asarray(attend_dense(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))

    # naive per-head reference
    ref = np.zeros_like(out)
    for h in range(H):
        kvh = h // (H // KVH)
        s = (q[:, h] @ k[kvh].T) / np.sqrt(D)
        s = np.where(mask, s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref[:, h] = p @ v[kvh]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_top_p_renorm():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    out = np.asarray(sampling.top_p_renorm_probs(probs, 0.7))
    # cumsum-exclusive: 0.0<0.7 keep, 0.5<0.7 keep, 0.8>=0.7 drop, drop
    np.testing.assert_allclose(out[0], [0.5 / 0.8, 0.3 / 0.8, 0, 0], rtol=1e-5)


def test_top_p_renorm_after_topk_matches_full_sort():
    """With <=k nonzero probs (post top-k filter), the top-k based renorm must
    equal the full-vocab-sort reference for any top_p."""
    rng = np.random.default_rng(0)
    V, k = 2048, 16
    logits = jnp.asarray(rng.standard_normal((5, V)).astype(np.float32))
    filt = sampling.apply_topk_mask(logits, k)
    probs = np.asarray(jax.nn.softmax(filt, axis=-1))
    for top_p in (0.3, 0.7, 0.9, 0.999):
        a = np.asarray(sampling.top_p_renorm_after_topk(jnp.asarray(probs), top_p, k))
        b = np.asarray(sampling.top_p_renorm_probs(jnp.asarray(probs), top_p))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0, 0.5]])
    prev = jnp.asarray([0, 1, 0, 7])  # token 7 is padding beyond valid_len
    out = np.asarray(sampling.apply_repetition_penalty(logits, prev, 3, 2.0))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0, 0.5], rtol=1e-5)


def test_find_first_in_set():
    toks = jnp.asarray([5, 9, 2, 7, 2])
    eos = jnp.asarray([2, 7])
    assert int(sampling.find_first_in_set(toks, eos, 5)) == 2
    assert int(sampling.find_first_in_set(toks, eos, 2)) == -1
    assert int(sampling.find_first_in_set(toks, eos, 3)) == 2


def test_sample_top_k_top_p_respects_filters():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.randn(8, 64).astype(np.float32)) * 3
    toks = sampling.sample_top_k_top_p(key, logits, temperature=0.7, topk=4, topp=0.9)
    top4 = np.asarray(jax.lax.top_k(logits, 4)[1])
    for i, t in enumerate(np.asarray(toks)):
        assert t in top4[i]


def test_embed_lookup_matches_gather():
    from umbrella_tpu.ops.select import embed_lookup, embed_lookup_onehot, take_vec

    rng = np.random.default_rng(7)
    emb = jnp.asarray(rng.standard_normal((997, 64)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 997, 13), jnp.int32)
    ref = np.asarray(emb)[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(embed_lookup(emb, ids)), ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(embed_lookup_onehot(emb, ids)), ref, rtol=1e-6)


def test_take_vec_and_scalar():
    from umbrella_tpu.ops.select import take_scalar, take_vec

    v = jnp.asarray([5, 9, 2, 7], jnp.int32)
    np.testing.assert_array_equal(np.asarray(take_vec(v, jnp.asarray([3, 0, 0]))), [7, 5, 5])
    assert int(take_scalar(v, jnp.int32(2))) == 2


def test_embed_gather_kernel_interpret():
    """Pallas row-DMA embedding gather == numpy fancy-index (interpret mode)."""
    from umbrella_tpu.ops.pallas.embed_gather import embed_gather

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((500, 128)).astype(np.float32))
    for S in (1, 7, 37, 128):
        ids = jnp.asarray(rng.integers(0, 500, S), jnp.int32)
        out = np.asarray(embed_gather(emb, ids, interpret=True))
        np.testing.assert_allclose(out, np.asarray(emb)[np.asarray(ids)])
