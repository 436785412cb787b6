"""Int4F (factorized-scale W4, int8-MXU draft path) — format + kernel + engine.

The format exists to halve the draft build phase's MXU floor (see
quantization/int4f.py); correctness-wise the engine anchor is unchanged:
greedy spec decode with an Int4F draft must stay token-identical with the
TARGET's AR decode, because draft numerics can never leak into outputs.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import random_awq_runtime, random_runtime
from umbrella_tpu.ops.pallas.w4a8f import (w4a8f_matmul, w4a8f_matmul_xla)
from umbrella_tpu.quantization.awq import quantize_pack_device
from umbrella_tpu.quantization.int4f import (
    Int4FTensor, dequantize_int4f, quantize_int4f, quantize_params_int4f,
    quantize_runtime_int4f)
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.static_engine import StaticEngine

from test_static_engine import MAX_LEN, _greedy_ar_decode, _make_engine


def test_quantize_dense_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    q = quantize_int4f(w, group_size=128)
    assert q.w8.shape == (128, 128) and q.a.shape == (256,) and q.b.shape == (128,)
    deq = np.asarray(dequantize_int4f(q, dtype=jnp.float32))
    # The ALS-refined fit (int4f._requantize refine sweeps) deliberately trades
    # the no-clip half-step worst-case for lower TOTAL error: a column's scale
    # can shrink so its gaussian tail clips by a few (shrunk) steps. Contract:
    # (a) elementwise error bounded by a generous step multiple, and (b) the
    # refined fit beats the one-shot exact-max fit on total squared error.
    step = np.asarray(q.a)[:, None] * np.asarray(q.b)[None, :]
    assert np.all(np.abs(deq - w) <= 8.0 * step + 1e-6)
    rel = np.sum((deq - w) ** 2) / np.sum(w ** 2)
    from umbrella_tpu.quantization.int4f import _requantize

    q0 = _requantize(jnp.asarray(w) + 0, q.a, refine=0)
    deq0 = np.asarray(dequantize_int4f(q0, dtype=jnp.float32))
    rel0 = np.sum((deq0 - w) ** 2) / np.sum(w ** 2)
    assert rel < rel0, (rel, rel0)


def test_quantize_from_awq_matches_dequant_source():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 256)).astype(np.float32) * 0.03
    awq = quantize_pack_device(jnp.asarray(w), group_size=128, dtype=jnp.float32)
    from umbrella_tpu.quantization.awq import dequantize

    w_awq = np.asarray(dequantize(awq, dtype=jnp.float32))
    q = quantize_int4f(awq)
    deq = np.asarray(dequantize_int4f(q, dtype=jnp.float32))
    # Int4F requantizes the AWQ-dequantized values; with ALS refinement the
    # elementwise error is bounded by a generous step multiple (clipped tails,
    # see dense roundtrip test), and the total squared error tracks the
    # SOURCE, not the original w
    step = np.asarray(q.a)[:, None] * np.asarray(q.b)[None, :]
    assert np.all(np.abs(deq - w_awq) <= 8.0 * step + 1e-6)
    rel = np.sum((deq - w_awq) ** 2) / np.sum(w_awq ** 2)
    assert rel < 0.03, rel


def test_quantize_chunked_matches_whole():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((256, 512)).astype(np.float32) * 0.03
    awq = quantize_pack_device(jnp.asarray(w), group_size=128, dtype=jnp.float32)
    q1 = quantize_int4f(awq, n_chunk=8192)
    q2 = quantize_int4f(awq, n_chunk=128)
    assert np.array_equal(np.asarray(q1.w8), np.asarray(q2.w8))
    assert np.allclose(np.asarray(q1.b), np.asarray(q2.b))


def test_kernel_interpret_matches_xla_fallback():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((256, 256)).astype(np.float32) * 0.05
    q = quantize_int4f(w)
    x = jnp.asarray(rng.standard_normal((5, 256)).astype(np.float32))
    y_kernel = np.asarray(w4a8f_matmul(x, q, interpret=True, out_dtype=jnp.float32))
    y_xla = np.asarray(w4a8f_matmul_xla(x, q, out_dtype=jnp.float32))
    # identical integer operands -> results equal to fp32 rounding
    np.testing.assert_allclose(y_kernel, y_xla, rtol=1e-6, atol=1e-6)
    # and both track the dequantized matmul up to activation-quant error
    y_ref = np.asarray(x) @ np.asarray(dequantize_int4f(q, jnp.float32))
    rel = np.abs(y_kernel - y_ref) / (np.abs(y_ref).max() + 1e-9)
    assert rel.max() < 0.05


def test_quantize_params_structure_tied_head():
    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, max_position_embeddings=64,
        tie_word_embeddings=True, eos_token_id=-100)
    rt = random_runtime(cfg, 64, dtype=jnp.float32, seed=0)
    p = quantize_params_int4f(rt.params, group_size=32)
    assert isinstance(p["layers"]["wqkv"], tuple)
    assert isinstance(p["layers"]["wqkv"][0], Int4FTensor)
    assert isinstance(p["lm_head"], Int4FTensor)  # materialized from embed.T
    assert p["lm_head"].n == 256
    # norms/embed untouched
    assert p["embed"] is rt.params["embed"]


def test_hybrid_prefix_engine_lossless_and_correlated():
    """The bench-primary composition at test scale: AWQ target with damped tail,
    shared prefix (layers 0..1 + head) converted to Int4F on the TARGET, draft
    sliced from the converted target. Greedy spec decode must be token-identical
    with the hybrid target's own AR decode, and the bit-shared prefix must keep
    acceptance well above the uncorrelated floor."""
    from umbrella_tpu.models.auto_model import ModelRuntime, early_exit_runtime
    from umbrella_tpu.quantization.int4f import hybridize_shared_prefix

    cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, max_position_embeddings=MAX_LEN,
        tie_word_embeddings=False, eos_token_id=-100)
    EXIT = 2
    t = random_awq_runtime(cfg, MAX_LEN, dtype=jnp.float32, seed=2,
                           group_size=64, quantize_lm_head=True)
    dl = dict(t.params["layers"])
    for k in ("wo", "down"):
        dl[k] = tuple(q._replace(scales=q.scales * 0.05) if i >= EXIT else q
                      for i, q in enumerate(dl[k]))
    params = hybridize_shared_prefix(dict(t.params, layers=dl), EXIT,
                                     group_size=64)
    target = ModelRuntime(cfg, params, MAX_LEN, dtype=jnp.float32)
    draft = early_exit_runtime(target, exit_layer=EXIT)
    # prefix + head are shared OBJECTS, not copies
    assert draft.params["layers"]["wqkv"][0] is params["layers"]["wqkv"][0]
    assert draft.params["lm_head"] is params["lm_head"]
    from umbrella_tpu.quantization.int4f import Int4FTensor

    assert isinstance(params["layers"]["wqkv"][0], Int4FTensor)
    assert not isinstance(params["layers"]["wqkv"][EXIT], Int4FTensor)

    eng = _make_engine(target, draft)
    prompt = [1, 17, 42, 9]
    out = eng.generate(input_ids=prompt, max_new_tokens=48)
    toks = out["generated_tokens"]
    assert len(toks) >= 48
    assert toks == _greedy_ar_decode(target, prompt, len(toks))
    assert out["avg_accept_tokens"] > 2.0, out["avg_accept_tokens"]


def test_full_int4f_target_engine_lossless():
    """FULL-Int4F target (every layer + head on the int8-MXU format — the
    TPU-native W4 serving row): quantize_runtime_int4f converts a MIXED
    hybrid pytree per element, and greedy spec decode over the converted
    target is token-identical with its own AR decode."""
    from umbrella_tpu.models.auto_model import ModelRuntime, early_exit_runtime
    from umbrella_tpu.quantization.int4f import (
        Int4FTensor, hybridize_shared_prefix, quantize_runtime_int4f)

    cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, max_position_embeddings=MAX_LEN,
        tie_word_embeddings=False, eos_token_id=-100)
    t = random_awq_runtime(cfg, MAX_LEN, dtype=jnp.float32, seed=2,
                           group_size=64, quantize_lm_head=True)
    # start from a MIXED pytree (prefix already Int4F) to pin the per-element
    # conversion path
    params = hybridize_shared_prefix(t.params, 2, group_size=64)
    mixed = ModelRuntime(cfg, params, MAX_LEN, dtype=jnp.float32)
    target = quantize_runtime_int4f(mixed, group_size=64)
    for i in range(4):
        assert isinstance(target.params["layers"]["wqkv"][i], Int4FTensor)
    # prefix tensors are reused, not requantized (bit-shared with the hybrid)
    assert target.params["layers"]["wqkv"][0] is params["layers"]["wqkv"][0]
    draft = early_exit_runtime(target, exit_layer=2)

    eng = _make_engine(target, draft)
    prompt = [1, 17, 42, 9]
    out = eng.generate(input_ids=prompt, max_new_tokens=32)
    toks = out["generated_tokens"]
    assert len(toks) >= 32
    assert toks == _greedy_ar_decode(target, prompt, len(toks))


@pytest.mark.parametrize("source", ["dense", "awq"])
def test_engine_int4f_draft_token_identical_with_ar_oracle(source):
    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, max_position_embeddings=MAX_LEN,
        tie_word_embeddings=True, eos_token_id=-100)
    dcfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        rope_theta=10000.0, max_position_embeddings=MAX_LEN,
        tie_word_embeddings=True, eos_token_id=-100)
    target = random_runtime(cfg, MAX_LEN, dtype=jnp.float32, seed=0)
    if source == "dense":
        draft = random_runtime(dcfg, MAX_LEN, dtype=jnp.float32, seed=1)
    else:
        draft = random_awq_runtime(dcfg, MAX_LEN, dtype=jnp.float32, seed=1,
                                   group_size=32)
    eng = _make_engine(target, draft, quantize_draft="int4f")
    from umbrella_tpu.quantization.int4f import has_int4f_layers

    assert has_int4f_layers(eng.draft_model.params["layers"])
    prompt = [3, 7, 11, 200, 42]
    out = eng.generate(input_ids=prompt, max_new_tokens=24)
    toks = out["generated_tokens"]
    assert len(toks) >= 24
    assert toks == _greedy_ar_decode(target, prompt, len(toks))
