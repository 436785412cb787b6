"""AWQ quantization tests: HF-format round trips, dequant math, fused kernel
(interpret mode), and quantized end-to-end decode."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.quantization.awq import (
    AwqTensor, awq_from_hf_tensors, awq_matmul, dequantize, pack_awq_numpy,
    pack_tpu_layout, quantize_matrix, unpack_awq_numpy)
from umbrella_tpu.quantization.loader import quantize_params


def test_awq_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    K, N, g = 64, 64, 32
    int_w = rng.integers(0, 16, size=(K, N)).astype(np.int8)
    int_z = rng.integers(0, 16, size=(K // g, N)).astype(np.int8)
    qweight, qzeros = pack_awq_numpy(int_w, int_z)
    assert qweight.shape == (K, N // 8) and qweight.dtype == np.int32
    uw, uz = unpack_awq_numpy(qweight, qzeros)
    np.testing.assert_array_equal(uw, int_w)
    np.testing.assert_array_equal(uz, int_z)


def test_repack_row_shards_blocks_are_standalone_packs():
    """Each of the m row-blocks of the repacked tensor must dequantize (with its
    scales/zeros block) to the matching logical K-block — the invariant the TP
    row-parallel sharding (parallel/mesh.py) relies on."""
    from umbrella_tpu.quantization.awq import repack_row_shards

    rng = np.random.default_rng(1)
    K, N, g, m = 128, 32, 16, 4
    int_w = rng.integers(0, 16, size=(K, N)).astype(np.int8)
    int_z = rng.integers(0, 16, size=(K // g, N)).astype(np.int8)
    scales = rng.uniform(0.01, 0.1, size=(K // g, N)).astype(np.float32)
    q = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.float32)
    full = np.asarray(dequantize(q, jnp.float32))
    rq = repack_row_shards(q, m)
    G = K // g
    for j in range(m):
        local = AwqTensor(
            w8=rq.w8[j * K // (2 * m):(j + 1) * K // (2 * m)],
            scales=rq.scales[j * G // m:(j + 1) * G // m],
            zeros=rq.zeros[j * G // m:(j + 1) * G // m])
        np.testing.assert_allclose(
            np.asarray(dequantize(local, jnp.float32)),
            full[j * K // m:(j + 1) * K // m], rtol=0, atol=0)
    # m=1 is the identity
    np.testing.assert_array_equal(
        np.asarray(repack_row_shards(q, 1).w8), np.asarray(q.w8))


def test_hf_tensors_to_tpu_layout_dequant():
    rng = np.random.default_rng(1)
    K, N, g = 256, 128, 128
    int_w = rng.integers(0, 16, size=(K, N)).astype(np.int8)
    int_z = rng.integers(0, 16, size=(K // g, N)).astype(np.int8)
    scales = rng.uniform(0.01, 0.1, size=(K // g, N)).astype(np.float32)
    qweight, qzeros = pack_awq_numpy(int_w, int_z)

    q = awq_from_hf_tensors(qweight, qzeros, scales, dtype=jnp.float32)
    got = np.asarray(dequantize(q, dtype=jnp.float32))
    ref = (int_w.astype(np.float32)
           - np.repeat(int_z, g, 0).astype(np.float32)) * np.repeat(scales, g, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_quantize_matrix_error_bound():
    rng = np.random.default_rng(2)
    K, N, g = 256, 64, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    int_w, int_z, scales = quantize_matrix(w, g)
    q = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.float32)
    wdq = np.asarray(dequantize(q, dtype=jnp.float32))
    err = np.abs(wdq - w)
    bound = np.repeat(scales, g, 0) * 0.5 + 1e-6
    assert (err <= bound).all()


def test_awq_matmul_xla_path_matches_dense():
    rng = np.random.default_rng(3)
    K, N, g, S = 256, 128, 128, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    int_w, int_z, scales = quantize_matrix(w, g)
    q = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.float32)
    x = rng.standard_normal((S, K)).astype(np.float32)
    y = np.asarray(awq_matmul(jnp.asarray(x), q, prefer_fused=False))
    ref = x @ np.asarray(dequantize(q, dtype=jnp.float32))
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


def test_w4a16_pallas_kernel_interpret():
    from umbrella_tpu.ops.pallas.w4a16 import w4a16_matmul

    rng = np.random.default_rng(4)
    K, N, g, S = 512, 256, 128, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    int_w, int_z, scales = quantize_matrix(w, g)
    q = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.bfloat16)
    x = rng.standard_normal((S, K)).astype(np.float32) * 0.1

    y = np.asarray(w4a16_matmul(jnp.asarray(x, jnp.bfloat16), q, interpret=True), np.float32)
    ref = (x.astype(np.float32) @ np.asarray(dequantize(q, jnp.float32), np.float32))
    # bf16 inputs => ~1e-2 relative tolerance
    np.testing.assert_allclose(y[:S], ref, rtol=5e-2, atol=5e-2)


def test_w4a16_gate_up_silu_fused_matches_composed():
    """Fused gate_up->silu*up kernel == composed matmul + XLA silu*mul (the MLP
    fusion on the verify path), incl. the awq_gate_up_silu dispatch contract."""
    import jax

    from umbrella_tpu.ops.pallas.w4a16 import w4a16_gate_up_silu
    from umbrella_tpu.quantization.awq import awq_gate_up_silu

    rng = np.random.default_rng(7)
    H, I, g, S = 256, 512, 64, 7
    w = rng.standard_normal((H, 2 * I)).astype(np.float32) * 0.05
    int_w, int_z, scales = quantize_matrix(w, g)
    q = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((S, H)).astype(np.float32) * 0.1)

    got = np.asarray(w4a16_gate_up_silu(x, q, interpret=True))
    gu = np.asarray(x, np.float32) @ np.asarray(dequantize(q, jnp.float32))
    ref = np.asarray(jax.nn.silu(gu[:, :I])) * gu[:, I:]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    # dispatch wrapper (CPU backend -> dequant path) matches too
    got2 = np.asarray(awq_gate_up_silu(x, q))
    np.testing.assert_allclose(got2, ref, rtol=2e-3, atol=2e-3)


def test_w4a16_layered_kernel_matches_per_layer():
    """Layered (stacked + scalar-prefetched layer_idx) kernel == slicing the layer
    out and running the 2D kernel, for every layer."""
    from umbrella_tpu.ops.pallas.w4a16 import w4a16_matmul
    from umbrella_tpu.quantization.awq import AwqTensor

    rng = np.random.default_rng(11)
    n_layers, K, N, g, S = 3, 512, 256, 128, 8
    qs = []
    for i in range(n_layers):
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        int_w, int_z, scales = quantize_matrix(w, g)
        qs.append(pack_tpu_layout(int_w, int_z, scales, dtype=jnp.bfloat16))
    stacked = AwqTensor(w8=jnp.stack([t.w8 for t in qs]),
                        scales=jnp.stack([t.scales for t in qs]),
                        zeros=jnp.stack([t.zeros for t in qs]))
    x = jnp.asarray(rng.standard_normal((S, K)).astype(np.float32) * 0.1, jnp.bfloat16)
    for i in range(n_layers):
        y_layered = np.asarray(w4a16_matmul(
            x, stacked, interpret=True, layer_idx=jnp.int32(i)), np.float32)
        y_plain = np.asarray(w4a16_matmul(x, qs[i], interpret=True), np.float32)
        np.testing.assert_array_equal(y_layered, y_plain)


def test_awq_layer_view_matmul_paths():
    """AwqLayerView dispatches both the fused (layered kernel) and dequant
    (slice-first) paths to the same per-layer result."""
    from umbrella_tpu.quantization.awq import AwqLayerView, AwqTensor, awq_matmul

    rng = np.random.default_rng(12)
    n_layers, K, N, g, S = 2, 256, 128, 128, 4
    qs = []
    for i in range(n_layers):
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        int_w, int_z, scales = quantize_matrix(w, g)
        qs.append(pack_tpu_layout(int_w, int_z, scales, dtype=jnp.float32))
    stacked = AwqTensor(w8=jnp.stack([t.w8 for t in qs]),
                        scales=jnp.stack([t.scales for t in qs]),
                        zeros=jnp.stack([t.zeros for t in qs]))
    x = jnp.asarray(rng.standard_normal((S, K)).astype(np.float32))
    for i in range(n_layers):
        view = AwqLayerView(stacked, jnp.int32(i))
        y_view = np.asarray(awq_matmul(x, view, prefer_fused=False))
        y_ref = np.asarray(awq_matmul(x, qs[i], prefer_fused=False))
        np.testing.assert_allclose(y_view, y_ref, rtol=1e-5, atol=1e-5)


def test_quantized_model_decode(tiny_cfg):
    """Quantize a tiny model; greedy spec decode still runs and stays lossless w.r.t.
    the quantized model's own AR decode."""
    import dataclasses

    from umbrella_tpu.models.auto_model import ModelRuntime, random_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.speculation.static_engine import StaticEngine
    from test_static_engine import MAX_LEN, _greedy_ar_decode

    cfg = dataclasses.replace(tiny_cfg, hidden_size=256, intermediate_size=256,
                              num_attention_heads=4, num_key_value_heads=2)
    base = random_runtime(cfg, MAX_LEN, seed=0)
    qparams = quantize_params(base.params, group_size=128, dtype=jnp.float32)
    target = ModelRuntime(cfg, qparams, MAX_LEN, dtype=jnp.float32)
    draft = random_runtime(cfg, MAX_LEN, seed=1)

    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1])
    eng.initialize()
    assert eng._prefill(np.asarray([1, 9, 23]))
    start = eng.num_nodes
    for _ in range(4):
        eng.build_tree()
        eng.verify()
    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(target, [1, 9, 23], len(produced))
    assert produced == oracle[: len(produced)]


def test_int8_kv_cache_decode(tiny_cfg):
    """int8 KV mode: spec decode runs and closely tracks the fp oracle."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.speculation.static_engine import StaticEngine
    from test_static_engine import MAX_LEN

    cfg = dataclasses.replace(tiny_cfg)
    target = random_runtime(cfg, MAX_LEN, seed=0)
    draft = random_runtime(cfg, MAX_LEN, seed=1)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], kv_dtype="int8")
    eng.initialize()
    assert eng.kv_target.quantized and eng.kv_target.k.dtype == jnp.int8
    assert eng._prefill(np.asarray([1, 9, 23, 7]))
    start = eng.num_nodes
    for _ in range(4):
        eng.build_tree()
        eng.verify()
    toks = eng.tokens_host[start : eng.num_nodes]
    assert eng.num_nodes - start >= 4
    assert (toks >= 0).all() and (toks < cfg.vocab_size).all()


def test_awq_lm_head_logits_exact_vs_dequant(tiny_cfg):
    """W4 lm_head (TPU extension): forward logits with an AwqTensor head must equal
    logits computed against the explicitly dequantized head matrix (fp32 both)."""
    import dataclasses

    import jax
    from umbrella_tpu.models.auto_model import ModelRuntime, random_runtime
    from umbrella_tpu.models.llama import llama_forward
    from umbrella_tpu.ops.masks import causal_mask_rows
    from umbrella_tpu.quantization.awq import dequantize
    from test_static_engine import MAX_LEN

    cfg = dataclasses.replace(tiny_cfg, hidden_size=256, intermediate_size=256,
                              num_attention_heads=4, num_key_value_heads=2,
                              tie_word_embeddings=False)
    base = random_runtime(cfg, MAX_LEN, seed=0)
    qparams = quantize_params(base.params, group_size=128, dtype=jnp.float32,
                              quantize_lm_head=True)
    assert isinstance(qparams["lm_head"], AwqTensor)
    rt = ModelRuntime(cfg, qparams, MAX_LEN, dtype=jnp.float32)

    prompt = jnp.asarray([1, 9, 23, 7], jnp.int32)
    S = prompt.shape[0]
    pos = jnp.arange(S)
    mask = causal_mask_rows(0, S, MAX_LEN)
    logits_q, _ = llama_forward(rt.params, rt.args, rt.init_kv(), prompt, pos, mask, 0)

    dense_params = dict(qparams)
    dense_params["lm_head"] = dequantize(qparams["lm_head"], jnp.float32)
    logits_d, _ = llama_forward(dense_params, rt.args, rt.init_kv(), prompt, pos, mask, 0)
    np.testing.assert_allclose(np.asarray(logits_q), np.asarray(logits_d),
                               rtol=2e-4, atol=2e-4)


def test_quantized_draft_runtime_lossless(tiny_cfg):
    """quantize_runtime on the DRAFT: spec decode stays token-identical with the fp
    target's AR oracle (draft quality never affects greedy losslessness)."""
    import dataclasses

    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.quantization.loader import quantize_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.speculation.static_engine import StaticEngine
    from test_static_engine import MAX_LEN, _greedy_ar_decode

    cfg = dataclasses.replace(tiny_cfg, hidden_size=256, intermediate_size=256,
                              num_attention_heads=4, num_key_value_heads=2)
    target = random_runtime(cfg, MAX_LEN, seed=0)
    draft = quantize_runtime(random_runtime(cfg, MAX_LEN, seed=1), dtype=jnp.float32)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1])
    eng.initialize()
    prompt = [1, 9, 23]
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    for _ in range(4):
        eng.build_tree()
        eng.verify()
    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(target, prompt, len(produced))
    assert produced == oracle[: len(produced)]


def test_w4a8_kernel_interpret_and_row_invariance():
    """W4A8 kernel (int8 activations): close to exact dequant math, and per-ROW
    activation quantization makes a row's output independent of its batch — the
    property that keeps greedy spec decode lossless vs AR decode under W4A8."""
    from umbrella_tpu.ops.pallas.w4a8 import w4a8_matmul

    rng = np.random.default_rng(5)
    K, N, g, S = 512, 256, 128, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    int_w, int_z, scales = quantize_matrix(w, g)
    q = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((S, K)) * 0.1, jnp.bfloat16)

    y = np.asarray(w4a8_matmul(x, q, interpret=True), np.float32)
    ref = np.asarray(x, np.float32) @ np.asarray(dequantize(q, jnp.float32), np.float32)
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.03, rel  # int8 activations ~1% relative error

    y_row0 = np.asarray(w4a8_matmul(x[0:1], q, interpret=True), np.float32)
    np.testing.assert_array_equal(y[0], y_row0[0])


def test_w4a16_kernel_small_group_count_shapes():
    """hidden=1536-style drafts have only 6 scale groups per half — the block
    picker must fall back to full-K2 blocks (scale block == overall dim)."""
    from umbrella_tpu.ops.pallas.w4a16 import w4a16_matmul

    rng = np.random.default_rng(6)
    K, N, g, S = 1536, 512, 128, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    int_w, int_z, scales = quantize_matrix(w, g)
    q = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((S, K)) * 0.1, jnp.bfloat16)
    y = np.asarray(w4a16_matmul(x, q, interpret=True), np.float32)
    ref = np.asarray(x, np.float32) @ np.asarray(dequantize(q, jnp.float32), np.float32)
    np.testing.assert_allclose(y, ref, rtol=5e-2, atol=5e-2)


def test_engine_quantize_draft_flag_lossless(tiny_cfg):
    """`quantize_draft=True` engine config: fp draft is W4-quantized at init and
    greedy decode stays lossless vs the target's AR oracle."""
    import dataclasses

    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.speculation.static_engine import StaticEngine
    from test_static_engine import MAX_LEN, _greedy_ar_decode

    cfg = dataclasses.replace(tiny_cfg, hidden_size=256, intermediate_size=256,
                              num_attention_heads=4, num_key_value_heads=2)
    target = random_runtime(cfg, MAX_LEN, seed=0)
    draft = random_runtime(cfg, MAX_LEN, seed=1)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], quantize_draft=True)
    eng.initialize()
    from umbrella_tpu.quantization.awq import has_awq_layers

    assert has_awq_layers(eng.draft_model.params["layers"])
    prompt = [2, 5, 8]
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    for _ in range(3):
        eng.build_tree()
        eng.verify()
    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(target, prompt, len(produced))
    assert produced == oracle[: len(produced)]


def test_quantize_pack_device_matches_numpy():
    """Device-side quantize+pack (quantize_pack_device) must produce bit-identical
    AwqTensors to the numpy quantize_matrix + pack_tpu_layout path."""
    import jax.numpy as jnp
    import numpy as np

    from umbrella_tpu.quantization.awq import (
        pack_tpu_layout, quantize_matrix, quantize_pack_device)

    rng = np.random.default_rng(11)
    for K, N, g in [(256, 128, 64), (128, 384, 32)]:
        w = (rng.standard_normal((K, N)) * 0.1).astype(np.float32)
        int_w, int_z, scales = quantize_matrix(w, g)
        ref = pack_tpu_layout(int_w, int_z, scales, dtype=jnp.float32)
        got = quantize_pack_device(jnp.asarray(w), g, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got.w8), np.asarray(ref.w8))
        np.testing.assert_allclose(np.asarray(got.scales), np.asarray(ref.scales),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got.zeros), np.asarray(ref.zeros))
