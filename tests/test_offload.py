"""Offload (host-DRAM streaming) runtime: exact equivalence with resident forward,
and end-to-end spec decode through the engine's streamed path."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.offload.streaming import OffloadModelRuntime
from umbrella_tpu.ops.masks import causal_mask_rows
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.dynamic_engine import DynamicEngine
from umbrella_tpu.speculation.static_engine import StaticEngine

from test_static_engine import MAX_LEN, _cfg, _greedy_ar_decode


@pytest.fixture(scope="module")
def resident():
    return random_runtime(_cfg(), MAX_LEN, seed=0)


def test_streamed_forward_matches_resident(resident):
    off = OffloadModelRuntime.from_params(
        resident.params, resident.cfg, MAX_LEN, dtype=jnp.float32,
        num_cache_layers=1)
    S = 7
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 97, S), jnp.int32)
    pos = jnp.arange(S)
    mask = causal_mask_rows(0, S, MAX_LEN)

    kv_r = resident.init_kv()
    ref, _ = resident.forward(resident.params, kv_r, ids, pos, mask, 0)

    kv_o = off.init_kv()
    got, kv_o = off.streamed_forward(kv_o, ids, pos, mask, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_offload_target_spec_decode_lossless(resident):
    """Engine drives an offload target through the non-fused verify path; greedy
    output must still equal the AR oracle."""
    off = OffloadModelRuntime.from_params(
        resident.params, resident.cfg, MAX_LEN, dtype=jnp.float32)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=off, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1])
    eng.initialize()
    prompt = [1, 17, 42, 9]
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    for _ in range(4):
        eng.build_tree()
        eng.verify()
    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(resident, prompt, len(produced))
    assert produced == oracle[: len(produced)]


def test_dynamic_offload_pipelined_generate_lossless(resident):
    """Dynamic beam-tree engine over an offload target (pipelined loop threads the
    per-step bitmap/parents through the gated tail)."""
    off = OffloadModelRuntime.from_params(
        resident.params, resident.cfg, MAX_LEN, dtype=jnp.float32)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    eng = DynamicEngine(
        draft_model_name=draft, target_model_name=off, dtype=jnp.float32,
        width=4, num_beams=4, depth=3, max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1])
    eng.initialize()
    prompt = [1, 17, 42, 9]
    out = eng.generate(input_ids=prompt, max_new_tokens=8)
    produced = out["generated_tokens"]
    assert len(produced) >= 8
    oracle = _greedy_ar_decode(resident, prompt, len(produced))
    assert produced == oracle[: len(produced)]


def test_offload_pipelined_generate_lossless(resident):
    """generate() on an offload target uses the device-resident pipelined loop
    (one in-flight step ahead, no per-step host sync); output must still be
    token-identical with the AR oracle, and the trailing no-op step must not
    corrupt host/device state."""
    off = OffloadModelRuntime.from_params(
        resident.params, resident.cfg, MAX_LEN, dtype=jnp.float32)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=off, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1])
    eng.initialize()
    prompt = [1, 17, 42, 9]
    out = eng.generate(input_ids=prompt, max_new_tokens=12)
    produced = out["generated_tokens"]
    assert len(produced) >= 12
    oracle = _greedy_ar_decode(resident, prompt, len(produced))
    assert produced == oracle[: len(produced)]
    assert out["avg_accept_tokens"] >= 1.0


def test_offload_pipelined_stream_loop_lossless(resident):
    """speculative_decoding (the _decode_segments streaming loop) over an offload
    target goes through the pipelined path with the per-commit host callback."""
    off = OffloadModelRuntime.from_params(
        resident.params, resident.cfg, MAX_LEN, dtype=jnp.float32)
    draft = random_runtime(_cfg(), MAX_LEN, seed=1)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=off, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], stop_distance=4)
    eng.initialize()
    prompt = [1, 17, 42, 9]
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    dec_len, elapsed, steps = eng.speculative_decoding(max_new_tokens=10)
    assert steps >= 1 and dec_len >= 2
    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(resident, prompt, len(produced))
    assert produced == oracle[: len(produced)]


def test_streamed_forward_traced_matches_and_reports(resident):
    off = OffloadModelRuntime.from_params(
        resident.params, resident.cfg, MAX_LEN, dtype=jnp.float32,
        num_cache_layers=1)
    S = 7
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 97, S), jnp.int32)
    pos = jnp.arange(S)
    mask = causal_mask_rows(0, S, MAX_LEN)

    ref, _ = off.streamed_forward(off.init_kv(), ids, pos, mask, jnp.int32(0))
    got, _, stats = off.streamed_forward_traced(
        off.init_kv(), ids, pos, mask, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
    assert stats["n_layers"] == off.n_layers and stats["n_resident"] == 1
    assert stats["compute_ms"] > 0
    assert stats["overlap"] in ("compute-bound", "DMA-bound")
    assert len(stats["per_layer_head"]) == min(4, off.n_layers)
