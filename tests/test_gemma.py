"""Gemma2 golden-parity vs HF transformers on a tiny random model."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.gemma import (
    GemmaStaticArgs, gemma2_forward, gemma_params_from_hf_state_dict)
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.ops.masks import causal_mask_rows

MAX_LEN = 64


def _hf_tiny_gemma(seed=0):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(seed)
    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=16, sliding_window=16, tie_word_embeddings=True,
        attn_implementation="eager",
    )
    model = Gemma2ForCausalLM(cfg)
    model.eval()
    return model, cfg


def test_gemma2_forward_matches_hf():
    import torch

    model, hf_cfg = _hf_tiny_gemma()
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_dict(hf_cfg.to_dict())
    params = gemma_params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    args = GemmaStaticArgs.from_config(cfg)
    assert args.attn_softcap == 50.0 and args.final_softcap == 30.0

    S = 24  # > sliding_window so the windowed layers actually mask something
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, size=S)
    with torch.no_grad():
        ref = model(torch.tensor(ids)[None]).logits[0].numpy()

    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    logits, kv = gemma2_forward(
        params, args, kv, jnp.asarray(ids), jnp.arange(S),
        causal_mask_rows(0, S, MAX_LEN), 0)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=3e-3, atol=3e-3)


def _gemma_runtime(seed, max_len=128):
    from umbrella_tpu.models.auto_model import ModelRuntime

    model, hf_cfg = _hf_tiny_gemma(seed=seed)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_dict(hf_cfg.to_dict())
    params = gemma_params_from_hf_state_dict(sd, cfg, max_len, dtype=jnp.float32)
    return ModelRuntime(cfg, params, max_len, dtype=jnp.float32, family="gemma2")


def test_batched_gemma_forward_matches_single():
    """batched_gemma2_forward == gemma2_forward per slot (4 norms, softcaps,
    even-layer sliding window all live in the batched body too)."""
    import jax

    from umbrella_tpu.models.batched import (batched_gemma2_forward,
                                             init_batched_kv)

    rt = _gemma_runtime(0)
    B, S = 3, 20  # S > sliding_window: windowed layers actually mask
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, rt.cfg.vocab_size, (B, S)), jnp.int32)
    offsets = jnp.asarray([0, 9, 4], jnp.int32)
    pos = offsets[:, None] + jnp.arange(S)[None, :]
    masks = jnp.stack([causal_mask_rows(offsets[b], S, 128) for b in range(B)])
    kv_b = init_batched_kv(rt.cfg, B, 128, jnp.float32)
    got, _ = jax.jit(lambda p, kv: batched_gemma2_forward(
        p, rt.gemma_args, kv, ids, pos, masks, offsets))(rt.params, kv_b)
    for b in range(B):
        kv = init_kv_cache(rt.cfg, 128, dtype=jnp.float32)
        ref, _ = gemma2_forward(rt.params, rt.gemma_args, kv, ids[b], pos[b],
                                masks[b], offsets[b])
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_batched_gemma_engine_matches_single_slot():
    """Gemma2 continuous batching (VERDICT r3 item 10): every slot's committed
    tokens equal the single-slot static engine's on the same weights."""
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.serving.batched_engine import BatchedStaticEngine
    from umbrella_tpu.speculation.static_engine import StaticEngine

    target = _gemma_runtime(0)
    draft = _gemma_runtime(1)
    gm = growmap_from_spec(3, 4)
    beng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target, batch_size=2,
        dtype=jnp.float32, growmap=gm, max_length=128, safe_buffer=32,
        eos_token_ids=[-1])
    beng.initialize()
    prompts = [[1, 17, 42, 9], [3, 3, 7, 25, 90]]
    starts = []
    for b, p in enumerate(prompts):
        assert beng.admit(b, p)
        starts.append(int(beng.num_nodes[b]))
    for _ in range(4):
        beng.step()

    for b, p in enumerate(prompts):
        produced = beng.tokens_host[b, starts[b]:int(beng.num_nodes[b]) + 1].tolist()
        assert len(produced) >= 5
        eng = StaticEngine(
            draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
            growmap=gm, max_length=128, safe_buffer=32, eos_token_ids=[-1],
            temperature=0.0)
        eng.initialize()
        assert eng._prefill(np.asarray(p, np.int32))
        s0 = eng.num_nodes
        while eng.num_nodes - s0 + 1 < len(produced):
            eng.build_tree()
            eng.verify()
        ref = eng.tokens_host[s0:eng.num_nodes + 1].tolist()
        assert produced == ref[:len(produced)], f"slot {b} diverged"


def test_gemma2_incremental_decode_consistency():
    model, hf_cfg = _hf_tiny_gemma(seed=2)
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    cfg = ModelConfig.from_dict(hf_cfg.to_dict())
    params = gemma_params_from_hf_state_dict(sd, cfg, MAX_LEN, dtype=jnp.float32)
    args = GemmaStaticArgs.from_config(cfg)

    S = 20
    ids = np.random.default_rng(3).integers(0, cfg.vocab_size, size=S)
    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    full, _ = gemma2_forward(params, args, kv, jnp.asarray(ids), jnp.arange(S),
                             causal_mask_rows(0, S, MAX_LEN), 0)
    kv = init_kv_cache(cfg, MAX_LEN, dtype=jnp.float32)
    rows = []
    for t in range(S):
        lg, kv = gemma2_forward(params, args, kv, jnp.asarray(ids[t:t+1]),
                                jnp.asarray([t]), causal_mask_rows(t, 1, MAX_LEN), t)
        rows.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.stack(rows), np.asarray(full), rtol=3e-3, atol=3e-3)


def test_batched_gemma_tensor_parallel_identity():
    """Batched TP gemma2 (VERDICT r4 item 9): the batched engine with
    tensor_parallel=2 (Megatron layout + psum BEFORE the post norms, KV on kv
    heads) commits tokens identical to the unsharded batched engine."""
    import jax.numpy as jnp

    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.serving.batched_engine import BatchedStaticEngine

    gm = growmap_from_spec(3, 4)
    prompts = [[1, 17, 42, 9], [3, 3, 7, 25, 90]]

    def run(tp):
        beng = BatchedStaticEngine(
            draft_model_name=_gemma_runtime(0), target_model_name=_gemma_runtime(1),
            batch_size=2, dtype=jnp.float32, growmap=gm, max_length=128,
            safe_buffer=32, eos_token_ids=[-1], tensor_parallel=tp)
        beng.initialize()
        res = beng.run([dict(input_ids=p, max_new_tokens=10) for p in prompts])
        if tp > 1:
            assert getattr(beng.target_model, "_tp", False)
            assert beng.kv_target.k.sharding.spec[2] == "model"
        return [r["generated_tokens"][:10] for r in res]

    assert run(2) == run(0)
