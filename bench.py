"""End-of-round benchmark — prints ONE JSON line {metric, value, unit, vs_baseline}.

Workload: the product's hot loop — static Sequoia-tree speculative decoding, batch 1,
greedy — on Llama-3.2-1B-shape target + Llama-68M-shape draft (random bf16 weights;
checkpoints are unavailable in this sandbox, so acceptance is the structural floor of
~1 bonus token per verify; tok/s here therefore ≈ full-pipeline steps/sec, a strict
LOWER bound on real-acceptance throughput). Baseline: reference RTX 4090
Llama3.1-8B + 1B draft MT-Bench = 100.7 tok/s (BASELINE.md) — note the baseline model
is ~8x larger; vs_baseline is reported against it until AWQ 8B fits on-chip.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compile cache — TPU compiles via the tunnel take minutes cold
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from umbrella_tpu.config import ModelConfig
    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.speculation.static_engine import StaticEngine

    platform = jax.devices()[0].platform
    max_len = 2048

    target_cfg = ModelConfig(
        vocab_size=128256, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        rope_theta=500000.0, max_position_embeddings=max_len,
        tie_word_embeddings=True, eos_token_id=-100,
    )
    draft_cfg = ModelConfig(
        vocab_size=128256, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=2, num_attention_heads=12, num_key_value_heads=12,
        rope_theta=500000.0, max_position_embeddings=max_len,
        tie_word_embeddings=True, eos_token_id=-100,
    )
    dtype = jnp.bfloat16
    target = random_runtime(target_cfg, max_len, dtype=dtype, seed=0)
    draft = random_runtime(draft_cfg, max_len, dtype=dtype, seed=1)

    gm = growmap_from_spec(5, 6, acc=[0.55, 0.2, 0.1, 0.06, 0.05, 0.04])
    # quantize_draft: W4-quantize the bf16 draft in process (incl. its tied lm_head
    # — the [768, 128256] head alone re-reads ~200 MB bf16 per tree level). Draft
    # quantization never changes greedy output (only proposals; verify is lossless).
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=dtype,
        growmap=gm, max_length=max_len, eos_token_ids=[-100], temperature=0.0,
        quantize_draft=True)
    eng.initialize()

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 120000, size=128).astype(np.int32)

    # warmup (compiles prefill buckets + the fused decode loop)
    assert eng._prefill(prompt)
    eng._decode_fused(8)
    jax.block_until_ready(eng.tokens)

    # timed run — entire loop is ONE dispatch (fused lax.while_loop)
    eng.reset()
    t_pf = time.time()
    assert eng._prefill(prompt)
    jax.block_until_ready(eng.tokens)
    ttft_ms = 1000 * (time.time() - t_pf)  # prefill(128) + first-token emit
    start = eng.num_nodes
    t0 = time.time()
    steps = eng._decode_fused(192)
    jax.block_until_ready(eng.tokens)
    dt = time.time() - t0

    dec_len = eng.num_nodes - start + 1
    toks_per_sec = dec_len / dt
    step_ms = 1000 * dt / steps
    baseline = 100.7  # RTX 4090, Llama3.1-8B + 1B draft, MT-Bench (BASELINE.md)

    # ---- secondary: 8B-AWQ-shape target + 1B-shape draft (real W4A16 kernels) ----
    awq_detail = {}
    try:
        import gc

        from umbrella_tpu.models.auto_model import random_awq_runtime

        del eng
        gc.collect()
        awq_cfg = ModelConfig(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
            rope_theta=500000.0, max_position_embeddings=max_len,
            tie_word_embeddings=False, eos_token_id=-100,
        )
        # W4 lm_head: the untied 8B head is ~1 GB bf16 (~1.4 ms/step of HBM traffic)
        awq_target = random_awq_runtime(awq_cfg, max_len, dtype=jnp.bfloat16, seed=2,
                                        quantize_lm_head=True)
        # CodeDrafter-500M-shape draft (reference's 8B-AWQ code-completion rows),
        # W4-quantized: the draft re-reads all weights once per tree level, so W4
        # cuts tree-build HBM traffic 4x vs bf16
        draft_500m_cfg = ModelConfig(
            vocab_size=128256, hidden_size=1536, intermediate_size=4096,
            num_hidden_layers=12, num_attention_heads=12, num_key_value_heads=12,
            rope_theta=500000.0, max_position_embeddings=max_len,
            tie_word_embeddings=True, eos_token_id=-100,
        )
        # W4 head for the tied draft too: the logits matmul re-reads the full
        # [1536, 128256] head every tree level (~0.5 ms/level of HBM in bf16)
        draft_500m = random_awq_runtime(draft_500m_cfg, max_len, dtype=jnp.bfloat16,
                                        seed=3, quantize_lm_head=True)
        # 127-node depth-6 tree: W4A16 verify is MXU-latency-bound and FLAT in tree
        # size up to ~128 nodes (ops/pallas/w4a16.py) so nodes are ~free, while
        # draft build cost scales with DEPTH (levels) — wide-and-shallow beats the
        # reference's 31-node 5x6 on both axes
        gm_awq = growmap_from_spec(
            24, 6, acc=[0.55, 0.2, 0.1, 0.06, 0.05, 0.04])
        eng2 = StaticEngine(
            draft_model_name=draft_500m, target_model_name=awq_target,
            dtype=jnp.bfloat16, growmap=gm_awq, max_length=max_len,
            eos_token_ids=[-100], temperature=0.0)
        eng2.initialize()
        assert eng2._prefill(prompt)
        eng2._decode_fused(8)  # warmup/compile
        eng2.reset()
        assert eng2._prefill(prompt)
        s2 = eng2.num_nodes
        jax.block_until_ready(eng2.tokens)
        t0 = time.time()
        steps2 = eng2._decode_fused(128)
        dt2 = time.time() - t0
        dec2 = eng2.num_nodes - s2 + 1
        awq_detail = {
            "awq8b_tokens_per_sec": round(dec2 / dt2, 2),
            "awq8b_decode_step_ms": round(1000 * dt2 / steps2, 2),
            "awq8b_setup": "W4 draft (incl. tied head) + W4 lm_head + 127-node 24x6 tree",
        }
    except Exception as e:  # keep the primary metric even if the 8B run fails
        awq_detail = {"awq8b_error": f"{type(e).__name__}: {e}"[:200]}

    # ---- secondary: continuous batching, 4 slots of the 1B setup ------------
    # The reference serves ONE request at a time (its KV cache has no batch dim);
    # this measures aggregate throughput of the multi-slot engine with fused
    # decode segments (one dispatch per 16 steps).
    batched_detail = {}
    try:
        import gc

        from umbrella_tpu.quantization.loader import quantize_runtime
        from umbrella_tpu.serving.batched_engine import BatchedStaticEngine

        try:
            del eng2
        except NameError:
            pass
        gc.collect()
        draft_b = quantize_runtime(draft, dtype=dtype, quantize_lm_head=True)
        B = 8  # measured 478 tok/s aggregate at B=8 vs 338 at B=4 (v5e) — the
        # batched jits are program-size-flat in B (one-hot row/mask selects)
        beng = BatchedStaticEngine(
            draft_model_name=draft_b, target_model_name=target, batch_size=B,
            dtype=dtype, growmap=gm, max_length=max_len, eos_token_ids=[-100],
            segment_steps=16)
        beng.initialize()
        reqs = [dict(input_ids=rng.integers(0, 120000, size=128).astype(
            np.int32).tolist(), max_new_tokens=160) for _ in range(2 * B)]
        beng.run(reqs[:B])  # warmup: compiles prefill buckets + the segment
        tb0 = time.time()
        outs = beng.run(reqs)
        dtb = time.time() - tb0
        total = sum(len(o["generated_tokens"]) for o in outs)
        batched_detail = {
            f"batched{B}_tokens_per_sec": round(total / dtb, 2),
            f"batched{B}_setup": f"{B} slots, {2*B} requests, fused 16-step segments",
        }
    except Exception as e:
        batched_detail = {"batched8_error": f"{type(e).__name__}: {e}"[:200]}

    # ---- secondary: acceptance EVIDENCE above the random floor --------------
    # Early-exit self-draft (first 8 of 16 layers, shared weights — the
    # reference's exit_layer trick, ref llama.py:421,450-451) against a target
    # whose later layers are damped (trained-model-like concentration; random
    # uniform layers would make truncation an UNcorrelated draft). Validates the
    # avg_accept_tokens accounting end-to-end at acceptance > floor and gives a
    # tok/s point with REAL multi-token commits per verify.
    accept_detail = {}
    try:
        import gc

        from umbrella_tpu.models.auto_model import ModelRuntime, early_exit_runtime

        gc.collect()
        damped_params = dict(target.params)
        damped_layers = dict(target.params["layers"])
        for k in ("wo", "down"):
            damped_layers[k] = damped_layers[k].at[8:].multiply(0.05)
        damped_params["layers"] = damped_layers
        target_ee = ModelRuntime(target_cfg, damped_params, max_len, dtype=dtype)
        draft_ee = early_exit_runtime(target_ee, exit_layer=8)
        eng3 = StaticEngine(
            draft_model_name=draft_ee, target_model_name=target_ee, dtype=dtype,
            growmap=gm, max_length=max_len, eos_token_ids=[-100], temperature=0.0)
        eng3.initialize()
        assert eng3._prefill(prompt)
        eng3._decode_fused(8)  # warmup/compile
        eng3.reset()
        assert eng3._prefill(prompt)
        s3 = eng3.num_nodes
        jax.block_until_ready(eng3.tokens)
        t0 = time.time()
        steps3 = eng3._decode_fused(192)
        dt3 = time.time() - t0
        dec3 = eng3.num_nodes - s3 + 1
        accept_detail = {
            "accept_evidence_avg_accept_tokens": round(dec3 / steps3, 2),
            "accept_evidence_tokens_per_sec": round(dec3 / dt3, 2),
            "accept_evidence_setup": "early-exit(8/16) shared-weight draft, damped tail",
        }
        del eng3
    except Exception as e:
        accept_detail = {"accept_evidence_error": f"{type(e).__name__}: {e}"[:200]}

    # ---- secondary: 70B-AWQ-shape per-layer slope + TP/offload extrapolation --
    # The north-star workload (reference README 70B rows, L40 = 37 tok/s). One
    # v5e cannot hold 35 GB of W4 weights; examples/bench_70b.py slope-times one
    # real 70B layer + lm_head on this chip and extrapolates TP=4/8 verify steps
    # with stated (auditable) collective/bandwidth assumptions.
    b70_detail = {}
    try:
        import gc
        import os
        import sys as _sys

        gc.collect()
        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from examples.bench_70b import measure as measure_70b

        r70 = measure_70b()
        b70_detail = {
            "llama70b_layer_verify_ms": r70["value"],
            "llama70b_lm_head_ms": r70["detail"]["lm_head_ms"],
            "llama70b_tp4": r70["detail"]["extrapolated_verify_step"]["tp4"],
            "llama70b_tp8": r70["detail"]["extrapolated_verify_step"]["tp8"],
            "llama70b_pp4": r70["detail"]["extrapolated_verify_step"]["pp4"],
            "llama70b_offload": r70["detail"]["offload_tier"],
            "llama70b_baseline_L40_tok_s": 37.0,
        }
    except Exception as e:
        b70_detail = {"llama70b_error": f"{type(e).__name__}: {e}"[:200]}

    result = {
        "metric": "spec_decode_tokens_per_sec_1b_target_68m_draft_greedy",
        "value": round(toks_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_sec / baseline, 3),
        "detail": {
            "platform": platform,
            "steps": steps,
            "decode_step_ms": round(step_ms, 2),
            "ttft_ms_prefill128": round(ttft_ms, 2),
            "avg_accept_tokens": round(dec_len / steps, 2),
            "tree": "sequoia-5x6 (31 nodes)",
            "note": "random weights => acceptance floor ~1/step; value is a lower bound",
            **awq_detail,
            **batched_detail,
            **accept_detail,
            **b70_detail,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
