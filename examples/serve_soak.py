"""Serving soak: ContinuousBatcher under concurrent load on one chip.

The reference serves ONE request at a time through a mutex-guarded worker
(`umbrella/api/server.py:43-55`); this measures the TPU-native serving story —
B slots decoding in one compiled step, requests admitted continuously — under a
Poisson-ish open load of mixed-length requests, and reports aggregate
throughput plus per-request latency percentiles (the numbers a deployment
actually SLOs on).

Random weights => acceptance floor; throughput is a lower bound, latency
percentiles reflect real scheduling/queueing. One JSON line. Run:
`python examples/serve_soak.py [--batch 8] [--requests 32]`.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--max-new", type=int, default=128)
    p.add_argument("--prompt-min", type=int, default=32)
    p.add_argument("--prompt-max", type=int, default=256)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--mixed-priorities", action="store_true",
                   help="alternate priority 1/5 to exercise per-class metrics "
                        "and inversion accounting under the batcher lookahead")
    p.add_argument("--no-scheduler", action="store_true",
                   help="A/B: submit straight into the ContinuousBatcher "
                        "(isolates the scheduler layer's cost)")
    p.add_argument("--serial-loop", action="store_true",
                   help="A/B: run the serial fetch->harvest->admit->dispatch "
                        "loop instead of the lag-1 pipelined default")
    p.add_argument("--segment-steps", type=int, default=8,
                   help="decode steps fused per dispatch; higher = fewer host "
                        "syncs/admission boundaries, coarser latency")
    p.add_argument("--model-class", choices=["1b", "awq8b", "tiny"], default="1b",
                   help="awq8b = the bench-primary flagship composition "
                        "(8B-AWQ damped target + shared early-exit Int4F "
                        "draft, REAL acceptance) at the promoted serving "
                        "point: int8 KV, 2x3 tree — measures per-request "
                        "latency percentiles at the BENCH_DETAIL B=32 rows "
                        "(1043 run(), 1327 pipelined batcher)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from umbrella_tpu.config import ModelConfig
    from umbrella_tpu.models.auto_model import random_runtime
    from umbrella_tpu.quantization.loader import quantize_runtime
    from umbrella_tpu.sequoia import growmap_from_spec
    from umbrella_tpu.serving.batched_engine import (BatchedStaticEngine,
                                                     ContinuousBatcher)
    from umbrella_tpu.serving.scheduler import make_scheduler

    max_len = args.max_len
    dtype = jnp.bfloat16
    if args.model_class == "awq8b":
        # the bench-primary flagship composition at the promoted serving point
        from umbrella_tpu.models.auto_model import (
            ModelRuntime, early_exit_runtime, random_awq_runtime)
        from umbrella_tpu.quantization.int4f import hybridize_shared_prefix

        awq_cfg = ModelConfig(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
            rope_theta=500000.0, max_position_embeddings=max_len,
            tie_word_embeddings=False, eos_token_id=-100)
        EXIT = 3
        target = random_awq_runtime(awq_cfg, max_len, dtype=dtype, seed=2,
                                    quantize_lm_head=True)
        dl = dict(target.params["layers"])
        for k in ("wo", "down"):
            dl[k] = tuple(q._replace(scales=q.scales * 0.05) if i >= EXIT else q
                          for i, q in enumerate(dl[k]))
        target.params = hybridize_shared_prefix(
            dict(target.params, layers=dl), EXIT, refine=0)  # match bench primary
        target = ModelRuntime(awq_cfg, target.params, max_len, dtype=dtype)
        draft = early_exit_runtime(target, exit_layer=EXIT)
        gm = growmap_from_spec(2, 3)
        kv_dtype = "int8"
    elif args.model_class == "tiny":
        # CPU smoke of the soak flow itself (metrics plumbing, streaming
        # cadence collection) — not a perf configuration
        tiny_cfg = ModelConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=10000.0, max_position_embeddings=max_len,
            tie_word_embeddings=True, eos_token_id=-100)
        target = random_runtime(tiny_cfg, max_len, dtype=jnp.float32, seed=0)
        draft = random_runtime(tiny_cfg, max_len, dtype=jnp.float32, seed=1)
        gm = growmap_from_spec(3, 4)
        kv_dtype = None
        dtype = jnp.float32
    else:
        target_cfg = ModelConfig(
            vocab_size=128256, hidden_size=2048, intermediate_size=8192,
            num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
            rope_theta=500000.0, max_position_embeddings=max_len,
            tie_word_embeddings=True, eos_token_id=-100)
        draft_cfg = ModelConfig(
            vocab_size=128256, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=2, num_attention_heads=12, num_key_value_heads=12,
            rope_theta=500000.0, max_position_embeddings=max_len,
            tie_word_embeddings=True, eos_token_id=-100)
        target = random_runtime(target_cfg, max_len, dtype=dtype, seed=0)
        draft = quantize_runtime(
            random_runtime(draft_cfg, max_len, dtype=dtype, seed=1),
            dtype=dtype, quantize_lm_head=True)
        gm = growmap_from_spec(5, 6, acc=[0.55, 0.2, 0.1, 0.06, 0.05, 0.04])
        kv_dtype = None
    eng = BatchedStaticEngine(
        draft_model_name=draft, target_model_name=target, batch_size=args.batch,
        dtype=dtype, growmap=gm, max_length=max_len, eos_token_ids=[-100],
        segment_steps=args.segment_steps, kv_dtype=kv_dtype)
    eng.initialize()
    # warmup compile (prefill buckets + segment) before the timed soak
    rng = np.random.default_rng(0)
    vmax = min(120000, target.cfg.vocab_size - 2)
    eng.run([dict(input_ids=rng.integers(0, vmax, size=100).astype(np.int32)
                  .tolist(), max_new_tokens=16) for _ in range(args.batch)])

    # requests route through the Scheduler (priority queue + metrics) in front
    # of the batcher — the full serving composition (api/server "scheduler" key)
    batcher = ContinuousBatcher(eng, pipeline=not args.serial_loop)
    batcher.start()
    sched = None
    if not args.no_scheduler:
        sched = make_scheduler(batcher=batcher)
        sched.start()
    lat = []
    t0 = time.time()
    futs = []
    frame_times = {}  # request idx -> [wall times of partial frames]
    for i in range(args.requests):
        n_prompt = int(rng.integers(args.prompt_min, args.prompt_max))
        n_new = int(rng.integers(args.max_new // 2, args.max_new))
        ts = time.time()
        # uniform priority by default: the latency headline must not embed
        # deliberate inversions; --mixed-priorities exercises the per-class
        # metrics + inversion accounting instead
        prio = (1 if (i % 4 == 0) else 5) if args.mixed_priorities else 1
        # every 4th request streams: measures frame cadence under load
        # (partials are emitted once per decode segment — the seg-vs-streaming
        # granularity tradeoff, VERDICT r4 item 7)
        ft = frame_times[i] = []
        cb = (lambda _t, _p, ft=ft: ft.append(time.time())) if i % 4 == 0 \
            else None
        req_kw = dict(
            input_ids=rng.integers(0, vmax, size=n_prompt).astype(np.int32)
            .tolist(), max_new_tokens=n_new)
        if sched is not None:
            fut = sched.submit(priority=prio, stream_cb=cb, **req_kw)
        else:
            fut = batcher.submit(stream_cb=cb, **req_kw)
        futs.append((fut, ts, n_new))
        time.sleep(0.02)  # open-loop-ish arrivals
    total_tokens = 0
    ttfts = []
    for fut, ts, n_new in futs:
        out = fut.result(timeout=600)
        lat.append(time.time() - ts)
        total_tokens += len(out["generated_tokens"])
        if out.get("ttft_ms", 0) > 0:
            ttfts.append(out["ttft_ms"])
    wall = time.time() - t0
    gaps = [b - a for ft in frame_times.values()
            for a, b in zip(ft, ft[1:])]
    sched_metrics = (sched.snapshot_metrics() if sched is not None else
                     {"queue_seconds": 0.0, "requests": 0,
                      "priority_inversions": 0, "by_priority": {}})
    if sched is not None:
        sched.shutdown(wait=False)
    batcher.shutdown()

    lat_ms = np.sort(np.asarray(lat) * 1000)
    result = {
        "metric": "serving_soak_aggregate_tokens_per_sec",
        "value": round(total_tokens / wall, 2),
        "unit": "tokens/s",
        "detail": {
            "platform": jax.devices()[0].platform,
            "batch_slots": args.batch,
            "requests": args.requests,
            "total_tokens": total_tokens,
            "wall_s": round(wall, 2),
            "latency_p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "latency_p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
            "latency_p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            # per-request TTFT (submit -> first committed tokens, incl. queue
            # wait) and streaming-frame cadence on the streamed subset —
            # both segment-quantized (emit_partials runs once per segment)
            "ttft_p50_ms": round(float(np.percentile(ttfts, 50)), 1)
            if ttfts else None,
            "ttft_p99_ms": round(float(np.percentile(ttfts, 99)), 1)
            if ttfts else None,
            "stream_frame_gap_median_ms": round(
                1000 * float(np.median(gaps)), 1) if gaps else None,
            "stream_frames_per_request": round(
                np.mean([len(v) for v in frame_times.values() if v]), 1)
            if any(frame_times.values()) else None,
            "segment_steps": args.segment_steps,
            "loop": "serial" if args.serial_loop else "pipelined",
            "scheduler_queue_seconds_total": round(sched_metrics["queue_seconds"], 2),
            "scheduler_queue_s_mean": round(
                sched_metrics["queue_seconds"] / max(sched_metrics["requests"], 1), 3),
            "priority_inversions": sched_metrics["priority_inversions"],
            "queue_s_mean_by_priority": {
                k: round(v["queue_seconds"] / max(v["requests"], 1), 3)
                for k, v in sched_metrics["by_priority"].items()},
            "prompt_tokens": [args.prompt_min, args.prompt_max],
            "model_class": args.model_class,
            "note": ("8B-AWQ flagship composition, REAL acceptance (early-exit "
                     "shared draft), int8 KV, 2x3 tree"
                     if args.model_class == "awq8b" else
                     "random weights => acceptance floor; throughput is a "
                     "lower bound"),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
