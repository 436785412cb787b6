"""70B-AWQ-shape measurement on ONE chip: per-layer slope timing + extrapolation.

The north-star workload is Llama3.3-70B-AWQ speculative serving (reference
`README.md:88-98`: L40 = 37-38.5 tok/s with a 1B draft). A single v5e cannot hold
the 35 GB of W4 weights, so this harness measures what one chip CAN measure
exactly and extrapolates the rest with stated assumptions:

1. SLOPE-timed single 70B layer (K=8192, I=28672 W4A16 matmuls + flash attention
   at GQA 64 heads / 8 kv heads, S=128 verify tree) — the per-layer verify cost.
   Slope method per CLAUDE.md: run the layer N1 vs N2 times inside one jit with a
   loop-carried data dependency; (t2-t1)/(N2-N1) cancels dispatch/fetch overhead.
2. SLOPE-timed W4 lm_head ([8192, 128256]) — once per verify step.
3. Extrapolated verify step:  n_layers x per-layer + head, at TP=1 (hypothetical
   memory), TP=4, TP=8. TP splits every matmul's FLOPs/bytes evenly (Megatron
   column/row layout, parallel/mesh.py); per-layer collective cost is modeled as
   2 psums of the [S, H] bf16 activations over the ICI ring
   (2*(N-1)/N * bytes / bw, bw = 45 GB/s/link x 2 links assumed for v5e) and
   reported separately so the assumption is auditable.
4. Offload tier: time host->HBM transfer of one W4 layer vs its compute to get
   the stream:compute split (reference's whole 70B-on-consumer-GPU story is this
   overlap, ref `llama.py:196-212`). NOTE: on this sandbox the "host->device"
   path is a network tunnel (~MB/s, see CLAUDE.md), so the split is reported
   with the measured link bandwidth alongside a PCIe-class projection.

Prints one JSON object. Run standalone: `python examples/bench_70b.py`.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def slope_time(fn, n1=4, n2=20):
    """Seconds per op via the slope method (see CLAUDE.md microbench traps)."""
    import jax

    r1 = fn(n1)
    jax.block_until_ready(r1)
    np.asarray(jax.tree.leaves(r1)[0])  # materialize once: arms block_until_ready
    r2 = fn(n2)
    jax.block_until_ready(r2)

    def run(n):
        t0 = time.time()
        jax.block_until_ready(fn(n))
        return time.time() - t0

    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    return (t2 - t1) / (n2 - n1)


def measure():
    """Run the 70B-shape measurement; returns the result dict (see module doc)."""
    import jax

    import jax.numpy as jnp

    from umbrella_tpu.config import ModelConfig
    from umbrella_tpu.models.kv_cache import init_kv_cache
    from umbrella_tpu.models.llama import StaticModelArgs, llama_layer
    from umbrella_tpu.ops.masks import tree_mask_rows
    from umbrella_tpu.ops.rope import rope_params
    from umbrella_tpu.quantization.awq import AwqTensor, awq_matmul

    # Llama-3.x-70B architecture
    H, I, D = 8192, 28672, 128
    HEADS, KVH, N_LAYERS, V = 64, 8, 80, 128256
    S = 128            # 127-node tree + root — the wide-and-shallow verify width
    L = 2048           # live KV window for the attention measurement
    GS = 128           # AWQ group size
    cfg = ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I, num_hidden_layers=1,
        num_attention_heads=HEADS, num_key_value_heads=KVH, head_dim=D,
        rope_theta=500000.0, max_position_embeddings=L, tie_word_embeddings=False,
        eos_token_id=-100)
    args = StaticModelArgs.from_config(cfg, n_layers=1)
    rng = np.random.default_rng(0)

    def q(k_dim, n_dim):
        G = k_dim // GS
        return AwqTensor(
            w8=jnp.asarray(rng.integers(0, 256, (k_dim // 2, n_dim),
                                        dtype=np.uint8).view(np.int8)),
            scales=jnp.asarray(rng.uniform(0.001, 0.01, (G, n_dim)).astype(np.float32)
                               ).astype(jnp.bfloat16),
            zeros=jnp.asarray(rng.integers(0, 16, (G, n_dim)).astype(np.float32)
                              ).astype(jnp.bfloat16))

    Hq, KV = HEADS * D, KVH * D
    lw = {
        "input_norm": jnp.ones(H, jnp.bfloat16),
        "post_norm": jnp.ones(H, jnp.bfloat16),
        "wqkv": q(H, Hq + 2 * KV), "wo": q(Hq, H),
        "gate_up": q(H, 2 * I), "down": q(I, H),
    }
    w4_layer_bytes = sum(int(np.prod(t.w8.shape)) for t in lw.values()
                        if isinstance(t, AwqTensor))

    rp = rope_params(cfg)
    kv = init_kv_cache(cfg, L, jnp.bfloat16, num_layers=1)
    bitmap = np.eye(S, dtype=bool)
    bitmap[:, 0] = True
    num_nodes = jnp.int32(1024)
    mask = tree_mask_rows(num_nodes, jnp.asarray(bitmap), L)
    pos = num_nodes + jnp.zeros(S, jnp.int32)
    x0 = jnp.asarray(rng.standard_normal((S, H)), jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def layer_reps(x, kv, lw, mask, pos, off, n):
        def body(carry, _):
            h, kv2 = carry
            h2, kv2 = llama_layer(args, lw, h, kv2, 0, pos, mask, off,
                                  lw_rope[0], lw_rope[1])
            # loop-carried data dependency; keep magnitude stable
            return (x + 0.001 * h2, kv2), None

        (h, kv), _ = jax.lax.scan(body, (x, kv), None, length=n)
        return h

    lw_rope = (rp["rope_inv_freq"], rp["rope_scale"])
    layer_s = slope_time(lambda n: layer_reps(x0, kv, lw, mask, pos, num_nodes, n=n))

    head = q(H, V)

    @functools.partial(jax.jit, static_argnames=("n",))
    def head_reps(x, head, n):
        def body(carry, _):
            y = awq_matmul(carry, head, out_dtype=jnp.float32)
            return x + 0.0001 * y[:, :H].astype(x.dtype), None

        h, _ = jax.lax.scan(body, x, None, length=n)
        return h

    head_s = slope_time(lambda n: head_reps(x0, head, n=n))

    # ---- extrapolation ------------------------------------------------------
    hbm_bw = 819e9  # v5e HBM GB/s (spec)
    w4_total = w4_layer_bytes * N_LAYERS + int(np.prod(head.w8.shape))
    step = {}
    for tp in (1, 4, 8):
        compute = (N_LAYERS * layer_s + head_s) / tp
        # 2 psums/layer of [S, H] bf16 over a tp-chip ring; 45 GB/s x 2 links
        ici_bw = 90e9
        psum_bytes = 2 * S * H * 2
        coll = 0.0 if tp == 1 else N_LAYERS * 2 * (tp - 1) / tp * psum_bytes / ici_bw
        step[f"tp{tp}"] = {
            "verify_ms": round(1000 * (compute + coll), 2),
            "collective_ms": round(1000 * coll, 2),
            "fits_hbm": bool(w4_total / tp < 14e9),
        }

    # tok/s projection: step = verify + draft build. draft_ms=8 matches the
    # MEASURED 8B-class W4 draft build on this chip (7.7 ms round 2 — the
    # flagship 70B config drafts with an 8B-AWQ model, reference README:43-54;
    # a replicated draft does not shrink with TP, so the build cost is additive
    # and NOT overlapped here — the projection is conservative in that verify
    # collectives could overlap the next tree's early levels, and optimistic
    # only in assuming reference-class acceptance (~4-6 accepted/step).
    draft_ms = 8.0
    # PP=4 capacity tier (parallel/pipeline.py): weights fit 4 chips with ZERO
    # per-matmul collectives — at B=1 the verify latency is the full-model
    # compute (fill bubble) plus 3 activation hops of [S, H] bf16 over ICI.
    hop = 3 * S * H * 2 / ici_bw
    step["pp4"] = {
        "verify_ms": round(1000 * (N_LAYERS * layer_s + head_s + hop), 2),
        "collective_ms": round(1000 * hop, 3),
        "fits_hbm": bool(w4_total / 4 < 14e9),
        "note": "capacity axis: B=1 latency = full-model compute (fill bubble)",
    }
    for tp_key, d in step.items():
        total_ms = d["verify_ms"] + draft_ms
        d["proj_tok_s_accept3"] = round(3 * 1000 / total_ms, 1)
        d["proj_tok_s_accept5"] = round(5 * 1000 / total_ms, 1)

    # ---- offload tier: one-layer host->HBM stream vs compute ----------------
    host_layer = {k: (np.asarray(v.w8), np.asarray(v.scales), np.asarray(v.zeros))
                  if isinstance(v, AwqTensor) else np.asarray(v)
                  for k, v in lw.items()}
    t0 = time.time()
    dev = jax.tree.map(jnp.asarray, host_layer)
    jax.block_until_ready(dev)
    stream_s = time.time() - t0
    link_bw = w4_layer_bytes / stream_s
    pcie_bw = 25e9  # PCIe4 x16 effective, the reference's transport class
    offload = {
        "layer_stream_s_measured": round(stream_s, 3),
        "link_bw_MBps_measured": round(link_bw / 1e6, 1),
        "split_measured": "DMA-bound" if stream_s > layer_s else "compute-bound",
        "layer_stream_ms_pcie4_projected": round(1000 * w4_layer_bytes / pcie_bw, 2),
        "offload_step_ms_pcie4_projected": round(
            1000 * (N_LAYERS * max(layer_s, w4_layer_bytes / pcie_bw) + head_s), 1),
        "note": "sandbox host->device is a network tunnel, not PCIe/DMA "
                "(CLAUDE.md); projection uses the measured per-layer compute "
                "with PCIe4-class streaming",
    }

    result = {
        "metric": "llama70b_awq_shape_per_layer_verify_ms",
        "value": round(1000 * layer_s, 3),
        "unit": "ms/layer (S=128 W4A16 verify, slope-timed)",
        "detail": {
            "platform": jax.devices()[0].platform,
            "lm_head_ms": round(1000 * head_s, 3),
            "w4_layer_MB": round(w4_layer_bytes / 1e6, 1),
            "w4_total_GB": round(w4_total / 1e9, 2),
            "hbm_bound_floor_ms_per_layer": round(1000 * w4_layer_bytes / hbm_bw, 3),
            "extrapolated_verify_step": step,
            "offload_tier": offload,
            "baseline_L40_tok_s": 37.0,
        },
    }
    return result


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
