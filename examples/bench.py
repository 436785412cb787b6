"""Single-step latency micro-bench (reference `examples/bench.py`): time one
model's forward at a given prefix/decode length."""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from umbrella_tpu.models.auto_model import AutoModelLM
from umbrella_tpu.ops.masks import causal_mask_rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="meta-llama/Llama-3.2-1B-Instruct")
    parser.add_argument("--offload", action="store_true")
    parser.add_argument("--max_length", type=int, default=2048)
    parser.add_argument("--prefix_len", type=int, default=512)
    parser.add_argument("--decode_len", type=int, default=32, help="tokens per decode step")
    parser.add_argument("--num_cache_layers", type=int, default=0)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    runtime = AutoModelLM.from_pretrained(
        args.model, offload=args.offload, max_length=args.max_length,
        num_cache_layers=args.num_cache_layers)
    kv = runtime.init_kv()
    L = args.max_length

    ids = jnp.zeros(args.decode_len, jnp.int32)
    start = jnp.int32(args.prefix_len)
    pos = start + jnp.arange(args.decode_len)
    mask = causal_mask_rows(start, args.decode_len, L)

    if runtime.supports_fused_phases:
        fwd = jax.jit(runtime.forward, donate_argnums=(1,))
        logits, kv = fwd(runtime.params, kv, ids, pos, mask, start)
        jax.block_until_ready(logits)
        t0 = time.time()
        for _ in range(args.iters):
            logits, kv = fwd(runtime.params, kv, ids, pos, mask, start)
            jax.block_until_ready(logits)
    else:
        logits, kv = runtime.streamed_forward(kv, ids, pos, mask, start)
        jax.block_until_ready(logits)
        t0 = time.time()
        for _ in range(args.iters):
            logits, kv = runtime.streamed_forward(kv, ids, pos, mask, start)
            jax.block_until_ready(logits)
    dt = (time.time() - t0) / args.iters
    print(f"decode step ({args.decode_len} tokens @ prefix {args.prefix_len}): "
          f"{1000*dt:.2f} ms  ({args.decode_len/dt:.1f} tok verified/s)")


if __name__ == "__main__":
    main()
