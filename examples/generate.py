"""Plain autoregressive generation demo (reference `examples/generate.py`):
loads one model and greedy/stochastic-decodes a prompt, logging TPOT."""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from umbrella_tpu.models.auto_model import AutoModelLM
from umbrella_tpu.models.llama import llama_forward
from umbrella_tpu.ops.masks import causal_mask_rows
from umbrella_tpu.utils import TextColors, setup_logger

logger = setup_logger()


def autoregressive_decode(runtime, input_ids, max_new_tokens=128, greedy=True,
                          temperature=0.6, topk=32, topp=0.9, seed=0):
    """Token-at-a-time decode with jitted step; returns (tokens, tpot_ms)."""
    from umbrella_tpu.ops import sampling as S

    fwd = runtime.forward
    L = runtime.max_length
    kv = runtime.init_kv()

    @jax.jit
    def prefill(params, kv, ids, start):
        S_ = ids.shape[0]
        mask = causal_mask_rows(start, S_, L)
        pos = start + jnp.arange(S_)
        logits, kv = fwd(params, kv, ids, pos, mask, start)
        return logits[-1], kv

    @jax.jit
    def step(params, kv, tok, t, key):
        mask = causal_mask_rows(t, 1, L)
        logits, kv = fwd(params, kv, tok[None], t + jnp.zeros(1, jnp.int32), mask, t)
        if greedy:
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
        else:
            nxt = S.sample_top_k_top_p(key, logits[:1], temperature, topk, topp)[0].astype(jnp.int32)
        return nxt, kv

    ids = jnp.asarray(input_ids, jnp.int32)
    last, kv = prefill(runtime.params, kv, ids, jnp.int32(0))
    tok = jnp.argmax(last).astype(jnp.int32)
    out = [int(tok)]
    key = jax.random.PRNGKey(seed)
    jax.block_until_ready(tok)
    t0 = time.time()
    for t in range(len(input_ids), len(input_ids) + max_new_tokens - 1):
        key, sub = jax.random.split(key)
        tok, kv = step(runtime.params, kv, tok, jnp.int32(t), sub)
        out.append(int(tok))
    jax.block_until_ready(tok)
    dt = time.time() - t0
    return out, 1000 * dt / max(len(out) - 1, 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="meta-llama/Llama-3.2-1B-Instruct")
    parser.add_argument("--prompt", type=str, default="Tell me what you know about Reinforcement Learning in 100 words.")
    parser.add_argument("--max_new_tokens", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.0)
    args = parser.parse_args()

    from transformers import AutoTokenizer

    runtime = AutoModelLM.from_pretrained(args.model, max_length=2048)
    tokenizer = AutoTokenizer.from_pretrained(args.model)
    ids = tokenizer.encode(args.prompt)
    toks, tpot = autoregressive_decode(
        runtime, ids, max_new_tokens=args.max_new_tokens,
        greedy=args.temperature < 0.05, temperature=args.temperature)
    print(tokenizer.decode(toks, skip_special_tokens=True))
    logger.info(TextColors.colorize(f"TPOT {tpot:.2f} ms", "magenta"))


if __name__ == "__main__":
    main()
