"""Offline Sequoia tree construction (reference `examples/construct_sequoia.py`):
measure positional acceptance rates of a (draft, target) pair by teacher-forcing a
corpus through both models, then run the greedy DP tree builder.

acceptance[k] = P(target argmax is among the draft's top-(k+1)) increments
(reference :60-86 measures this on HumanEval; any text corpus works).
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from umbrella_tpu.models.auto_model import AutoModelLM
from umbrella_tpu.ops.masks import causal_mask_rows
from umbrella_tpu.sequoia import generate_sequoia_tree

DEFAULT_TEXTS = [
    "def quicksort(arr):\n    if len(arr) <= 1:\n        return arr\n    pivot = arr[len(arr) // 2]\n    left = [x for x in arr if x < pivot]\n    mid = [x for x in arr if x == pivot]\n    right = [x for x in arr if x > pivot]\n    return quicksort(left) + mid + quicksort(right)",
    "The quick brown fox jumps over the lazy dog. Pack my box with five dozen liquor jugs.",
    "In machine learning, speculative decoding accelerates autoregressive generation by letting a small draft model propose tokens that a large target model verifies in parallel.",
]


def measure_acceptance(draft, target, token_seqs, num_beams=8, max_len=1024):
    """Positional acceptance vector over a list of token id sequences."""
    counts = np.zeros(num_beams)
    total = 0
    for ids in token_seqs:
        ids = np.asarray(ids[:max_len - 8], np.int32)
        S = len(ids)
        if S < 8:
            continue
        mask = causal_mask_rows(0, S, max_len)
        pos = jnp.arange(S)
        t_logits, _ = jax.jit(target.forward)(
            target.params, target.init_kv(), jnp.asarray(ids), pos, mask, 0)
        d_logits, _ = jax.jit(draft.forward)(
            draft.params, draft.init_kv(), jnp.asarray(ids), pos, mask, 0)
        t_arg = np.asarray(jnp.argmax(t_logits, -1))
        d_top = np.asarray(jax.lax.top_k(d_logits, num_beams)[1])
        for k in range(num_beams):
            counts[k] += np.sum(d_top[:, k] == t_arg)
        total += S
    probs = counts / max(total, 1)
    return probs.tolist()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--draft_model", type=str, required=True)
    parser.add_argument("--target_model", type=str, required=True)
    parser.add_argument("--width", type=int, default=5)
    parser.add_argument("--depth", type=int, default=6)
    parser.add_argument("--num_beams", type=int, default=8)
    parser.add_argument("--corpus", type=str, default="",
                        help="text file, one document per line")
    parser.add_argument("--output", type=str, default="")
    args = parser.parse_args()

    from transformers import AutoTokenizer

    target = AutoModelLM.from_pretrained(args.target_model, max_length=1024)
    draft = AutoModelLM.from_pretrained(args.draft_model, max_length=1024)
    tokenizer = AutoTokenizer.from_pretrained(args.target_model)

    texts = (open(args.corpus).read().splitlines() if args.corpus else DEFAULT_TEXTS)
    seqs = [tokenizer.encode(t) for t in texts if t.strip()]
    acc = measure_acceptance(draft, target, seqs, num_beams=args.num_beams)
    print("measured acceptance:", [round(a, 4) for a in acc])

    out = args.output or f"sequoia_tree-{args.width}x{args.depth}.json"
    generate_sequoia_tree(args.width, args.depth, acc=acc, json_file=out)
    print("wrote", out)


if __name__ == "__main__":
    main()
