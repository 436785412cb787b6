"""Code-completion speculative-decoding harness
(reference `examples/spec_bench_python.py`): feeds code prompts (>=20 tokens) and
reports Avg Accept Tokens and tok/s. Dataset: a JSONL file with {"prompt": ...}
records (the reference streams `ananyarn/Algorithm_and_Python_Source_Code`; offline,
point --data at any code-prompt JSONL)."""
import argparse
import json
import sys

sys.path.insert(0, ".")

from umbrella_tpu.speculation.auto_engine import AutoEngine
from umbrella_tpu.templates import ExtraPrompts, Prompts, SysPrompts
from umbrella_tpu.utils import TextColors, setup_logger

logger = setup_logger()

DEFAULT_PROMPTS = [
    "Write a Python function to compute the edit distance between two strings using dynamic programming.",
    "Implement Dijkstra's shortest path algorithm over an adjacency list with a binary heap.",
    "Write a Python class implementing an LRU cache with O(1) get and put.",
    "Implement quicksort with median-of-three pivot selection in Python.",
    "Write a function that parses an ISO-8601 timestamp without using datetime.fromisoformat.",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configuration", type=str,
                        default="configs/code_config_8b_awq_v5e.json")
    parser.add_argument("--data", type=str, default="")
    parser.add_argument("--max_new_tokens", type=int, default=512)
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    with open(args.configuration) as f:
        config = json.load(f)
    template = config.pop("template", "llama3-code")
    config.pop("generation_length", None)
    config.pop("max_turns", None)

    engine = AutoEngine.from_config(device=None, **config)
    engine.initialize()

    if args.data:
        prompts = [json.loads(l)["prompt"] for l in open(args.data) if l.strip()]
    else:
        prompts = DEFAULT_PROMPTS
    if args.limit:
        prompts = prompts[: args.limit]

    tok = engine.tokenizer
    total_tokens = total_seconds = total_steps = 0
    for prompt in prompts:
        if tok is not None and len(tok.encode(prompt)) < 20:
            continue  # reference filters out short prompts (spec_bench_python.py:28)
        text = SysPrompts[template] + Prompts[template].format(
            prompt + ExtraPrompts.get(template, ""))
        if not engine.prefill(text):
            continue
        dec_len, elapsed, steps = engine.speculative_decoding(args.max_new_tokens)
        total_tokens += dec_len
        total_seconds += elapsed
        total_steps += steps
        engine.reset()

    logger.info(TextColors.colorize(
        "[CODE] Avg Accept Tokens {:.2f} | TPOT {:.2f} ms | {:.2f} tok/s".format(
            total_tokens / max(total_steps, 1),
            1000 * total_seconds / max(total_tokens, 1),
            total_tokens / max(total_seconds, 1e-9)),
        "green"))


if __name__ == "__main__":
    main()
