"""MT-Bench speculative-decoding harness (reference `examples/spec_bench.py`):
per-category Avg Accept Tokens and TPOT over a question set.

Questions load from --data (FastChat MT-Bench question.jsonl format); falls back to
the bundled sample set at umbrella_tpu/data/question.jsonl.
"""
import argparse
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

from umbrella_tpu.speculation.auto_engine import AutoEngine
from umbrella_tpu.templates import Prompts, SysPrompts
from umbrella_tpu.utils import TextColors, setup_logger

logger = setup_logger()


def load_questions(path):
    questions = []
    with open(path) as f:
        for line in f:
            if line.strip():
                questions.append(json.loads(line))
    return questions


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configuration", type=str,
                        default="configs/chat_config_8b_v5e.json")
    parser.add_argument("--data", type=str, default="umbrella_tpu/data/question.jsonl")
    parser.add_argument("--max_new_tokens", type=int, default=256)
    parser.add_argument("--limit", type=int, default=0, help="max questions (0=all)")
    args = parser.parse_args()

    with open(args.configuration) as f:
        config = json.load(f)
    template = config.pop("template", "meta-llama3")
    config.pop("generation_length", None)
    config.pop("max_turns", None)

    engine = AutoEngine.from_config(device=None, **config)
    engine.initialize()

    questions = load_questions(args.data)
    if args.limit:
        questions = questions[: args.limit]

    stats = defaultdict(lambda: dict(tokens=0, seconds=0.0, steps=0))
    for q in questions:
        cat = q.get("category", "default")
        for turn_idx, turn in enumerate(q["turns"]):
            prompt = Prompts[template].format(turn)
            if turn_idx == 0:
                ok = engine.prefill(SysPrompts[template] + prompt)
            else:
                ok = engine.append(prompt)
            if not ok:
                break
            dec_len, elapsed, steps = engine.speculative_decoding(args.max_new_tokens)
            s = stats[cat]
            s["tokens"] += dec_len
            s["seconds"] += elapsed
            s["steps"] += steps
        engine.reset()

    total_tokens = total_seconds = total_steps = 0
    for cat, s in sorted(stats.items()):
        tps = s["tokens"] / max(s["seconds"], 1e-9)
        logger.info(TextColors.colorize(
            "[{}] Avg Accept Tokens {:.2f} | TPOT {:.2f} ms | {:.2f} tok/s".format(
                cat, s["tokens"] / max(s["steps"], 1), 1000 * s["seconds"] / max(s["tokens"], 1), tps),
            "magenta"))
        total_tokens += s["tokens"]
        total_seconds += s["seconds"]
        total_steps += s["steps"]
    logger.info(TextColors.colorize(
        "[TOTAL] Avg Accept Tokens {:.2f} | TPOT {:.2f} ms | {:.2f} tok/s".format(
            total_tokens / max(total_steps, 1),
            1000 * total_seconds / max(total_tokens, 1),
            total_tokens / max(total_seconds, 1e-9)),
        "green"))


if __name__ == "__main__":
    main()
