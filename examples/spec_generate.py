"""Speculative-decoding smoke demo (reference `examples/spec_generate.py`)."""
import argparse
import json
import sys

sys.path.insert(0, ".")

from umbrella_tpu.speculation.auto_engine import AutoEngine
from umbrella_tpu.templates import Prompts, SysPrompts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configuration", type=str,
                        default="configs/chat_config_8b_v5e.json")
    parser.add_argument("--prompt", type=str,
                        default="Explain the idea of speculative decoding.")
    parser.add_argument("--max_new_tokens", type=int, default=256)
    args = parser.parse_args()

    with open(args.configuration) as f:
        config = json.load(f)
    template = config.pop("template", "meta-llama3")
    config.pop("generation_length", None)
    config.pop("max_turns", None)

    engine = AutoEngine.from_config(device=None, **config)
    engine.initialize()
    engine.prefill(SysPrompts[template] + Prompts[template].format(args.prompt))
    dec_len, elapsed, steps = engine.speculative_decoding(args.max_new_tokens)
    print(f"\n{dec_len} tokens in {elapsed:.2f}s "
          f"({dec_len/elapsed:.2f} tok/s, {dec_len/steps:.2f} accept/step)")


if __name__ == "__main__":
    main()
