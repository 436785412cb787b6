"""CLI multi-turn chatbot (reference `app/chatbot.py`).

Usage: python app/chatbot.py --configuration configs/chat_config_8b_v5e.json
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

from umbrella_tpu.speculation.auto_engine import AutoEngine
from umbrella_tpu.templates import ExtraPrompts, Prompts, SysPrompts
from umbrella_tpu.utils import TextColors

parser = argparse.ArgumentParser()
parser.add_argument("--configuration", type=str,
                    default="configs/chat_config_8b_v5e.json")
args = parser.parse_args()

with open(args.configuration) as f:
    config = json.load(f)

template = config.pop("template", "meta-llama3")
generation_length = config.pop("generation_length", 256)
max_turns = config.pop("max_turns", 16)
system_prompt = SysPrompts.get(template, "")
user_template = Prompts.get(template, "{}")
extra = ExtraPrompts.get(template, "")


def main():
    engine = AutoEngine.from_config(device=None, **config)
    engine.initialize()
    for turn in range(max_turns):
        try:
            text = input(TextColors.colorize("User: ", "green"))
        except EOFError:
            break
        if text.strip().lower() in ("exit", "quit"):
            break
        prompt = user_template.format(text + extra)
        if turn == 0:
            ok = engine.prefill(system_prompt + prompt)
        else:
            ok = engine.append(prompt)
        if not ok:
            print(TextColors.colorize("Context limit reached.", "red"))
            break
        print(TextColors.colorize("Assistant: ", "cyan"), end="", flush=True)
        engine.speculative_decoding(max_new_tokens=generation_length)


if __name__ == "__main__":
    main()
