"""Gradio streaming chat UI (reference `app/gradio_chat.py`).

Requires `gradio` (not bundled in this image); the engine's `generate_stream`
yields (partial_text, perf_log) pairs exactly like the reference.
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

try:
    import gradio as gr
except ImportError:  # pragma: no cover
    gr = None

from umbrella_tpu.speculation.auto_engine import AutoEngine
from umbrella_tpu.templates import Prompts, SysPrompts

parser = argparse.ArgumentParser()
parser.add_argument("--configuration", type=str,
                    default="configs/chat_config_8b_v5e.json")
args = parser.parse_known_args()[0]  # import-safe (tests import this module)

with open(args.configuration) as f:
    config = json.load(f)

template = config.pop("template", "meta-llama3")
config.pop("generation_length", None)
config.pop("max_turns", None)


def _strip_perf(text: str) -> str:
    """Drop the trailing \"\\n\\n`perf log`\" suffix chat() appends for display."""
    if text.endswith("`") and "\n\n`" in text:
        return text.rsplit("\n\n`", 1)[0]
    return text


def _history_context(history) -> str:
    """Rebuild the prompt from all prior turns (the reference threads full history
    into every request, ref `app/gradio_chat.py:33-37`). Handles both gradio
    history formats: (user, assistant) pairs and role/content message dicts."""
    context = ""
    pending_user = None
    for turn in history or []:
        if isinstance(turn, dict):  # "messages" format
            content = turn.get("content", "")
            if not isinstance(content, str):
                continue
            if turn.get("role") == "user":
                pending_user = content
            elif turn.get("role") == "assistant" and pending_user is not None:
                context += Prompts[template].format(pending_user) + _strip_perf(content)
                pending_user = None
        else:  # legacy tuple format
            user_msg, bot_msg = turn
            context += Prompts[template].format(user_msg) + _strip_perf(bot_msg or "")
    return context


def make_backend(engine):
    """Engines expose generate_stream directly; a BatchedStaticEngine (config
    "engine": "batched_static") is wrapped in ContinuousBatcher + BatcherBackend
    so the chat streams partial frames from the batched deployment path too
    (reference contract: live partials in gradio, ref app/gradio_chat.py:28-59)."""
    if hasattr(engine, "generate_stream"):
        return engine
    from umbrella_tpu.serving.batched_engine import ContinuousBatcher
    from umbrella_tpu.serving.scheduler import BatcherBackend

    batcher = ContinuousBatcher(engine)
    batcher.start()
    return BatcherBackend(batcher)


def _fmt_perf(perf) -> str:
    if isinstance(perf, dict):  # batched final frame carries the result dict
        return "Avg Accept Tokens {:.2f} | TPOT {:.2f} ms".format(
            perf.get("avg_accept_tokens", 0) or 0,
            perf.get("time_per_output_token", 0) or 0)
    return str(perf)


def build_app(engine):
    def chat(message, history, temperature, topp, repetition_penalty, max_new_tokens):
        context = (SysPrompts[template] + _history_context(history)
                   + Prompts[template].format(message))
        stream = engine.generate_stream(
            context=context, max_new_tokens=int(max_new_tokens),
            temperature=float(temperature), topp=float(topp),
            repetition_penalty=float(repetition_penalty))
        for partial_text, perf_log in stream:
            yield partial_text + f"\n\n`{_fmt_perf(perf_log)}`"

    return gr.ChatInterface(
        chat,
        additional_inputs=[
            gr.Slider(0.0, 1.5, value=0.6, label="temperature"),
            gr.Slider(0.1, 1.0, value=0.9, label="top-p"),
            gr.Slider(1.0, 1.5, value=1.05, label="repetition penalty"),
            gr.Slider(16, 1024, value=256, step=16, label="max new tokens"),
        ],
        title="umbrella_tpu chat",
    )


def main():
    if gr is None:
        raise SystemExit("gradio is not installed; pip install gradio to use this app")
    engine = AutoEngine.from_config(device=None, **config)
    engine.initialize()
    build_app(make_backend(engine)).launch()


if __name__ == "__main__":
    main()
