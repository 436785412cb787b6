"""App-level behavior: gradio chat must thread FULL conversation history into each
request's prompt (reference rebuilds the prompt from all prior turns,
ref `app/gradio_chat.py:33-37`)."""
import importlib.util
import pathlib
import sys


def _load_gradio_chat():
    root = pathlib.Path(__file__).resolve().parent.parent
    old_argv, old_cwd = sys.argv, None
    sys.argv = ["gradio_chat.py", "--configuration",
                str(root / "configs" / "chat_config_8b_v5e.json")]
    try:
        spec = importlib.util.spec_from_file_location(
            "gradio_chat_under_test", root / "app" / "gradio_chat.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.argv = old_argv


def test_gradio_history_threads_prior_turns():
    gc = _load_gradio_chat()
    # tuple-format history; displayed bot text carries the perf-log suffix
    ctx = gc._history_context([
        ("what is 2+2", "it is 4\n\n`Output Tokens 5 | TPOT 1.0 ms`"),
        ("and doubled?", "8"),
    ])
    assert "what is 2+2" in ctx
    assert "it is 4" in ctx
    assert "and doubled?" in ctx and "8" in ctx
    assert "TPOT" not in ctx  # perf log stripped from the prompt
    # turn order preserved
    assert ctx.index("what is 2+2") < ctx.index("it is 4") < ctx.index("and doubled?")

    # messages-format history (modern gradio ChatInterface)
    msgs = [
        {"role": "user", "content": "first question"},
        {"role": "assistant", "content": "first answer"},
        {"role": "user", "content": "second question"},
        {"role": "assistant", "content": "second answer"},
    ]
    ctx2 = gc._history_context(msgs)
    for piece in ("first question", "first answer", "second question", "second answer"):
        assert piece in ctx2

    assert gc._history_context([]) == ""
    assert gc._history_context(None) == ""
