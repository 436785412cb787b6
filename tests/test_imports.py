"""Every module imports cleanly (apps/examples are syntax-checked, not executed)."""
import ast
import importlib
import pathlib

import pytest

MODULES = [
    "umbrella_tpu",
    "umbrella_tpu.config",
    "umbrella_tpu.templates",
    "umbrella_tpu.utils",
    "umbrella_tpu.profiling",
    "umbrella_tpu.sequoia",
    "umbrella_tpu.ops",
    "umbrella_tpu.ops.select",
    "umbrella_tpu.ops.pallas.tree_attention",
    "umbrella_tpu.ops.pallas.w4a16",
    "umbrella_tpu.models.auto_model",
    "umbrella_tpu.models.weights",
    "umbrella_tpu.models.gemma",
    "umbrella_tpu.quantization",
    "umbrella_tpu.quantization.native",
    "umbrella_tpu.offload.streaming",
    "umbrella_tpu.parallel.mesh",
    "umbrella_tpu.parallel.distributed",
    "umbrella_tpu.speculation",
    "umbrella_tpu.serving.scheduler",
    "umbrella_tpu.api.server",
    "umbrella_tpu.api.client",
    "umbrella_tpu.training",
]


@pytest.mark.parametrize("mod", MODULES)
def test_import(mod):
    importlib.import_module(mod)


@pytest.mark.parametrize("script", [
    "app/chatbot.py", "app/api.py", "app/gradio_chat.py",
    "examples/generate.py", "examples/spec_generate.py", "examples/bench.py",
    "examples/spec_bench.py", "examples/spec_bench_python.py",
    "examples/hf_generate.py", "examples/construct_sequoia.py",
    "examples/bench_70b.py",
    "draft/train_draft.py", "bench.py", "__graft_entry__.py",
])
def test_script_syntax(script):
    root = pathlib.Path(__file__).resolve().parent.parent
    ast.parse((root / script).read_text())
