"""MT-Bench harness validated end-to-end on a synthetic checkpoint + REAL
tokenizer pair (VERDICT r3 item 9): the day hub checkpoints are reachable, the
reference's protocol (`/root/reference/examples/spec_bench.py:67-134`) — config
load, AutoTokenizer from the checkpoint dir, per-category accept/TPOT
aggregation over multi-turn questions — is one command away; this pins the
whole path at test scale."""
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_tokenizer(dirpath):
    """A real (WordLevel) fast tokenizer saved to the checkpoint dir, loadable
    by transformers.AutoTokenizer with zero hub egress."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    words = ("the a an and or of to in is was for on with you your it this "
             "write short blog post about visiting national park first time "
             "rewrite haiku pretend medieval blacksmith explaining craft "
             "apprentice now explain how would price custom sword").split()
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>")
    fast.save_pretrained(dirpath)
    return fast


@pytest.mark.slow
def test_spec_bench_end_to_end(tmp_path, caplog, monkeypatch):
    import logging

    caplog.set_level(logging.INFO, logger="umbrella_tpu")
    import jax.numpy as jnp  # noqa: F401  (conftest already forced CPU)

    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    from umbrella_tpu.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, eos_token_id=-1,
        tie_word_embeddings=False)
    target = os.path.join(str(tmp_path), "target")
    draft = os.path.join(str(tmp_path), "draft")
    g._write_tiny_fp_ckpt(target, cfg, seed=0)
    g._write_tiny_fp_ckpt(draft, cfg, seed=1)
    tok = _write_tokenizer(target)
    assert len(tok.encode("write a short blog post")) >= 5

    # AutoTokenizer really resolves from the local dir (the engine's own path)
    from transformers import AutoTokenizer

    tok2 = AutoTokenizer.from_pretrained(target)
    assert tok2.encode("medieval blacksmith") == tok.encode("medieval blacksmith")

    config = dict(
        engine="static", model=target, draft_model=draft,
        growmap_path=os.path.join(REPO, "umbrella_tpu", "trees",
                                  "sequoia_tree-3x4.json"),
        max_length=384, safe_buffer=32, stop_distance=16, temperature=0.0,
        eos_token_ids=[-1], dtype="float32", template="meta-llama3")
    cfg_path = os.path.join(str(tmp_path), "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)

    # dtype in JSON configs arrives as a string; spec_bench passes it through —
    # map here the way app/* do
    import importlib

    spec_bench = importlib.import_module("examples.spec_bench")
    monkeypatch.setattr(sys, "argv", [
        "spec_bench.py", "--configuration", cfg_path,
        "--data", os.path.join(REPO, "umbrella_tpu", "data", "question.jsonl"),
        "--max_new_tokens", "32", "--limit", "2"])
    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        spec_bench.main()
    finally:
        os.chdir(cwd)

    out = caplog.text
    assert "[writing]" in out and "[roleplay]" in out, out[-2000:]
    assert "[TOTAL] Avg Accept Tokens" in out
    # accept >= 1 (the harness aggregated real decode steps, not zeros)
    import re

    m = re.search(r"\[TOTAL\] Avg Accept Tokens ([0-9.]+)", out)
    assert m and float(m.group(1)) >= 1.0
