"""End-to-end static-tree speculation tests on tiny random models.

Key property (the whole point of speculative decoding): greedy spec-decode output is
IDENTICAL to the target model's plain greedy autoregressive decode, for any draft.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import random_runtime
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.models.llama import llama_forward
from umbrella_tpu.ops.masks import causal_mask_rows
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.static_engine import StaticEngine
from umbrella_tpu.speculation.tree import GrowMap

MAX_LEN = 256


def _cfg(seed_vocab=97):
    return ModelConfig(
        vocab_size=seed_vocab, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=MAX_LEN, eos_token_id=2,
    )


def _greedy_ar_decode(runtime, prompt, n_new):
    """Plain autoregressive greedy decode with our forward — the oracle."""
    kv = runtime.init_kv()
    S = len(prompt)
    logits, kv = llama_forward(
        runtime.params, runtime.args, kv, jnp.asarray(prompt, jnp.int32),
        jnp.arange(S), causal_mask_rows(0, S, MAX_LEN), 0)
    out = []
    tok = int(np.argmax(np.asarray(logits[-1])))
    out.append(tok)
    for t in range(S, S + n_new - 1):
        lg, kv = llama_forward(
            runtime.params, runtime.args, kv, jnp.asarray([tok], jnp.int32),
            jnp.asarray([t]), causal_mask_rows(t, 1, MAX_LEN), t)
        tok = int(np.argmax(np.asarray(lg[0])))
        out.append(tok)
    return out


def _make_engine(target, draft, **kw):
    gm = growmap_from_spec(3, 4)
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=gm, max_length=MAX_LEN, safe_buffer=32, eos_token_ids=[-1], **kw)
    eng.initialize()
    return eng


@pytest.fixture(scope="module")
def runtimes():
    cfg = _cfg()
    target = random_runtime(cfg, MAX_LEN, seed=0)
    draft = random_runtime(cfg, MAX_LEN, seed=1)
    return target, draft


def test_greedy_spec_decode_matches_ar_decode(runtimes):
    target, draft = runtimes
    eng = _make_engine(target, draft)
    prompt = [1, 17, 42, 9, 55]
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    n_steps = 0
    while (eng.num_nodes - start) < 40 and eng.validate_status():
        eng.build_tree()
        eng.verify()
        n_steps += 1
    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(target, prompt, len(produced))
    assert produced == oracle[: len(produced)]
    # progress: at least 1 token (bonus) per large-model step
    assert eng.num_nodes - start >= n_steps


def test_self_draft_accepts_full_path(runtimes):
    """Draft == target => greedy accept rate equals the tree's max path depth."""
    target, _ = runtimes
    eng = _make_engine(target, target)
    assert eng._prefill(np.asarray([3, 7, 11]))
    eng.build_tree()
    eng.verify()
    # full acceptance commits exactly one node per tree level (root + the whole
    # deepest speculated path) — anything less means the accept rule lost a node
    assert eng.num_nodes == 3 + eng.growmap.num_levels


def test_generate_api_contract(runtimes):
    target, draft = runtimes
    eng = _make_engine(target, draft)
    out = eng.generate(input_ids=[1, 5, 9], max_new_tokens=16)
    assert "generated_tokens" in out and len(out["generated_tokens"]) >= 16
    assert out["avg_accept_tokens"] >= 1.0
    assert out["time_per_output_token"] > 0
    assert eng.num_nodes == 0  # reset after request

    empty = eng.generate(input_ids=[], max_new_tokens=16)
    assert empty["generated_tokens"] == [] and empty["avg_accept_tokens"] == 0


def test_append_multiturn_matches_oracle(runtimes):
    """Multi-turn: prefill+decode, append, decode — stays token-identical with an
    oracle run over the concatenated committed prefix."""
    target, draft = runtimes
    eng = _make_engine(target, draft)
    assert eng._prefill(np.asarray([1, 17, 42]))
    start0 = eng.num_nodes
    for _ in range(3):
        eng.build_tree()
        eng.verify()
    assert eng._append(np.asarray([0, 8, 23]))  # BOS-stripped"user turn"
    start1 = eng.num_nodes
    for _ in range(3):
        eng.build_tree()
        eng.verify()

    # oracle: greedy AR continuation of the full committed prefix up to start1
    prefix = eng.tokens_host[:start1].tolist()
    produced = eng.tokens_host[start1 : eng.num_nodes].tolist()
    oracle = _greedy_ar_decode(target, prefix, len(produced) + 1)
    assert produced == oracle[: len(produced)]


def test_stochastic_spec_decode_runs(runtimes):
    target, draft = runtimes
    eng = _make_engine(target, draft)
    eng.temperature = 0.8
    eng.topk = 16
    eng.topp = 0.9
    eng.repetition_penalty = 1.05
    assert eng._prefill(np.asarray([1, 2, 3, 4]))
    start = eng.num_nodes
    for _ in range(4):
        eng.build_tree()
        eng.verify()
    assert eng.num_nodes - start >= 4  # at least bonus token per step
    toks = eng.tokens_host[start : eng.num_nodes]
    assert (toks >= 0).all() and (toks < target.cfg.vocab_size).all()


def test_sequoia_builder_schema():
    gm = growmap_from_spec(4, 6)
    assert gm.size == 25
    assert gm.num_levels == 7
    d = gm.to_dict()
    assert set(d) == {"roots", "branches", "Successors", "mask", "depth", "size"}
    # branch totals must equal next level sizes
    for lvl in range(gm.num_levels - 1):
        assert gm.total_branch(lvl) == len(gm.roots[lvl + 1])


def test_generate_stream_yields_progressively(runtimes):
    target, draft = runtimes

    class _Tok:
        def encode(self, text):
            return [1] + [ord(c) % 90 + 2 for c in text][:12]

        def decode(self, ids, **kw):
            return " ".join(str(i) for i in ids)

    eng = _make_engine(target, draft, tokenizer=_Tok())
    outputs = list(eng.generate_stream(context="hello world test", max_new_tokens=24))
    assert len(outputs) >= 1
    final_text, perf = outputs[-1]
    assert "TPOT" in perf and len(final_text) > 0
    assert eng.num_nodes == 0  # reset at end


def test_bundled_large_trees_load_and_validate():
    """TPU-sized bundled trees (the W4A16 verify kernel is flat in tree size up to
    ~128 nodes, see ops/pallas/w4a16.py) load by bare name and validate."""
    for name, size in [("sequoia_tree-8x8.json", 65), ("sequoia_tree-18x7.json", 127)]:
        gm = GrowMap.from_json(name)
        gm.validate()
        assert gm.size == size


def test_large_tree_greedy_parity(runtimes):
    """65-node bundled tree: greedy spec decode stays lossless vs the AR oracle."""
    target, draft = runtimes
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=GrowMap.from_json("sequoia_tree-8x8.json"), max_length=MAX_LEN,
        safe_buffer=96, eos_token_ids=[-1])
    eng.initialize()
    prompt = [1, 17, 42]
    assert eng._prefill(np.asarray(prompt))
    start = eng.num_nodes
    for _ in range(3):
        eng.build_tree()
        eng.verify()
    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(target, prompt, len(produced))
    assert produced == oracle[: len(produced)]


def test_wide_tree_generator_widens_over_levels():
    """width > len(acc): levels widen as beams allow (1,6,24,...) with no phantom
    slots, node ids stay contiguous and parent-grouped per level."""
    from umbrella_tpu.sequoia import generate_sequoia_tree

    acc = [0.55, 0.2, 0.1, 0.06, 0.05, 0.04]
    t = generate_sequoia_tree(24, 6, acc=acc)
    assert t["size"] == 127  # 1 + 6 + 24*5
    assert [len(r) for r in t["roots"]] == [1, 6, 24, 24, 24, 24, 24]
    assert t["size"] == len(t["depth"]) == len(t["Successors"])
    # ids contiguous per level
    flat = [n for lvl in t["roots"] for n in lvl]
    assert flat == list(range(t["size"]))
    # every non-root node has exactly one parent; children grouped by parent
    gm = growmap_from_spec(24, 6, acc=acc)
    gm.validate()
    for lvl in range(gm.num_levels - 1):
        assert gm.total_branch(lvl) == len(gm.roots[lvl + 1])
    # bundled 24x6 tree file matches the generator
    bundled = GrowMap.from_json("sequoia_tree-24x6.json")
    bundled.validate()
    assert bundled.size == 127
