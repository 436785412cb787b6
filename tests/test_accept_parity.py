"""Accept-rule A/B parity vs the reference, offline (VERDICT-r2 item 6).

The reference's accept computation (`static_speculation_engine.py:313-327`):
  ref_tokens = sampled[parents]; accept = (ref == spec); accept[0] = True
  accept_node_in_path = (accept * tree_mask).sum(-1)
  accept_path = nonzero(accept_node_in_path == node_in_path)
  bonus = sampled[accept_path[-1]]; committed = spec[accept_path] + [bonus]
  EOS in committed[:len+1] at p => truncate accept_path to p, stop.

`_ref_accept` below re-expresses that rule in plain numpy (no torch); both it and
`verify_tail` are fed IDENTICAL (speculated tokens, sampled target tokens,
growmap) cases — random, full-path-accept, and EOS-mid-path — for EVERY bundled
tree, asserting identical accept_len / committed block / stop flag / KV
compaction order. This closes acceptance parity to the extent an offline sandbox
allows (no hub checkpoints => no MT-Bench A/B)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.speculation.tree import GrowMap
from umbrella_tpu.speculation.verify import verify_tail

TREE_DIR = os.path.join(os.path.dirname(__file__), "..", "umbrella_tpu", "trees")
ALL_TREES = sorted(glob.glob(os.path.join(TREE_DIR, "*.json")))
EOS_SET = (3, 4)
NUM_NODES = 7  # committed prefix length when verify runs


def _ref_accept(spec, sampled, gm):
    """Reference accept rule re-expressed in numpy (see module docstring)."""
    mask = np.asarray(gm.bitmap, bool)
    parents = np.asarray(gm.parents)
    node_in_path = np.asarray(gm.node_in_path)
    accept = sampled[parents] == spec
    accept[0] = True
    anc = (mask * accept[None, :]).sum(-1)
    accept_path = np.nonzero(anc == node_in_path)[0]
    bonus = sampled[accept_path[-1]]
    accept_length = len(accept_path)
    committed = np.concatenate([spec[accept_path], [bonus]])
    cont = True
    for i, t in enumerate(committed[: accept_length + 1]):
        if int(t) in EOS_SET:
            cont = False
            accept_path = accept_path[:i]
            accept_length = i
            break
    return accept_path, accept_length, committed, cont


def _our_accept(spec, sampled, gm, vocab):
    """Drive verify_tail with one-hot logits that force `sampled` under greedy."""
    T = gm.size
    max_len = NUM_NODES + 2 * T + 8
    logits = np.zeros((T, vocab), np.float32)
    logits[np.arange(T), sampled] = 1.0
    tokens = np.zeros(max_len, np.int32)
    tokens[NUM_NODES: NUM_NODES + T] = spec
    cfg = ModelConfig(
        vocab_size=vocab, hidden_size=8, intermediate_size=16, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, max_position_embeddings=max_len,
        eos_token_id=list(EOS_SET))
    kv = init_kv_cache(cfg, max_len, jnp.float32, num_layers=1)
    # mark each tree slot's KV with its local index so compaction order is visible
    marks = jnp.arange(T, dtype=jnp.float32)
    kv = kv._replace(k=kv.k.at[0, 0, NUM_NODES: NUM_NODES + T, 0].set(marks))
    out = verify_tail(
        jnp.asarray(logits), kv, kv, jnp.asarray(tokens), jnp.int32(NUM_NODES),
        jax.random.PRNGKey(0), jnp.float32(1e-3), jnp.float32(0.9),
        jnp.float32(1.0), jnp.asarray(gm.bitmap), jnp.asarray(gm.parents, jnp.int32),
        jnp.asarray(gm.node_in_path, jnp.int32),
        jnp.asarray(np.asarray(EOS_SET, np.int32)),
        tree_size=T, greedy=True, topk=8, use_pen=False)
    tokens2, kv_t, _kv_d, nn_new, accept_len, eos_found, block = out
    kv_marks = np.asarray(kv_t.k)[0, 0, NUM_NODES: NUM_NODES + T, 0]
    return (int(accept_len), np.asarray(block), bool(eos_found), int(nn_new),
            kv_marks)


def _spec_tokens(gm, rng, vocab, lo=0):
    """Per-node speculated tokens with DISTINCT siblings (real trees propose a
    parent's top-k candidates, which are distinct; duplicate siblings would make
    the accepted set a non-chain — both rules still agree, but it's not a
    reachable state)."""
    T = gm.size
    parents = np.asarray(gm.parents)
    spec = np.zeros(T, np.int32)
    spec[0] = rng.integers(lo, vocab)
    for p in range(T):
        kids = np.nonzero((parents == p) & (np.arange(T) != p))[0]
        if len(kids):
            spec[kids] = rng.choice(np.arange(lo, vocab), size=len(kids),
                                    replace=False)
    return spec


def _biased_sampled(spec, gm, rng, vocab):
    """Target samples that hit a child's proposal ~60% of the time — generates
    deep accepted chains (plus random EOS hits) like a decent draft would."""
    T = gm.size
    parents = np.asarray(gm.parents)
    sampled = rng.integers(0, vocab, T).astype(np.int32)
    for p in range(T):
        kids = np.nonzero((parents == p) & (np.arange(T) != p))[0]
        if len(kids) and rng.random() < 0.6:
            sampled[p] = spec[rng.choice(kids)]
    return sampled


def _cases(gm, rng, vocab):
    T = gm.size
    parents = np.asarray(gm.parents)
    depth = np.asarray(gm.depth)
    cases = []
    # random/biased cases: varied accept lengths incl. random EOS hits
    for _ in range(12):
        spec = _spec_tokens(gm, rng, vocab)
        cases.append((spec, _biased_sampled(spec, gm, rng, vocab)))
    # full-path accept: make one max-depth root-to-leaf path fully match
    leaf = int(np.argmax(depth))
    spec = _spec_tokens(gm, rng, vocab, lo=5)  # avoid EOS ids 3,4
    sampled = rng.integers(5, vocab, T).astype(np.int32)
    v = leaf
    while v != 0:
        sampled[parents[v]] = spec[v]
        v = int(parents[v])
    cases.append((spec, sampled))
    # EOS mid-path: same full path but an interior accepted node speaks EOS
    spec2, sampled2 = spec.copy(), sampled.copy()
    mid = int(parents[leaf])
    if mid != 0:
        spec2[mid] = EOS_SET[0]
        sampled2[parents[mid]] = EOS_SET[0]
        cases.append((spec2, sampled2))
    # EOS as the bonus token
    spec3, sampled3 = spec.copy(), sampled.copy()
    sampled3[leaf] = EOS_SET[1]
    cases.append((spec3, sampled3))
    return cases


@pytest.mark.parametrize("tree_path", ALL_TREES,
                         ids=[os.path.basename(p) for p in ALL_TREES])
def test_accept_rule_matches_reference(tree_path):
    gm = GrowMap.from_json(tree_path)
    rng = np.random.default_rng(hash(os.path.basename(tree_path)) % (2**31))
    parents = np.asarray(gm.parents)
    max_kids = max(int(((parents == p) & (np.arange(gm.size) != p)).sum())
                   for p in range(gm.size))
    vocab = max(10, max_kids + 6)
    full_path_seen = 0
    for spec, sampled in _cases(gm, rng, vocab):
        spec = spec.astype(np.int32)
        sampled = sampled.astype(np.int32)
        ref_path, ref_len, ref_committed, ref_cont = _ref_accept(spec, sampled, gm)
        accept_len, block, eos_found, nn_new, kv_marks = _our_accept(
            spec, sampled, gm, vocab)
        assert accept_len == ref_len
        assert eos_found == (not ref_cont)
        assert nn_new == NUM_NODES + ref_len
        # committed block (pre-truncation accepted tokens + bonus) identical
        np.testing.assert_array_equal(block[: len(ref_committed)], ref_committed)
        # KV compaction order == reference accept_path (post-EOS-truncation)
        np.testing.assert_array_equal(kv_marks[:ref_len],
                                      ref_path[:ref_len].astype(np.float32))
        if ref_len == int(np.asarray(gm.depth).max()) + 1:
            full_path_seen += 1
    assert full_path_seen >= 1  # the forced full-path case exercised max depth
