"""Property test of the Sequoia accept rule against an independent python oracle.

Reference semantics (static engine :313-327): node v is accepted iff
speculated[v] == sampled[parent[v]] holds for v and every ancestor; the committed
sequence is the accepted nodes in id order, followed by the bonus token sampled at
the deepest accepted node. For greedy sampling this equals the longest matching
root path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.tree import GrowMap
from umbrella_tpu.speculation.verify import verify_tail
from umbrella_tpu.models.kv_cache import KVCache


def _oracle_accept(gm: GrowMap, speculated, sampled):
    """Reference-mirroring python implementation."""
    accept = [False] * gm.size
    accept[0] = True
    for v in range(1, gm.size):
        accept[v] = sampled[gm.parents[v]] == speculated[v]
    # node ok iff itself and ALL ancestors accepted
    path = []
    for v in range(gm.size):
        anc = [u for u in range(gm.size) if gm.bitmap[v, u]]
        if all(accept[u] for u in anc):
            path.append(v)
    last = path[-1]
    return path, sampled[last]


@pytest.mark.parametrize("seed", range(8))
def test_accept_rule_matches_oracle(seed):
    gm = growmap_from_spec(3, 4)
    rng = np.random.default_rng(seed)
    V = 11  # tiny vocab => plenty of matches
    tree = gm.size
    max_len = 64
    num_nodes = 9

    speculated = rng.integers(0, V, tree).astype(np.int32)
    # build logits whose argmax IS a chosen "sampled" vector
    sampled = rng.integers(0, V, tree).astype(np.int32)
    logits = np.full((tree, V), -5.0, np.float32)
    logits[np.arange(tree), sampled] = 5.0

    tokens = np.zeros(max_len, np.int32)
    tokens[num_nodes : num_nodes + tree] = speculated

    kv = KVCache(jnp.zeros((1, 2, max_len, 8), jnp.float32),
                 jnp.zeros((1, 2, max_len, 8), jnp.float32))
    out = jax.jit(lambda *a: verify_tail(
        *a, tree_size=tree, greedy=True, topk=8, use_pen=False))(
        jnp.asarray(logits), kv, kv, jnp.asarray(tokens), jnp.int32(num_nodes),
        jax.random.PRNGKey(0), jnp.float32(1.0), jnp.float32(0.9), jnp.float32(1.0),
        jnp.asarray(gm.bitmap), jnp.asarray(gm.parents, jnp.int32),
        jnp.asarray(gm.node_in_path, jnp.int32), jnp.asarray([-1], jnp.int32))
    _tok, _kt, _kd, num_new, accept_len, eos_found, block = out

    path, bonus = _oracle_accept(gm, speculated, sampled)
    assert int(accept_len) == len(path)
    assert int(num_new) == num_nodes + len(path)
    got = np.asarray(block)[: len(path) + 1]
    expect = np.asarray([speculated[v] for v in path] + [bonus])
    np.testing.assert_array_equal(got, expect)
    assert not bool(eos_found)


def test_accept_rule_greedy_is_longest_matching_root_path():
    """With greedy target sampling, accepted nodes form exactly the longest root
    path whose tokens match the target's next-token choices."""
    gm = growmap_from_spec(3, 4)
    rng = np.random.default_rng(42)
    for _ in range(20):
        speculated = rng.integers(0, 5, gm.size)
        sampled = rng.integers(0, 5, gm.size)
        path, _ = _oracle_accept(gm, speculated, sampled)
        # every accepted node's token continues the target's choice at its parent
        for v in path[1:]:
            assert speculated[v] == sampled[gm.parents[v]]
        # maximality: no child of the deepest accepted node also matches
        deepest = path[-1]
        for child in gm.successors[deepest]:
            assert not (speculated[child] == sampled[deepest]
                        and all(u in path for u in np.nonzero(gm.bitmap[child])[0]
                                if u != child) and child not in path) or child in path
