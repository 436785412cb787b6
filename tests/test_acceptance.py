"""Acceptance-rate evidence without hub checkpoints.

Two properties the greedy==AR oracle cannot cover:
1. STOCHASTIC correctness: under Sequoia token-match verification the first
   token committed after the root is ALWAYS the target's own sample at that
   position (accepted draft token == sampled token, or the bonus token IS the
   sample), so its marginal must match the AR sampler's filtered distribution
   exactly. Chi-square test over repeated decodes.
2. Acceptance ABOVE the floor with a correlated draft: an early-exit draft
   sharing the target's weights (reference's exit_layer trick,
   ref `llama.py:421,450-451`) must drive avg_accept_tokens well above the
   ~1/step random-draft floor, validating the accept accounting end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from umbrella_tpu.models.auto_model import early_exit_runtime, random_runtime
from umbrella_tpu.models.kv_cache import init_kv_cache
from umbrella_tpu.models.llama import llama_forward
from umbrella_tpu.ops import sampling as S
from umbrella_tpu.ops.masks import causal_mask_rows
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.static_engine import StaticEngine

from test_static_engine import MAX_LEN, _cfg


def test_stochastic_first_token_matches_ar_distribution():
    """Committed-token marginals == AR sampling marginals (chi-square)."""
    from scipy import stats

    cfg = _cfg()
    target = random_runtime(cfg, MAX_LEN, seed=0)
    draft = random_runtime(cfg, MAX_LEN, seed=1)
    temp, topk, topp = 0.8, 16, 0.9
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], temperature=temp, topk=topk, topp=topp,
        repetition_penalty=1.0, seed=7)
    eng.initialize()
    prompt = np.asarray([1, 17, 42, 9], np.int32)

    # expected distribution: target logits at position len(prompt)+... given
    # prompt + deterministic root token, run through the SAME filter math the
    # stochastic sampler uses (top-k mask -> softmax/T -> top-p renorm)
    assert eng._prefill(prompt)
    start = eng.num_nodes
    root = int(eng.tokens_host[start])
    ctx = np.concatenate([prompt, [root]]).astype(np.int32)
    Sx = len(ctx)
    logits, _ = llama_forward(
        target.params, target.args, init_kv_cache(cfg, MAX_LEN, jnp.float32),
        jnp.asarray(ctx), jnp.arange(Sx), causal_mask_rows(0, Sx, MAX_LEN), 0)
    row = logits[-1:][:]
    filt = S.apply_topk_mask(row, topk)
    probs = jax.nn.softmax(filt / temp, axis=-1)
    expected = np.asarray(S.top_p_renorm_after_topk(probs, topp, topk))[0]
    support = np.flatnonzero(expected > 1e-9)
    assert 1 < len(support) <= topk

    N = 400
    counts = np.zeros(cfg.vocab_size, np.int64)
    for _ in range(N):
        eng.reset()
        assert eng._prefill(prompt)
        eng.build_tree()
        eng.verify()
        counts[eng.tokens_host[start + 1]] += 1
    assert counts.sum() == N
    assert counts[~np.isin(np.arange(cfg.vocab_size), support)].sum() == 0, \
        "a committed token fell outside the filtered support"

    # chi-square vs the exact expected distribution (merge low-expectation bins)
    exp_counts = expected[support] * N
    obs = counts[support].astype(np.float64)
    big = exp_counts >= 5
    obs_b = np.append(obs[big], obs[~big].sum())
    exp_b = np.append(exp_counts[big], exp_counts[~big].sum())
    if exp_b[-1] == 0:
        obs_b, exp_b = obs_b[:-1], exp_b[:-1]
    stat, pval = stats.chisquare(obs_b, exp_b)
    assert pval > 1e-4, (stat, pval, list(zip(obs_b, exp_b)))


def test_stochastic_depth2_conditional_matches_ar_distribution():
    """Depth-2 stochastic marginal (VERDICT-r2 item 7): conditioned on the FIRST
    committed token, the SECOND committed token's marginal must equal the AR
    filtered distribution at that context — whether it was committed in the same
    verify step (accepted chain) or the next one (bonus path). Accept-path
    conditioning must not bias deeper positions."""
    from scipy import stats

    cfg = _cfg()
    target = random_runtime(cfg, MAX_LEN, seed=0)
    draft = random_runtime(cfg, MAX_LEN, seed=1)
    # Sharpen the target's output distribution: random tiny-model logits are
    # nearly uniform (spread ~0.05), so the modal token would recur too rarely
    # to condition on. Scaling lm_head makes the modal first token ~25% likely
    # at temp 0.5 (support still >10 tokens — a real chi-square, not a delta).
    target.params["lm_head"] = target.params["lm_head"] * 6
    temp, topk, topp = 0.5, 16, 0.9
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], temperature=temp, topk=topk, topp=topp,
        repetition_penalty=1.0, seed=11)
    eng.initialize()
    prompt = np.asarray([1, 17, 42, 9], np.int32)

    assert eng._prefill(prompt)
    start = eng.num_nodes
    root = int(eng.tokens_host[start])

    def ar_filtered(ctx):
        Sx = len(ctx)
        logits, _ = llama_forward(
            target.params, target.args, init_kv_cache(cfg, MAX_LEN, jnp.float32),
            jnp.asarray(ctx, jnp.int32), jnp.arange(Sx),
            causal_mask_rows(0, Sx, MAX_LEN), 0)
        filt = S.apply_topk_mask(logits[-1:], topk)
        probs = jax.nn.softmax(filt / temp, axis=-1)
        return np.asarray(S.top_p_renorm_after_topk(probs, topp, topk))[0]

    # condition on the MODAL first committed token (max conditioning samples)
    first_dist = ar_filtered(np.concatenate([prompt, [root]]))
    t1 = int(np.argmax(first_dist))
    expected = ar_filtered(np.concatenate([prompt, [root, t1]]))
    support = np.flatnonzero(expected > 1e-9)
    assert 1 < len(support) <= topk

    N = 700
    counts = np.zeros(cfg.vocab_size, np.int64)
    hits = 0
    for _ in range(N):
        eng.reset()
        assert eng._prefill(prompt)
        while eng.num_nodes - start < 2:
            eng.build_tree()
            eng.verify()
        if int(eng.tokens_host[start + 1]) != t1:
            continue
        hits += 1
        counts[eng.tokens_host[start + 2]] += 1
    assert hits >= 80, f"modal first token hit only {hits}/{N} times"
    assert counts[~np.isin(np.arange(cfg.vocab_size), support)].sum() == 0, \
        "a depth-2 committed token fell outside the filtered support"

    exp_counts = expected[support] * hits
    obs = counts[support].astype(np.float64)
    big = exp_counts >= 5
    obs_b = np.append(obs[big], obs[~big].sum())
    exp_b = np.append(exp_counts[big], exp_counts[~big].sum())
    if exp_b[-1] == 0:
        obs_b, exp_b = obs_b[:-1], exp_b[:-1]
    stat, pval = stats.chisquare(obs_b, exp_b)
    assert pval > 1e-4, (stat, pval, hits, list(zip(obs_b, exp_b)))


def test_exit_layer_draft_acceptance_above_floor():
    """Early-exit self-draft (shared weights, half depth) yields
    avg_accept_tokens > 2 — far above the uncorrelated-draft floor of ~1."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), num_hidden_layers=4)
    target = random_runtime(cfg, MAX_LEN, seed=3)
    # Trained models concentrate most of the final-hidden signal in early layers
    # (what makes the reference's early-exit draft work); emulate that by damping
    # the residual contribution of the layers the draft skips. A plain random
    # model has uniformly-contributing layers, so truncation would be an
    # UNcorrelated draft and acceptance would sit at the floor.
    for k in ("wo", "down"):
        target.params["layers"][k] = target.params["layers"][k].at[2:].multiply(0.05)
    draft = early_exit_runtime(target, exit_layer=2)
    assert draft.params["layers"]["wqkv"].shape[0] == 2
    eng = StaticEngine(
        draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
        growmap=growmap_from_spec(3, 4), max_length=MAX_LEN, safe_buffer=32,
        eos_token_ids=[-1], temperature=0.0)
    eng.initialize()
    assert eng._prefill(np.asarray([1, 17, 42, 9], np.int32))
    start, steps = eng.num_nodes, 0
    while eng.num_nodes - start < 24 and eng.validate_status():
        eng.build_tree()
        eng.verify()
        steps += 1
    avg_accept = (eng.num_nodes - start) / steps
    assert avg_accept > 2.0, avg_accept

    # lossless: committed tokens still match the target-only AR oracle
    from test_static_engine import _greedy_ar_decode

    produced = eng.tokens_host[start : eng.num_nodes + 1].tolist()
    oracle = _greedy_ar_decode(target, [1, 17, 42, 9], len(produced))
    assert produced == oracle[: len(produced)]
