"""Real multi-process DCN coverage (VERDICT-r2 item 3): two OS processes joined
by `jax.distributed.initialize` (previously zero coverage —
`parallel/distributed.py:19-27` was only ever called as a no-op), running the
multihost-mesh train step and a TP engine whose collectives cross the process
boundary. Marked slow: spawns 2 subprocesses (~2-3 min)."""
import pytest


@pytest.mark.slow
def test_two_process_dcn_train_and_decode():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from multihost_demo import launch

    r0, r1 = launch()
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert r0["global_devices"] == 8
    # train: losses identical across hosts (replicated) and descending
    assert r0["losses"] == r1["losses"]
    assert r0["losses"][-1] < r0["losses"][0]
    # decode: TP-8 engine spanning both processes commits identical tokens
    assert r0["engine_error"] is None, r0["engine_error"]
    assert r1["engine_error"] is None, r1["engine_error"]
    assert r0["committed"] == r1["committed"]
    assert len(r0["committed"]) >= 3
    # serving stack: TP-8 BATCHED engine (B=2 continuous batching, scheduler-
    # priority admission order) — identical per-request tokens on both processes
    assert r0["batched_error"] is None, r0["batched_error"]
    assert r0["batched"] == r1["batched"]
    assert len(r0["batched"]) == 4 and all(len(t) >= 6 for t in r0["batched"])
