"""Launch the REAL two-process DCN run (examples/multihost_worker.py x2).

Spawns two OS processes, each a simulated 4-device host, connected by
`jax.distributed.initialize` over a localhost coordinator; asserts both
processes trained over the (data=2, model=4) multihost mesh and committed
IDENTICAL tokens from a tensor_parallel=8 engine whose collectives span the
process boundary. Writes DCN_2PROC.json at the repo root. Run:
`python examples/multihost_demo.py`.
"""
import json
import os
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")


def launch(timeout=420):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from __graft_entry__ import _write_tiny_fp_ckpt
    from umbrella_tpu.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=256, eos_token_id=-1)
    tmp = tempfile.mkdtemp()
    ck = os.path.join(tmp, "ckpt")
    _write_tiny_fp_ckpt(ck, cfg, seed=3)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    outs = [os.path.join(tmp, f"out{i}.json") for i in (0, 1)]
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(repo, "examples", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, "--process-id", str(i),
         "--coordinator", f"localhost:{port}", "--ckpt-dir", ck,
         "--out", outs[i]],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in (0, 1)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode())
        assert p.returncode == 0, logs[-1][-3000:]
    results = [json.load(open(o)) for o in outs]
    return results


def main():
    results = launch()
    r0, r1 = results
    assert r0["process_count"] == 2 and r0["global_devices"] == 8
    assert r0["losses"] == r1["losses"] and r0["losses"][-1] < r0["losses"][0]
    assert r0["engine_error"] is None and r1["engine_error"] is None
    assert r0["committed"] == r1["committed"] and len(r0["committed"]) >= 3
    assert r0["batched_error"] is None and r1["batched_error"] is None, (
        r0["batched_error"], r1["batched_error"])
    assert r0["batched"] == r1["batched"]
    assert all(len(t) >= 6 for t in r0["batched"])
    artifact = {
        "metric": "two_process_dcn_run",
        "ok": True,
        "process_count": 2,
        "global_devices": 8,
        "losses": r0["losses"],
        "committed_tokens_identical": True,
        "committed_len": len(r0["committed"]),
        "batched_serving_tokens_identical": True,
        "batched_requests": len(r0["batched"]),
        "detail": "jax.distributed.initialize x2 (localhost coordinator), "
                  "(data=2, model=4) multihost mesh TP/SP train step + "
                  "tensor_parallel=8 engine spanning both processes + "
                  "TP-8 BATCHED serving stack (B=2 continuous batching, "
                  "scheduler-priority admission order) with identical "
                  "per-request tokens on both processes",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "DCN_2PROC.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
