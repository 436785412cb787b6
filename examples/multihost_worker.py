"""Two-process DCN worker: the first REAL exercise of `jax.distributed.initialize`
(SURVEY §7 build order 5 — "multi-host launch via jax.distributed").

Each OS process simulates one host with 4 virtual CPU devices; the coordinator
connects them into an 8-device cluster. The worker then:
  1. builds `make_multihost_mesh(model_per_host=4)` -> (data=2 hosts, model=4)
     — TP rows stay within a "host", DP rides the cross-process (DCN) axis;
  2. runs the sharded TP/SP train step over that mesh (cross-process psums);
  3. runs a config-driven tensor_parallel=8 engine whose Megatron collectives
     span BOTH processes, and decodes greedily;
  4. writes committed tokens + losses to --out so the launcher can assert both
     processes agree.

Launched by examples/multihost_demo.py (or tests/test_two_process_dcn.py):
  python examples/multihost_worker.py --process-id {0,1} --coordinator localhost:PORT
"""
import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--coordinator", type=str, required=True)
    p.add_argument("--ckpt-dir", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    args = p.parse_args()

    import jax

    # CPU backend with N virtual devices per process — BEFORE distributed init.
    # (JAX_PLATFORMS env var is ignored on this image; set the config directly.)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)

    from umbrella_tpu.parallel.distributed import initialize, make_multihost_mesh

    initialize(coordinator_address=args.coordinator, num_processes=2,
               process_id=args.process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * args.local_devices  # global view
    assert jax.local_device_count() == args.local_devices

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from umbrella_tpu.config import ModelConfig
    from umbrella_tpu.models.llama import StaticModelArgs, init_llama_params
    from umbrella_tpu.parallel.mesh import shard_params
    from umbrella_tpu.training import (init_train_state, make_optimizer,
                                       make_train_step)

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=256, eos_token_id=-1)
    max_len = 128

    # ---- 1+2) multihost mesh + TP/SP train step (DP over the DCN axis) ------
    mesh = make_multihost_mesh(model_per_host=args.local_devices)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "model": args.local_devices}
    # every TP row must live in ONE process (psums on ICI, not DCN)
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1

    params = init_llama_params(cfg, jax.random.PRNGKey(0), max_len, jnp.float32,
                               packed=False)
    params = shard_params(params, mesh)
    margs = StaticModelArgs.from_config(cfg)
    optimizer = make_optimizer(total_steps=4)
    state = init_train_state(params, optimizer)
    train_step = jax.jit(make_train_step(margs, optimizer, sequence_parallel=True),
                         donate_argnums=(0,))
    batch_host = np.random.default_rng(0).integers(
        0, cfg.vocab_size, size=(4, 32)).astype(np.int32)
    batch = jax.device_put(batch_host, NamedSharding(mesh, P("data", None)))
    losses = []
    with mesh:
        for _ in range(3):  # step 0 is lr-warmup (lr=0): needs >=3 to descend
            state, loss = train_step(state, batch)
            losses.append(float(loss))  # replicated -> same value on both hosts
    assert losses[-1] < losses[0], losses  # it actually optimizes

    # ---- 3) config-driven TP engine spanning both processes -----------------
    committed = None
    engine_error = None
    try:
        from umbrella_tpu.speculation.auto_engine import AutoEngine

        eng = AutoEngine.from_config(
            model=args.ckpt_dir, draft_model=args.ckpt_dir, engine="static",
            tensor_parallel=2 * args.local_devices,
            growmap_path="umbrella_tpu/trees/sequoia_tree-3x4.json",
            max_length=max_len, safe_buffer=32, temperature=0.0,
            eos_token_ids=[-1], tokenizer=object(), dtype=jnp.float32)
        eng.initialize()
        assert eng._prefill(np.asarray([1, 2, 3, 4], np.int32))
        start = eng.num_nodes
        for _ in range(3):
            eng.build_tree()
            eng.verify()
        committed = eng.tokens_host[start: eng.num_nodes].tolist()
    except Exception as e:  # keep the train-step evidence even if engine fails
        engine_error = f"{type(e).__name__}: {e}"[:500]

    # ---- 4) TP-batched SERVING stack spanning both processes ----------------
    # Continuous batching (B slots, multiple admission waves) over a
    # tensor_parallel=8 mesh whose Megatron collectives cross the process
    # boundary. Admission ORDER comes from the scheduler's priority rule
    # (priority, arrival seq) — policy output is a pure function of the
    # identical request list, so both controllers compute the same plan; the
    # engine's closed-loop run() then steps deterministically (multi-controller
    # SPMD requires identical dispatch sequences on every process, which the
    # timing-driven background batcher thread cannot guarantee).
    batched = None
    batched_error = None
    try:
        from umbrella_tpu.speculation.auto_engine import AutoEngine

        class _Tok:
            def decode(self, ids, **kw):
                return " ".join(str(i) for i in ids)

        beng = AutoEngine.from_config(
            model=args.ckpt_dir, draft_model=args.ckpt_dir,
            engine="batched_static", tensor_parallel=2 * args.local_devices,
            batch_size=2, segment_steps=2,
            growmap_path="umbrella_tpu/trees/sequoia_tree-3x4.json",
            max_length=max_len, safe_buffer=32, temperature=0.0,
            eos_token_ids=[-1], tokenizer=_Tok(), dtype=jnp.float32)
        beng.initialize()
        reqs = [dict(input_ids=[1, 2, 3, 4], max_new_tokens=6, _priority=5),
                dict(input_ids=[9, 8, 7], max_new_tokens=6, _priority=1),
                dict(input_ids=[5, 5, 5, 5, 5], max_new_tokens=6, _priority=5),
                dict(input_ids=[2, 4, 6], max_new_tokens=6, _priority=1)]
        order = sorted(range(len(reqs)),
                       key=lambda i: (reqs[i]["_priority"], i))
        res_ord = beng.run([reqs[i] for i in order])
        res = [None] * len(reqs)
        for rank, i in enumerate(order):
            res[i] = res_ord[rank]
        batched = [r["generated_tokens"] for r in res]
        assert all(r["time_per_output_token"] > 0 for r in res)
    except Exception as e:
        batched_error = f"{type(e).__name__}: {e}"[:500]

    with open(args.out, "w") as f:
        json.dump({"process_id": args.process_id,
                   "process_count": jax.process_count(),
                   "global_devices": len(jax.devices()),
                   "losses": losses,
                   "committed": committed,
                   "engine_error": engine_error,
                   "batched": batched,
                   "batched_error": batched_error}, f)
    print("worker", args.process_id, "ok")


if __name__ == "__main__":
    main()
