"""Multi-host layout helpers exercised on the virtual 8-device CPU mesh:
simulate 2 hosts x 4 chips and assert the TP-in-host / DP-across-host placement
BASELINE's north star prescribes, then run a real sharded train step over the
resulting mesh. (A live 2-host DCN run needs real pod hardware — documented
future work; the layout contract is what this tests.)"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from umbrella_tpu.parallel.distributed import initialize, make_multihost_mesh


def test_initialize_single_process_noop():
    initialize()  # num_processes None
    initialize(num_processes=1)  # <= 1: must not try to connect


def test_multihost_mesh_tp_rows_stay_in_host():
    """Simulated 2 hosts x 4 devices: every model row (TP group) must lie within
    one host block; the data axis must span hosts."""
    devices = jax.devices()
    assert len(devices) == 8
    for model in (4, 2):
        mesh = make_multihost_mesh(model_per_host=model, devices=devices,
                                   local_device_count=4)
        assert mesh.shape == {"data": 8 // model, "model": model}
        arr = np.asarray(mesh.devices)
        host_of = {d.id: d.id // 4 for d in devices}  # ids 0-3 host0, 4-7 host1
        for row in arr:
            hosts = {host_of[d.id] for d in row}
            assert len(hosts) == 1, f"TP row straddles hosts: {row}"
        # DP axis spans both simulated hosts
        col_hosts = {host_of[d.id] for d in arr[:, 0]}
        assert col_hosts == {0, 1}


def test_order_by_process_fixes_interleaved_enumeration():
    """Devices fed in process-interleaved order are re-grouped into contiguous
    per-host blocks (a TP row straddling hosts would put Megatron psums on DCN)."""
    from umbrella_tpu.parallel.distributed import order_by_process

    class FakeDev:
        def __init__(self, i, proc):
            self.id = i
            self.process_index = proc

    interleaved = [FakeDev(i, proc=i % 2) for i in range(8)]  # 0,1,0,1,...
    ordered = order_by_process(interleaved)
    assert [d.process_index for d in ordered] == [0] * 4 + [1] * 4
    # stable within each process
    assert [d.id for d in ordered] == [0, 2, 4, 6, 1, 3, 5, 7]


def test_train_step_over_multihost_mesh():
    """dp-across-'hosts' x tp-within-'host' sharded train step runs end-to-end
    on the mesh make_multihost_mesh lays out."""
    from umbrella_tpu.config import ModelConfig
    from umbrella_tpu.models.llama import StaticModelArgs, init_llama_params
    from umbrella_tpu.parallel.mesh import shard_params
    from umbrella_tpu.training import (init_train_state, make_optimizer,
                                       make_train_step)

    mesh = make_multihost_mesh(model_per_host=4, devices=jax.devices(),
                               local_device_count=4)
    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
        eos_token_id=2)
    params = shard_params(
        init_llama_params(cfg, jax.random.PRNGKey(0), 128, jnp.float32,
                          packed=False), mesh)
    args = StaticModelArgs.from_config(cfg)
    opt = make_optimizer(total_steps=10)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(args, opt), donate_argnums=(0,))
    batch = jax.device_put(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 32)).astype(np.int32),
        NamedSharding(mesh, P("data", None)))
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))
