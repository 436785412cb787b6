"""Draft training step + dp x tp sharded execution on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from umbrella_tpu.config import ModelConfig
from umbrella_tpu.models.auto_model import ModelRuntime
from umbrella_tpu.models.llama import StaticModelArgs, init_llama_params
from umbrella_tpu.parallel.mesh import (
    llama_param_specs, make_mesh, shard_kv, shard_params, shard_runtime)
from umbrella_tpu.sequoia import growmap_from_spec
from umbrella_tpu.speculation.static_engine import StaticEngine
from umbrella_tpu.training import init_train_state, make_optimizer, make_train_step

MAX_LEN = 128


def _cfg(model_axis):
    return ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=2 * model_axis, num_key_value_heads=model_axis,
        max_position_embeddings=MAX_LEN, eos_token_id=2)


def test_train_step_reduces_loss_single_device():
    cfg = _cfg(2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0), MAX_LEN, jnp.float32, packed=False)
    args = StaticModelArgs.from_config(cfg)
    opt = make_optimizer(lr=1e-2, total_steps=30)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(args, opt))
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    losses = []
    for _ in range(8):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # memorizes the fixed batch


def test_tp_dp_sharded_train_step():
    mesh = make_mesh(model=4, data=2)
    cfg = _cfg(4)
    params = shard_params(
        init_llama_params(cfg, jax.random.PRNGKey(0), MAX_LEN, jnp.float32, packed=False), mesh)
    args = StaticModelArgs.from_config(cfg)
    opt = make_optimizer(total_steps=10)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(args, opt), donate_argnums=(0,))
    batch = jax.device_put(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 32)).astype(np.int32),
        NamedSharding(mesh, P("data", None)))
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))
    # weights stayed sharded over the model axis
    wq_shard = state.params["layers"]["wq"].sharding
    assert wq_shard.spec == llama_param_specs(state.params)["layers"]["wq"]


def test_tp_sharded_inference_matches_replicated():
    """TP-sharded target produces the same greedy tokens as unsharded."""
    mesh = make_mesh(model=4, data=1)
    cfg = _cfg(4)
    base = init_llama_params(cfg, jax.random.PRNGKey(1), MAX_LEN, jnp.float32, packed=False)

    def build_engine(params, tp):
        target = ModelRuntime(cfg, params, MAX_LEN, dtype=jnp.float32)
        if tp:
            # shard_map TP path: Megatron collectives traced into the forward
            shard_runtime(target, mesh)
        draft = ModelRuntime(
            cfg, init_llama_params(cfg, jax.random.PRNGKey(2), MAX_LEN, jnp.float32, packed=False),
            MAX_LEN, dtype=jnp.float32)
        eng = StaticEngine(
            draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
            growmap=growmap_from_spec(2, 3), max_length=MAX_LEN, safe_buffer=16,
            eos_token_ids=[-1])
        eng.initialize()
        return eng

    results = []
    for tp in (False, True):
        eng = build_engine(base, tp)
        assert eng._prefill(np.asarray([1, 9, 23, 7]))
        start = eng.num_nodes
        for _ in range(3):
            eng.build_tree()
            eng.verify()
        results.append(eng.tokens_host[start : eng.num_nodes].tolist())
    assert results[0] == results[1]


def test_tp_awq_sharded_inference_matches_replicated():
    """W4 (AwqTensor) target TP-sharded over the mesh — column/row AWQ specs plus
    the row-parallel split-halves repack — produces the replicated engine's greedy
    tokens (north-star 70B-AWQ layout, scaled down)."""
    from umbrella_tpu.quantization.loader import quantize_params

    mesh = make_mesh(model=4, data=1)
    cfg = _cfg(4)
    fp = init_llama_params(cfg, jax.random.PRNGKey(3), MAX_LEN, jnp.float32,
                           packed=False)
    qparams = quantize_params(fp, group_size=32, dtype=jnp.float32,
                              quantize_lm_head=True)

    def build_engine(tp):
        target = ModelRuntime(cfg, qparams, MAX_LEN, dtype=jnp.float32)
        if tp:
            shard_runtime(target, mesh)
        draft = ModelRuntime(
            cfg, init_llama_params(cfg, jax.random.PRNGKey(4), MAX_LEN,
                                   jnp.float32, packed=False),
            MAX_LEN, dtype=jnp.float32)
        eng = StaticEngine(
            draft_model_name=draft, target_model_name=target, dtype=jnp.float32,
            growmap=growmap_from_spec(2, 3), max_length=MAX_LEN, safe_buffer=16,
            eos_token_ids=[-1])
        eng.initialize()
        return eng

    results = []
    for tp in (False, True):
        eng = build_engine(tp)
        assert eng._prefill(np.asarray([1, 9, 23, 7]))
        start = eng.num_nodes
        for _ in range(3):
            eng.build_tree()
            eng.verify()
        results.append(eng.tokens_host[start : eng.num_nodes].tolist())
    assert results[0] == results[1]


def test_sp_sharded_train_step():
    """dp x tp x sp: sequence axis of activations constrained over the model axis."""
    mesh = make_mesh(model=4, data=2)
    cfg = _cfg(4)
    params = shard_params(
        init_llama_params(cfg, jax.random.PRNGKey(0), MAX_LEN, jnp.float32, packed=False), mesh)
    args = StaticModelArgs.from_config(cfg)
    opt = make_optimizer(total_steps=10)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(args, opt, sequence_parallel=True),
                   donate_argnums=(0,))
    batch = jax.device_put(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 32)).astype(np.int32),
        NamedSharding(mesh, P("data", None)))
    with mesh:
        state, loss = step(state, batch)
    assert np.isfinite(float(loss))
