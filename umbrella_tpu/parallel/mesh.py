"""Device mesh + tensor-parallel sharding layout.

The reference has NO intra-model parallelism (SURVEY.md §2, parallelism inventory) —
this subsystem is the TPU-native extension the north star requires: target weights and
KV cache tensor-sharded over ICI via NamedSharding, draft replicated, XLA inserting the
collectives. The engine's jitted phases are sharding-agnostic: committed input
shardings propagate through `jax.jit`, so sharding a runtime is just `device_put` with
the right PartitionSpecs.

Layout (Megatron-style column/row pairs so each layer needs one psum):
  wq/wk/wv [n, H, out]   -> (None, None, 'model')   heads sharded
  wo       [n, Hq, H]    -> (None, 'model', None)   row-sharded => psum after
  gate/up  [n, H, I]     -> (None, None, 'model')
  down     [n, I, H]     -> (None, 'model', None)
  lm_head  [H, V]        -> (None, 'model')         vocab-sharded logits
  embed/norms            -> replicated
  KV cache [n, KVH, L, D]-> (None, 'model', None, None)  kv-head sharded
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(model: int = 1, data: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def llama_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching the llama-family param pytree."""
    if "wqkv" in params["layers"]:
        raise ValueError(
            "packed (wqkv/gate_up) params cannot be tensor-sharded — column shards "
            "would straddle section boundaries; load with packed=False for TP")
    layer_specs = {
        "input_norm": P(), "post_norm": P(),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "gate": P(None, None, "model"),
        "up": P(None, None, "model"),
        "down": P(None, "model", None),
    }
    for b in ("bq", "bk", "bv"):
        if b in params["layers"]:
            layer_specs[b] = P(None, "model") if b == "bq" else P(None, "model")
    specs = {
        "embed": P(),
        "final_norm": P(),
        "rope_inv_freq": P(),
        "rope_scale": P(),
        "layers": {k: layer_specs[k] for k in params["layers"]},
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "model")
    return specs


def kv_cache_spec() -> P:
    # [layers, kv_heads, max_len, head_dim] — shard on kv heads
    return P(None, "model", None, None)


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = llama_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, dict))


def shard_kv(kv, mesh: Mesh):
    sh = NamedSharding(mesh, kv_cache_spec())
    return type(kv)(*(jax.device_put(x, sh) for x in kv))


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_runtime(runtime, mesh: Mesh, replicated: bool = False):
    """Shard (or replicate) a ModelRuntime's params in place; returns the runtime.

    Tensor-parallel requires head counts divisible by the model axis; KV cache
    sharding requires kv_heads % model == 0.
    """
    m = mesh.shape["model"]
    if replicated or m == 1:
        runtime.params = replicate(runtime.params, mesh)
        runtime._mesh = mesh
        runtime._tp = False
        return runtime
    cfg = runtime.cfg
    assert cfg.num_attention_heads % m == 0, "heads must divide model axis"
    assert cfg.num_key_value_heads % m == 0, "kv heads must divide model axis"
    runtime.params = shard_params(runtime.params, mesh)
    orig_init_kv = runtime.init_kv

    def sharded_init_kv(*a, **k):
        return shard_kv(orig_init_kv(*a, **k), mesh)

    runtime.init_kv = sharded_init_kv
    runtime._mesh = mesh
    runtime._tp = True
    return runtime
