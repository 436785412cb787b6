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

AWQ (W4) weights shard the same way on their LOGICAL axes — the north-star 70B-AWQ
config tensor-shards quantized weights over ICI. An AwqTensor's leaves are
per-layer (tuple entries, loader `packed=False`): column-parallel shards the N
axis of w8 [K/2, N] / scales [G, N] / zeros [G, N]; row-parallel shards K — valid
because split-halves packing pairs rows k and k+K/2 WITHIN a group column-block
only when each shard holds whole quantization groups, so row sharding requires
G % model == 0 (and the pack's halves split K/2 % model == 0, implied by G).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quantization.awq import AwqTensor


def make_mesh(model: int = 1, data: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def _awq_spec(entry, col: bool):
    """Spec tree mirroring an AwqTensor (or per-layer tuple of them).

    Column-parallel shards the logical N axis (last axis of w8/scales/zeros);
    row-parallel shards logical K — w8's packed-halves axis and the scales' group
    axis split identically as long as each shard holds whole groups."""
    one = AwqTensor(*([P(None, "model") if col else P("model", None)] * 3))
    if isinstance(entry, AwqTensor):
        return one
    return tuple(one for _ in entry)


_COL_KEYS = ("wq", "wk", "wv", "gate", "up")
_ROW_KEYS = ("wo", "down")


def llama_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching the llama-family param pytree (fp or AWQ).

    AWQ layer entries (per-layer tuples of AwqTensor, loader `packed=False`) get a
    mirrored spec tree so `shard_params` / shard_map in_specs see matching leaves."""
    if "wqkv" in params["layers"]:
        raise ValueError(
            "packed (wqkv/gate_up) params cannot be tensor-sharded — column shards "
            "would straddle section boundaries; load with packed=False for TP")

    def layer_spec(k, v):
        quant = isinstance(v, AwqTensor) or (
            isinstance(v, tuple) and v and isinstance(v[0], AwqTensor))
        if k in _COL_KEYS:
            return _awq_spec(v, col=True) if quant else P(None, None, "model")
        if k in _ROW_KEYS:
            return _awq_spec(v, col=False) if quant else P(None, "model", None)
        if k in ("bq", "bk", "bv"):
            return P(None, "model")
        return P()  # norms

    specs = {
        "embed": P(),
        "final_norm": P(),
        "rope_inv_freq": P(),
        "rope_scale": P(),
        "layers": {k: layer_spec(k, v) for k, v in params["layers"].items()},
    }
    if "lm_head" in params:
        head = params["lm_head"]
        specs["lm_head"] = (_awq_spec(head, col=True)
                            if isinstance(head, AwqTensor) else P(None, "model"))
    return specs


def kv_cache_spec() -> P:
    # [layers, kv_heads, max_len, head_dim] — shard on kv heads
    return P(None, "model", None, None)


def kv_specs(kv) -> object:
    """Spec tree mirroring a KVCache: k/v [n, KVH, L, D] and (int8 mode) per-slot
    scales [n, KVH, L] all shard on the kv-head axis; None fields stay None."""
    return jax.tree.map(
        lambda x: P(*([None, "model"] + [None] * (x.ndim - 2))), kv)


def _specs_to_shardings(spec_tree, mesh: Mesh):
    return jax.tree.map(lambda p: NamedSharding(mesh, p), spec_tree,
                        is_leaf=lambda y: isinstance(y, P))


def shard_params(params: dict, mesh: Mesh) -> dict:
    from ..quantization.awq import repack_row_shards

    m = mesh.shape["model"]
    if m > 1:
        # row-parallel W4 weights: re-pack split halves per K-block so each
        # shard's slice is a standalone, self-consistent AwqTensor
        layers = dict(params["layers"])
        for k in _ROW_KEYS:
            v = layers.get(k)
            if isinstance(v, AwqTensor):
                layers[k] = repack_row_shards(v, m)
            elif isinstance(v, tuple) and v and isinstance(v[0], AwqTensor):
                layers[k] = tuple(repack_row_shards(q, m) for q in v)
        params = dict(params, layers=layers)
    specs = llama_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, _specs_to_shardings(s, mesh)), params, specs,
        is_leaf=lambda x: not isinstance(x, dict))


def shard_kv(kv, mesh: Mesh):
    return jax.device_put(kv, _specs_to_shardings(kv_specs(kv), mesh))


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _check_awq_divisibility(layers: dict, m: int):
    for k in _ROW_KEYS:
        v = layers.get(k)
        if isinstance(v, AwqTensor):
            qs = (v,)
        elif isinstance(v, tuple):
            qs = v
        else:
            qs = ()
        for q in qs:
            if isinstance(q, AwqTensor):
                assert q.scales.shape[-2] % m == 0, (
                    f"row-parallel {k}: quant-group count ({q.scales.shape[-2]}) "
                    f"must be divisible by the model axis ({m}) so every shard "
                    f"holds whole groups")


def shard_runtime(runtime, mesh: Mesh, replicated: bool = False):
    """Shard (or replicate) a ModelRuntime's params in place; returns the runtime.

    Tensor-parallel requires head counts divisible by the model axis; KV cache
    sharding requires kv_heads % model == 0; AWQ row-parallel weights require the
    quantization-group count to divide the model axis.

    The TP forward runs under `shard_map` with Megatron collectives traced into
    the layer body (models/llama.py `tp_axis`) — Pallas kernels (flash attention,
    W4A16) execute per-shard on local heads/columns, which GSPMD auto-partitioning
    cannot do for custom kernels.
    """
    m = mesh.shape["model"]
    if replicated or m == 1:
        runtime.params = replicate(runtime.params, mesh)
        runtime._mesh = mesh
        runtime._tp = False
        return runtime
    cfg = runtime.cfg
    # gemma2 TP exists for the BATCHED forwards only (tp_batched_forwards);
    # tp_shard_map_forward (single-slot) still guards against it below
    assert cfg.num_attention_heads % m == 0, "heads must divide model axis"
    assert cfg.num_key_value_heads % m == 0, "kv heads must divide model axis"
    _check_awq_divisibility(runtime.params["layers"], m)
    runtime.params = shard_params(runtime.params, mesh)
    orig_init_kv = runtime.init_kv

    def sharded_init_kv(*a, **k):
        return shard_kv(orig_init_kv(*a, **k), mesh)

    runtime.init_kv = sharded_init_kv
    runtime._mesh = mesh
    runtime._tp = True
    return runtime


def batched_kv_specs(kv) -> object:
    """Spec tree mirroring a BatchedKVCache: k/v [n, B, KVH, L, D] and (int8 mode)
    per-slot scales [n, B, KVH, L] shard on the kv-head axis (axis 2); the slot
    axis stays unsharded so every device holds all slots' local heads."""
    return jax.tree.map(
        lambda x: P(*([None, None, "model"] + [None] * (x.ndim - 3))), kv)


def shard_batched_kv(kv, mesh: Mesh):
    return jax.device_put(kv, _specs_to_shardings(batched_kv_specs(kv), mesh))


def tp_batched_forwards(runtime):
    """shard_map-wrapped batched/slot forwards for a TP-sharded runtime — the
    continuous-batching analogue of `tp_shard_map_forward` (north-star config[4]:
    continuous batching OVER a tensor-sharded target). Returns
    (batched_fwd, slot_fwd) with the engine-facing signatures of
    models/batched.{batched_llama_forward, slot_llama_forward} minus `args`
    (bound here with LOCAL per-shard head counts + the tp collectives)."""
    from ..models.batched import (batched_gemma2_forward, batched_llama_forward,
                                  slot_gemma2_forward, slot_llama_forward)

    mesh = runtime._mesh
    m = mesh.shape["model"]
    if runtime.family == "gemma2":
        # same Megatron layout (col wq/wk/wv/gate/up, row wo/down, KV on kv
        # heads); the gemma pair additionally psums BEFORE the post norms
        args = runtime.gemma_args._replace(
            num_heads=runtime.gemma_args.num_heads // m,
            num_kv_heads=runtime.gemma_args.num_kv_heads // m,
            tp_axis="model")
        fwd_all, fwd_slot = batched_gemma2_forward, slot_gemma2_forward
    else:
        args = runtime.args._replace(
            num_heads=runtime.args.num_heads // m,
            num_kv_heads=runtime.args.num_kv_heads // m,
            tp_axis="model")
        fwd_all, fwd_slot = batched_llama_forward, slot_llama_forward
    param_specs = llama_param_specs(runtime.params)

    def batched_fwd(params, kv, input_ids, position_ids, attn_mask, write_offsets):
        def local(params, kv, ids, pos, mask, offs):
            return fwd_all(params, args, kv, ids, pos, mask, offs)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(param_specs, batched_kv_specs(kv), P(), P(), P(), P()),
            out_specs=(P(), batched_kv_specs(kv)),
            check_vma=False,
        )(params, kv, input_ids, position_ids, attn_mask, write_offsets)

    def slot_fwd(params, kv, input_ids, position_ids, attn_mask, slot, write_offset):
        def local(params, kv, ids, pos, mask, slot, off):
            return fwd_slot(params, args, kv, ids, pos, mask, slot, off)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(param_specs, batched_kv_specs(kv), P(), P(), P(), P(), P()),
            out_specs=(P(), batched_kv_specs(kv)),
            check_vma=False,
        )(params, kv, input_ids, position_ids, attn_mask, slot, write_offset)

    return batched_fwd, slot_fwd


def tp_shard_map_forward(runtime):
    """Engine-contract forward (params, kv, ids, pos, mask, off) -> (logits, kv)
    that runs the llama forward INSIDE `jax.shard_map` over the runtime's mesh:
    activations replicated, weights/KV as laid out above, psum after wo/down,
    all-gather of vocab-sharded logits. Head counts in the inner StaticModelArgs
    are LOCAL (per-shard)."""
    from ..models.llama import llama_forward

    if runtime.family == "gemma2":
        raise NotImplementedError(
            "single-slot TP gemma2 is not wired (the batched engine's "
            "tp_batched_forwards covers gemma2; use engine 'batched_static' "
            "with tensor_parallel for a TP gemma2 deployment)")
    mesh = runtime._mesh
    m = mesh.shape["model"]
    args = runtime.args._replace(
        num_heads=runtime.args.num_heads // m,
        num_kv_heads=runtime.args.num_kv_heads // m,
        tp_axis="model")
    param_specs = llama_param_specs(runtime.params)

    def fwd(params, kv, input_ids, position_ids, attn_mask, write_offset):
        def local(params, kv, ids, pos, mask, off):
            return llama_forward(params, args, kv, ids, pos, mask, off)

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(param_specs, kv_specs(kv), P(), P(), P(), P()),
            out_specs=(P(), kv_specs(kv)),
            check_vma=False,
        )(params, kv, input_ids, position_ids, attn_mask, write_offset)

    return fwd
