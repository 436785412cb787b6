"""Mixture-of-Experts llama variant with expert parallelism.

The reference is dense-MLP only (SURVEY.md §2: `umbrella/models/llama.py:107-111`,
"Expert parallel (EP) / MoE: No"); this family is the TPU-native extension that gives
the framework an `expert` mesh axis. Design:

- Experts are STACKED per layer: router [n, H, E], gate/up [n, E, H, I], down
  [n, E, I, H] — one pytree, XLA-friendly static shapes.
- Routing is top-k softmax gating (Mixtral-style) with a dense one-hot combine — no
  data-dependent gather/scatter (jit-safe, and gathers poison this runtime's dispatch
  path, see CLAUDE.md). Every expert computes every token and the combine weights
  zero the unrouted pairs; with the expert axis sharded P('expert') XLA partitions the
  per-expert einsums across devices and inserts one psum for the combine — classic
  dense-dispatch EP, the right tradeoff below the capacity-factor regime.
- Aux load-balancing loss (mean fraction * mean prob per expert, Switch-style).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.llama import StaticModelArgs, _attn_projections, _linear
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope
from ..ops.rope import rope_params


def init_moe_llama_params(cfg: ModelConfig, key, n_experts: int,
                          dtype=jnp.float32) -> dict:
    n = cfg.num_hidden_layers
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    D = cfg.resolved_head_dim
    Hq = cfg.num_attention_heads * D
    KV = cfg.num_key_value_heads * D
    E = n_experts
    ks = jax.random.split(key, 10)
    s = lambda *sh: (2.0 / (sh[-2] + sh[-1])) ** 0.5

    def init(k, *sh):
        return (jax.random.normal(k, sh) * s(*sh)).astype(dtype)

    layers = {
        "input_norm": jnp.ones((n, H), dtype), "post_norm": jnp.ones((n, H), dtype),
        "wq": init(ks[0], n, H, Hq), "wk": init(ks[1], n, H, KV),
        "wv": init(ks[2], n, H, KV), "wo": init(ks[3], n, Hq, H),
        "router": init(ks[4], n, H, E),
        "expert_gate": init(ks[5], n, E, H, I),
        "expert_up": init(ks[6], n, E, H, I),
        "expert_down": init(ks[7], n, E, I, H),
    }
    params = {"embed": init(ks[8], V, H), "final_norm": jnp.ones((H,), dtype),
              "layers": layers, **rope_params(cfg)}
    if not cfg.tie_word_embeddings:
        params["lm_head"] = init(ks[9], H, V)
    return params


def moe_param_specs(params: dict) -> dict:
    """Experts sharded over the 'expert' mesh axis; attention/router replicated
    (shard those over 'model' too when combining EP with TP)."""
    layer_specs = {k: P() for k in params["layers"]}
    for k in ("expert_gate", "expert_up", "expert_down"):
        layer_specs[k] = P(None, "expert", None, None)
    specs = {k: P() for k in params if k != "layers"}
    specs["layers"] = layer_specs
    return specs


def shard_params_ep(params: dict, mesh: Mesh) -> dict:
    specs = moe_param_specs(params)
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), params, specs,
        is_leaf=lambda x: not isinstance(x, dict))


def moe_mlp(lw: dict, x, top_k: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense-dispatch top-k MoE over [B, S, H]. Returns (out, aux_loss)."""
    E = lw["router"].shape[-1]
    logits = jnp.einsum("bsh,he->bse", x, lw["router"],
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)  # [B,S,k]
    top_vals = top_vals / jnp.maximum(
        jnp.sum(top_vals, axis=-1, keepdims=True), 1e-9)
    # dense combine weights [B,S,E] via one-hot (no scatter)
    eids = jax.lax.broadcasted_iota(jnp.int32, (E,), 0)
    onehot = (top_idx[..., None] == eids).astype(x.dtype)  # [B,S,k,E]
    w = jnp.sum(onehot * top_vals[..., None].astype(x.dtype), axis=2)  # [B,S,E]

    g = jnp.einsum("bsh,ehi->besi", x, lw["expert_gate"])
    u = jnp.einsum("bsh,ehi->besi", x, lw["expert_up"])
    y = jnp.einsum("besi,eih->besh", jax.nn.silu(g) * u, lw["expert_down"])
    out = jnp.einsum("besh,bse->bsh", y, w.astype(y.dtype))

    # Switch-style load-balance aux: E * sum_e (fraction routed to e * mean prob e)
    frac = jnp.mean(jnp.sum(onehot, axis=2).astype(jnp.float32), axis=(0, 1))
    mean_p = jnp.mean(probs, axis=(0, 1))
    aux = E * jnp.sum(frac * mean_p)
    return out, aux


def _moe_layer(args: StaticModelArgs, lw, hidden, inv_freq, rope_scale,
               positions, mask, top_k: int):
    B, S, H = hidden.shape
    D = args.head_dim
    residual = hidden
    x = rms_norm(hidden, lw["input_norm"], args.rms_eps)
    q, k, v = _attn_projections(args, lw, x)
    q = q.reshape(B, S, args.num_heads, D)
    k = k.reshape(B, S, args.num_kv_heads, D)
    v = v.reshape(B, S, args.num_kv_heads, D)
    q, k = jax.vmap(lambda qq, kk: apply_rope(qq, kk, inv_freq, rope_scale,
                                              positions))(q, k)
    groups = args.num_heads // args.num_kv_heads
    qg = q.reshape(B, S, args.num_kv_heads, groups, D)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k,
                        preferred_element_type=jnp.float32) / (D ** 0.5)
    scores = jnp.where(mask[None, None, None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v).reshape(B, S, args.num_heads * D)
    hidden = residual + _linear(out, lw["wo"])

    residual = hidden
    x = rms_norm(hidden, lw["post_norm"], args.rms_eps)
    mlp, aux = moe_mlp(lw, x, top_k=top_k)
    return residual + mlp, aux


def moe_train_forward(params: dict, args: StaticModelArgs, input_ids,
                      top_k: int = 2):
    """Causal forward over [B, S] -> (fp32 logits [B, S, V], aux loss scalar)."""
    B, S = input_ids.shape
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]
    positions = jax.lax.iota(jnp.int32, S)
    ri = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    mask = ci <= ri
    from ..ops.select import embed_lookup

    hidden = embed_lookup(params["embed"], input_ids.reshape(-1),
                          params["final_norm"].dtype).reshape(*input_ids.shape, -1)

    def body(carry, lw):
        hidden, aux = carry
        hidden, a = _moe_layer(args, lw, hidden, inv_freq, rope_scale,
                               positions, mask, top_k)
        return (hidden, aux + a), None

    (hidden, aux), _ = jax.lax.scan(body, (hidden, jnp.float32(0.0)),
                                    params["layers"])
    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    head = params.get("lm_head")
    if head is None:
        logits = jnp.einsum("bsh,vh->bsv", hidden, params["embed"],
                            preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
    return logits, aux / params["layers"]["input_norm"].shape[0]


def moe_decode_forward(params: dict, args: StaticModelArgs, kv, input_ids,
                       position_ids, attn_mask, write_offset, top_k: int = 2):
    """Engine-contract decode forward for the MoE family: (params, kv, ids [S],
    pos [S], mask [S, L], offset) -> (fp32 logits [S, V], kv). Attention is the
    llama KV-cache path (models/llama.llama_attention — flash kernel, rope,
    in-place cache writes); the MLP is the dense-dispatch top-k MoE above. With
    params sharded via shard_params_ep, GSPMD partitions the per-expert einsums
    over the 'expert' axis and inserts one psum for the combine — an MoE model
    can serve as a speculation TARGET or DRAFT with expert parallelism, which
    the reference (dense-MLP only) has no analogue of."""
    from ..models.llama import llama_attention, lm_head_logits
    from ..ops.select import embed_lookup

    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]
    hidden = embed_lookup(params["embed"], input_ids, params["final_norm"].dtype)

    def body(carry, xs):
        hidden, kv = carry
        layer_idx, lw = xs
        residual = hidden
        x = rms_norm(hidden, lw["input_norm"], args.rms_eps)
        attn_out, kv = llama_attention(
            args, lw, x, kv, layer_idx, position_ids, attn_mask, write_offset,
            inv_freq, rope_scale)
        hidden = residual + attn_out
        residual = hidden
        x = rms_norm(hidden, lw["post_norm"], args.rms_eps)
        mlp, _aux = moe_mlp(lw, x[None], top_k=top_k)
        return (residual + mlp[0], kv), None

    layer_ids = jax.lax.iota(jnp.int32, args.n_layers)
    (hidden, kv), _ = jax.lax.scan(body, (hidden, kv),
                                   (layer_ids, params["layers"]))
    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    return lm_head_logits(params, hidden), kv


def load_moe_params(path: str, cfg: ModelConfig, dtype=jnp.float32,
                    n_layers=None) -> dict:
    """HF Mixtral-format checkpoint dir -> stacked MoE pytree.

    HF stores per-expert linears as `model.layers.{i}.block_sparse_moe.experts
    .{e}.w{1,2,3}.weight` ([out, in]) and the router as `...block_sparse_moe.
    gate.weight` [E, H]; here they stack to [layer, E, in, out] / [layer, H, E]
    so `lax.scan` + the dense-dispatch einsums see one static pytree. The
    reference has no MoE path at all (SURVEY §2: dense-MLP only) — this is the
    config-reachable serving entry for the TPU-native expert-parallel family."""
    import numpy as np

    from .weights import _load_state_dict_np, _to_jnp, trim_vocab_rows

    sd = _load_state_dict_np(path)
    n = n_layers if n_layers is not None else cfg.num_hidden_layers
    E = cfg.num_local_experts
    assert E, "MoE checkpoint requires num_local_experts in config.json"
    P_ = "model."

    def get(name):
        a = sd[name]
        if a.dtype == np.float16 or str(a.dtype) == "bfloat16":
            a = a.astype(np.float32)
        return a

    def stack_linear(fmt):
        return _to_jnp(np.stack([get(fmt.format(i)).T for i in range(n)]), dtype)

    def stack_vec(fmt):
        return _to_jnp(np.stack([get(fmt.format(i)) for i in range(n)]), dtype)

    def stack_experts(w_name):
        # [layer, E, in, out] from per-expert [out, in]
        return _to_jnp(np.stack([
            np.stack([get(P_ + f"layers.{i}.block_sparse_moe.experts.{e}."
                               f"{w_name}.weight").T for e in range(E)])
            for i in range(n)]), dtype)

    layers = {
        "input_norm": stack_vec(P_ + "layers.{}.input_layernorm.weight"),
        "post_norm": stack_vec(P_ + "layers.{}.post_attention_layernorm.weight"),
        "wq": stack_linear(P_ + "layers.{}.self_attn.q_proj.weight"),
        "wk": stack_linear(P_ + "layers.{}.self_attn.k_proj.weight"),
        "wv": stack_linear(P_ + "layers.{}.self_attn.v_proj.weight"),
        "wo": stack_linear(P_ + "layers.{}.self_attn.o_proj.weight"),
        "router": stack_linear(P_ + "layers.{}.block_sparse_moe.gate.weight"),
        "expert_gate": stack_experts("w1"),
        "expert_down": stack_experts("w2"),
        "expert_up": stack_experts("w3"),
    }
    params = {
        "embed": _to_jnp(trim_vocab_rows(get(P_ + "embed_tokens.weight"),
                                         cfg.vocab_size), dtype),
        "final_norm": _to_jnp(get(P_ + "norm.weight"), dtype),
        "layers": layers,
        **rope_params(cfg),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _to_jnp(
            trim_vocab_rows(get("lm_head.weight"), cfg.vocab_size).T, dtype)
    return params


def moe_runtime(cfg: ModelConfig, params: dict, max_length: int,
                dtype=jnp.float32, top_k: int = 2):
    """ModelRuntime serving the MoE family (drop-in for the speculation engines)."""
    import functools

    from ..models.auto_model import ModelRuntime

    rt = ModelRuntime(cfg, params, max_length, dtype=dtype, family="moe")
    rt._forward = functools.partial(moe_decode_forward, top_k=top_k)
    return rt


def shard_runtime_ep(runtime, mesh: Mesh):
    """Expert-shard a MoE runtime's params in place (KV/activations replicated;
    jit propagates the shardings, GSPMD inserts the combine psum)."""
    runtime.params = shard_params_ep(runtime.params, mesh)
    runtime._mesh = mesh
    return runtime


def make_moe_train_step(args: StaticModelArgs, optimizer, top_k: int = 2,
                        aux_weight: float = 0.01):
    from ..training.draft_trainer import TrainState

    def loss_fn(params, input_ids):
        logits, aux = moe_train_forward(params, args, input_ids, top_k=top_k)
        targets = input_ids[:, 1:]
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll) + aux_weight * aux

    def train_step(state: TrainState, input_ids):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, input_ids)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step
