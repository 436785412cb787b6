"""Draft-model training (TPU-native counterpart of reference `draft/train_draft.py`).

The reference trains a ~500M from-scratch draft with HF Trainer (bf16, cosine LR,
1024 ctx, `train_draft.py:53-83`). Here: a jit/pjit-able causal-LM train step over the
same llama-family param pytree the inference engine serves, sharded dp (batch) x tp
(weights) over a Mesh — so a trained draft drops straight into the engine.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models.llama import StaticModelArgs, _attn_projections, _linear, _mlp_gate_up
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope


def _batched_layer(args: StaticModelArgs, lw: dict, hidden, inv_freq, rope_scale, positions, mask):
    """One layer over [B, S, H] without KV cache (training path)."""
    B, S, H = hidden.shape
    D = args.head_dim
    residual = hidden
    x = rms_norm(hidden, lw["input_norm"], args.rms_eps)
    q, k, v = _attn_projections(args, lw, x)
    q = q.reshape(B, S, args.num_heads, D)
    k = k.reshape(B, S, args.num_kv_heads, D)
    v = v.reshape(B, S, args.num_kv_heads, D)
    q, k = jax.vmap(lambda qq, kk: apply_rope(qq, kk, inv_freq, rope_scale, positions))(q, k)

    groups = args.num_heads // args.num_kv_heads
    qg = q.reshape(B, S, args.num_kv_heads, groups, D)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k, preferred_element_type=jnp.float32)
    scores = scores / (D ** 0.5)
    scores = jnp.where(mask[None, None, None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v).reshape(B, S, args.num_heads * D)
    hidden = residual + _linear(out, lw["wo"])

    residual = hidden
    x = rms_norm(hidden, lw["post_norm"], args.rms_eps)
    gate, up = _mlp_gate_up(lw, x)
    mlp = _linear(jax.nn.silu(gate) * up, lw["down"])
    return residual + mlp


def train_forward(params: dict, args: StaticModelArgs, input_ids: jnp.ndarray,
                  sequence_parallel: bool = False) -> jnp.ndarray:
    """Causal forward over [B, S] -> fp32 logits [B, S, V] (no cache).

    sequence_parallel=True adds sharding constraints that split the SEQUENCE axis of
    activations over the 'model' mesh axis between attention blocks (norm/MLP are
    token-local) — the SP layout on top of dp x tp.
    """
    B, S = input_ids.shape
    inv_freq, rope_scale = params["rope_inv_freq"], params["rope_scale"]
    positions = jnp.arange(S)
    mask = jnp.tril(jnp.ones((S, S), bool))
    from ..ops.select import embed_lookup

    # flat lookup (vmap of the TPU gather kernel is unsupported; same math)
    hidden = embed_lookup(params["embed"], input_ids.reshape(-1),
                          params["final_norm"].dtype
                          ).reshape(*input_ids.shape, -1)

    def sp(x):
        if not sequence_parallel:
            return x
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(x, P("data", "model", None))

    def body(hidden, lw):
        out = _batched_layer(args, lw, sp(hidden), inv_freq, rope_scale, positions, mask)
        return sp(out), None

    hidden, _ = jax.lax.scan(body, hidden, params["layers"])
    hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
    head = params.get("lm_head")
    if head is None:
        return jnp.einsum("bsh,vh->bsv", hidden, params["embed"],
                          preferred_element_type=jnp.float32)
    return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


def causal_lm_loss(params, args, input_ids, loss_mask=None, sequence_parallel=False):
    logits = train_forward(params, args, input_ids, sequence_parallel=sequence_parallel)
    targets = input_ids[:, 1:]
    logits = logits[:, :-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if loss_mask is not None:
        m = loss_mask[:, 1:].astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 3e-4, total_steps: int = 10000,
                   warmup: int = 200, weight_decay: float = 0.01):
    warmup = min(warmup, max(total_steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, total_steps)
    return optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay)


def make_train_step(args: StaticModelArgs, optimizer, sequence_parallel: bool = False):
    def train_step(state: TrainState, input_ids) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(causal_lm_loss)(
            state.params, args, input_ids, sequence_parallel=sequence_parallel)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_train_state(params: dict, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
