"""GPipe-style pipeline parallelism over a `pipe` mesh axis.

The reference has NO pipeline parallelism (SURVEY.md §2 parallelism inventory — its
"pipeline" is a host->device *weight* double-buffer, `umbrella/models/llama.py:207-212`).
This is the TPU-native axis the north star requires: contiguous layer blocks live on
successive devices of the `pipe` axis, microbatches flow stage-to-stage with
`lax.ppermute` inside `shard_map`, and the whole schedule (fill + steady state + drain,
M + S - 1 ticks for M microbatches over S stages) is a single `lax.scan` — one compiled
program, no per-stage host round trips. `jax.grad` differentiates straight through the
ppermute rotation (its transpose is the reverse rotation), so the same schedule serves
training.

Layout: stacked layer params [n_layers, ...] are sharded P('pipe') on the layer axis —
each stage holds n_layers/S contiguous layers. Embedding/head stay replicated (they are
small for draft-class models; shard them over a combined axis if vocab dominates).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import StaticModelArgs
from ..training.draft_trainer import TrainState, _batched_layer


def pp_layer_specs(params: dict) -> dict:
    """PartitionSpec pytree: layer stacks split over 'pipe', top-level replicated."""
    specs = {k: P() for k in params if k != "layers"}
    specs["layers"] = {k: P("pipe") for k in params["layers"]}
    return specs


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    specs = pp_layer_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, dict))


def make_pp_forward(args: StaticModelArgs, mesh: Mesh, n_micro: int):
    """Returns forward(params, input_ids[B, S]) -> fp32 logits [B, S, V], computed with
    the batch split into n_micro microbatches pipelined over the 'pipe' mesh axis."""
    n_stages = mesh.shape["pipe"]

    def stage_body(local_layers, x_mb, inv_freq, rope_scale):
        # per-device view: local_layers [n_layers/S, ...], x_mb [M, mb, seq, H]
        s = jax.lax.axis_index("pipe")
        M = x_mb.shape[0]
        seq = x_mb.shape[2]
        positions = jax.lax.iota(jnp.int32, seq)
        ri = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        mask = ci <= ri

        def block(h):
            def layer_body(hh, lw):
                return _batched_layer(args, lw, hh, inv_freq, rope_scale,
                                      positions, mask), None
            h, _ = jax.lax.scan(layer_body, h, local_layers)
            return h

        # scan carries become device-varying after the first ppermute; pre-cast the
        # zero initializers so the carry type is stable (jax>=0.9 vma typing)
        buf = jax.lax.pcast(jnp.zeros(x_mb.shape[1:], x_mb.dtype),
                            ("pipe",), to="varying")
        out = jax.lax.pcast(jnp.zeros_like(x_mb), ("pipe",), to="varying")

        def tick(carry, t):
            buf, out = carry
            inj = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
            cur = jnp.where(s == 0, inj, buf)
            cur = block(cur)
            widx = t - (n_stages - 1)
            upd = jax.lax.dynamic_update_slice(
                out, cur[None].astype(out.dtype),
                (jnp.clip(widx, 0, M - 1), 0, 0, 0))
            write = (s == n_stages - 1) & (widx >= 0)
            out = jnp.where(write, upd, out)
            # rotate activations one stage forward; stage 0 receives zeros
            nxt = jax.lax.ppermute(
                cur, "pipe", [(i, i + 1) for i in range(n_stages - 1)])
            return (nxt, out), None

        (buf, out), _ = jax.lax.scan(
            tick, (buf, out), jax.lax.iota(jnp.int32, M + n_stages - 1))
        # only the last stage holds real outputs (others are zeros) — replicate
        return jax.lax.psum(out, "pipe")

    sharded_stage = jax.shard_map(
        stage_body, mesh=mesh,
        in_specs=(P("pipe"), P(), P(), P()), out_specs=P())

    def forward(params, input_ids):
        B, seq = input_ids.shape
        assert B % n_micro == 0, f"n_micro={n_micro} must divide batch size {B}"
        from ..ops.select import embed_lookup

        hidden = embed_lookup(params["embed"], input_ids.reshape(-1),
                              params["final_norm"].dtype
                              ).reshape(*input_ids.shape, -1)
        x_mb = hidden.reshape(n_micro, B // n_micro, seq, hidden.shape[-1])
        y = sharded_stage(params["layers"], x_mb,
                          params["rope_inv_freq"], params["rope_scale"])
        hidden = y.reshape(B, seq, y.shape[-1])
        from ..ops.norms import rms_norm

        hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
        head = params.get("lm_head")
        if head is None:
            return jnp.einsum("bsh,vh->bsv", hidden, params["embed"],
                              preferred_element_type=jnp.float32)
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)

    return forward


# ---------------------------------------------------------------------------
# Pipeline-parallel INFERENCE (decode/verify forwards with per-stage KV)
# ---------------------------------------------------------------------------
#
# The serving-side counterpart of the training pipeline above, completing the
# parallelism matrix for the engines (SURVEY §2 north-star inventory). Layer
# stacks and the KV cache shard P('pipe') on the LAYER axis; one request's
# activations visit stage s at tick s (n_stages unrolled ticks, `ppermute`
# rotation). SPMD means every device executes every tick, so per-stage KV
# writes are diverted on non-real ticks: each stage's cache carries a scratch
# tail of `scratch` slots past max_length, and garbage ticks write there
# (off_eff = max_length). Mask columns for the tail are padded False, so the
# scratch region is never attended; scratch contents stay finite (blocks of
# finite inputs), so masked softmax never sees NaN. B=1 PP inference has the
# inherent fill bubble (wall = n_stages x stage time) — its value is CAPACITY:
# a 70B W4 target (~35 GB) fits 4 x v5e where TP would also work but PP needs
# no per-matmul collectives, only one [S, H] hop per stage boundary.


def stack_awq_layers(layers: dict) -> dict:
    """Per-layer AwqTensor tuples -> stacked AwqTensor ([n, K/2, N] leaves) so the
    layer axis can shard over 'pipe'; inside a stage the layered W4A16/flash
    kernels read per-layer slices in place (no XLA slice copies)."""
    from ..quantization.awq import AwqTensor

    out = {}
    for k, v in layers.items():
        if isinstance(v, tuple) and v and isinstance(v[0], AwqTensor):
            out[k] = AwqTensor(
                w8=jnp.stack([t.w8 for t in v]),
                scales=jnp.stack([t.scales for t in v]),
                zeros=jnp.stack([t.zeros for t in v]))
        else:
            out[k] = v
    return out


def pp_infer_param_specs(params: dict) -> dict:
    """Layer stacks (dense arrays and stacked AwqTensor leaves) split on axis 0
    over 'pipe'; embed/norms/rope/lm_head replicated."""
    specs = {}
    for k, v in params.items():
        if k == "layers":
            specs[k] = jax.tree.map(
                lambda x: P("pipe", *([None] * (x.ndim - 1))), v)
        else:
            specs[k] = jax.tree.map(lambda x: P(), v)
    return specs


def shard_runtime_pp(runtime, mesh: Mesh, scratch: int = 512):
    """Shard a ModelRuntime's layer stacks + KV over the 'pipe' axis in place.

    Requirements: n_layers % n_stages == 0, llama family. AWQ per-layer tuples
    are stacked first (stack_awq_layers). The engine-facing forward becomes
    pp_shard_map_forward; init_kv allocates max_length + scratch slots (the
    scratch tail absorbs non-real-tick writes) sharded on the layer axis.
    """
    from ..models.kv_cache import init_kv_cache

    n_stages = mesh.shape["pipe"]
    assert runtime.family != "gemma2", "PP forward currently covers the llama family"
    assert runtime.args.n_layers % n_stages == 0, (
        f"n_layers ({runtime.args.n_layers}) must be divisible by pipe stages ({n_stages})")
    layers = stack_awq_layers(runtime.params["layers"])
    params = dict(runtime.params, layers=layers)
    specs = pp_infer_param_specs(params)
    runtime.params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)

    cfg, max_length, n_layers = runtime.cfg, runtime.max_length, runtime.args.n_layers

    def pp_init_kv(kv_dtype=None):
        kv = init_kv_cache(cfg, max_length + scratch,
                           dtype=kv_dtype or runtime.dtype, num_layers=n_layers)
        sh = jax.tree.map(
            lambda x: NamedSharding(mesh, P("pipe", *([None] * (x.ndim - 1)))), kv)
        return jax.device_put(kv, sh)

    runtime.init_kv = pp_init_kv
    runtime._mesh = mesh
    runtime._pp = True
    runtime._pp_scratch = scratch
    return runtime


def pp_shard_map_forward(runtime):
    """Engine-contract forward (params, kv, ids, pos, mask, off) -> (logits, kv)
    pipelined over the runtime's 'pipe' mesh. Embed and lm_head run replicated
    outside the shard_map (they are whole-model, not per-layer, weights); the
    layer chain runs inside with one ppermute hop per stage boundary."""
    from ..models.llama import llama_layer, lm_head_logits
    from ..ops.norms import rms_norm
    from ..ops.select import embed_lookup
    from ..quantization.awq import AwqLayerView, AwqTensor

    mesh = runtime._mesh
    n_stages = mesh.shape["pipe"]
    args = runtime.args
    n_local = args.n_layers // n_stages
    pad = runtime._pp_scratch
    L_real = runtime.max_length
    layer_specs = pp_infer_param_specs(runtime.params)["layers"]

    def fwd(params, kv, input_ids, position_ids, attn_mask, write_offset):
        S = input_ids.shape[0]
        assert S <= pad, f"query rows {S} exceed the PP scratch tail ({pad})"
        hidden = embed_lookup(params["embed"], input_ids,
                              params["final_norm"].dtype)
        mask_pad = jnp.pad(attn_mask, ((0, 0), (0, pad)))
        kv_sp = jax.tree.map(
            lambda x: P("pipe", *([None] * (x.ndim - 1))), kv)

        def local(layers, kv, hidden, pos, mask, off, inv_freq, rope_scale):
            s = jax.lax.axis_index("pipe")
            x = hidden
            for t in range(n_stages):
                # non-real ticks write KV into the scratch tail at slot L_real
                off_eff = jnp.where(s == t, off, jnp.int32(L_real))
                h = x
                for i in range(n_local):
                    lw = {k: (AwqLayerView(v, jnp.int32(i))
                              if isinstance(v, AwqTensor) else v[i])
                          for k, v in layers.items()}
                    h, kv = llama_layer(args, lw, h, kv, i, pos, mask, off_eff,
                                        inv_freq, rope_scale)
                if t < n_stages - 1:
                    x = jax.lax.ppermute(
                        h, "pipe", [(d, d + 1) for d in range(n_stages - 1)])
                else:
                    x = h
            out = jnp.where(s == n_stages - 1, x, jnp.zeros_like(x))
            return jax.lax.psum(out, "pipe"), kv

        hidden, kv = jax.shard_map(
            local, mesh=mesh,
            in_specs=(layer_specs, kv_sp, P(), P(), P(), P(), P(), P()),
            out_specs=(P(), kv_sp), check_vma=False,
        )(params["layers"], kv, hidden, position_ids, mask_pad, write_offset,
          params["rope_inv_freq"], params["rope_scale"])
        hidden = rms_norm(hidden, params["final_norm"], args.rms_eps)
        return lm_head_logits(params, hidden), kv

    return fwd


def make_pp_train_step(args: StaticModelArgs, optimizer, mesh: Mesh, n_micro: int):
    """dp-free pipeline-parallel train step (combine with dp by nesting mesh axes)."""
    forward = make_pp_forward(args, mesh, n_micro)

    def loss_fn(params, input_ids):
        logits = forward(params, input_ids)
        targets = input_ids[:, 1:]
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    def train_step(state: TrainState, input_ids) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, input_ids)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step
