"""AWQ checkpoint -> quantized llama-family runtime.

Reads HF AutoAWQ "GEMM" checkpoints (the format the reference serves through
`WQLinear_GEMM`, ref `awq_utils.py:18-30`) and builds the same param pytree as
models/weights.py, with linear weights as split-halves AwqTensors (stacked along the
layer axis for `lax.scan`). Embeddings, norms, and lm_head stay fp (AWQ leaves them
unquantized). Also provides `quantize_params` to AWQ-quantize an fp checkpoint/random
model in-process (used by tests and benchmarks; the reference has no equivalent — it
can only load pre-quantized hubs).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.weights import _load_state_dict_np, _to_jnp, trim_vocab_rows
from ..ops.rope import rope_params
from .awq import AwqTensor, awq_from_hf_tensors, concat_awq


def _stack_awq(tensors) -> tuple:
    """Per-layer AwqTensors are kept as a TUPLE, not stacked into [n, K/2, N]
    arrays: a pallas call can only consume whole buffers, so a scan/loop over a
    stacked array forces XLA to materialize each layer's packed weights per
    iteration (traced: ~163 us/layer of pure copy at 8B shapes ~ 5 ms per
    32-layer verify). Per-layer buffers are read in place by the kernels; the
    model forward unrolls the layer loop when it sees tuple entries."""
    return tuple(tensors)


def awq_params_from_hf_state_dict(
    sd: Dict[str, np.ndarray], cfg: ModelConfig, max_length: int,
    dtype=jnp.bfloat16, n_layers: Optional[int] = None, packed: bool = True,
) -> dict:
    n = n_layers if n_layers is not None else cfg.num_hidden_layers
    P = "model."

    def fp(name):
        a = sd[name]
        return a.astype(np.float32) if a.dtype == np.float16 else a

    def q_one(i, fmt):
        base = fmt.format(i)
        return awq_from_hf_tensors(
            sd[base + ".qweight"], sd[base + ".qzeros"], fp(base + ".scales"),
            dtype=dtype)

    def q_linear(fmt):
        return _stack_awq([q_one(i, fmt) for i in range(n)])

    def q_packed(fmts):
        return _stack_awq([concat_awq([q_one(i, f) for f in fmts]) for i in range(n)])

    def stack_vec(fmt):
        return _to_jnp(np.stack([fp(fmt.format(i)) for i in range(n)]), dtype)

    def stack_vec_packed(fmts):
        return _to_jnp(np.stack([
            np.concatenate([fp(f.format(i)) for f in fmts], axis=-1)
            for i in range(n)]), dtype)

    layers = {
        "input_norm": stack_vec(P + "layers.{}.input_layernorm.weight"),
        "post_norm": stack_vec(P + "layers.{}.post_attention_layernorm.weight"),
        "wo": q_linear(P + "layers.{}.self_attn.o_proj"),
        "down": q_linear(P + "layers.{}.mlp.down_proj"),
    }
    qkv_fmts = [P + "layers.{}.self_attn.q_proj", P + "layers.{}.self_attn.k_proj",
                P + "layers.{}.self_attn.v_proj"]
    gu_fmts = [P + "layers.{}.mlp.gate_proj", P + "layers.{}.mlp.up_proj"]
    has_bias = P + "layers.0.self_attn.q_proj.bias" in sd
    if packed:
        layers["wqkv"] = q_packed(qkv_fmts)
        layers["gate_up"] = q_packed(gu_fmts)
        if has_bias:
            layers["bqkv"] = stack_vec_packed([f + ".bias" for f in qkv_fmts])
    else:
        layers["wq"], layers["wk"], layers["wv"] = (q_linear(f) for f in qkv_fmts)
        layers["gate"], layers["up"] = (q_linear(f) for f in gu_fmts)
        if has_bias:
            layers["bq"] = stack_vec(qkv_fmts[0] + ".bias")
            layers["bk"] = stack_vec(qkv_fmts[1] + ".bias")
            layers["bv"] = stack_vec(qkv_fmts[2] + ".bias")

    params = {
        "embed": _to_jnp(trim_vocab_rows(fp(P + "embed_tokens.weight"), cfg.vocab_size), dtype),
        "final_norm": _to_jnp(fp(P + "norm.weight"), dtype),
        "layers": layers,
        **rope_params(cfg),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _to_jnp(
            trim_vocab_rows(fp("lm_head.weight"), cfg.vocab_size).T, dtype)
    return params


def load_awq_runtime(path: str, cfg: ModelConfig, max_length: int, dtype=jnp.bfloat16,
                     family: str = "llama", n_layers: Optional[int] = None,
                     offload: bool = False, num_cache_layers: int = 0,
                     packed: bool = True):
    sd = _load_state_dict_np(path)
    if offload:
        from ..offload.streaming import OffloadModelRuntime

        return OffloadModelRuntime.from_state_dict(
            sd, cfg, max_length=max_length, dtype=dtype, family=family,
            n_layers=n_layers, num_cache_layers=num_cache_layers, quantized=True,
            model_name=path)
    from ..models.auto_model import ModelRuntime

    params = awq_params_from_hf_state_dict(sd, cfg, max_length, dtype, n_layers=n_layers,
                                           packed=packed)
    return ModelRuntime(cfg, params, max_length, dtype=dtype, family=family,
                        n_layers=n_layers, model_name=path)


def quantize_params(params: dict, group_size: int = 128, dtype=jnp.bfloat16,
                    quantize_lm_head: bool = False) -> dict:
    """AWQ-quantize an fp llama-family param pytree (linear weights only; handles
    both packed and unpacked layouts).

    `quantize_lm_head` also W4-quantizes an untied lm_head — a TPU extension the
    reference lacks (AutoAWQ keeps heads fp16): the untied 8B head alone is ~1 GB
    in bf16 (~1.4 ms/decode-step of pure HBM traffic)."""
    from .awq import quantize_pack_device

    out_layers = dict(params["layers"])
    n = params["layers"]["input_norm"].shape[0]
    names = [k for k in ("wq", "wk", "wv", "wo", "gate", "up", "down",
                         "wqkv", "gate_up") if k in params["layers"]]
    for name in names:
        stacked = params["layers"][name]
        # device-side quantize+pack (no host round-trip — pulling weights through
        # the tunnel cost ~218 s for a 500M draft; on-device it's milliseconds)
        out_layers[name] = _stack_awq([
            quantize_pack_device(stacked[i], group_size, dtype=dtype)
            for i in range(n)])
    out = dict(params)
    out["layers"] = out_layers
    if quantize_lm_head:
        if "lm_head" in params:
            head = jnp.asarray(params["lm_head"])
        else:
            # tied embeddings: materialize a W4 head from embed.T — the logits
            # matmul re-reads the full [H, V] matrix every draft level (e.g.
            # 394 MB bf16 for a 1536x128256 draft ~ 0.5 ms/level of HBM), while
            # embed lookups only read S rows and keep using the bf16 embed.
            head = jnp.asarray(params["embed"]).T
        out["lm_head"] = quantize_pack_device(head, group_size, dtype=dtype)
    return out


def quantize_runtime(runtime, group_size: int = 128, dtype=jnp.bfloat16,
                     quantize_lm_head: bool = False):
    """W4-quantize a loaded ModelRuntime in place of its fp weights — e.g. the
    DRAFT model: on TPU the draft re-reads all its weights once per tree level
    (6 levels x 1 GB for a bf16 500M draft ~ 8 ms/step), so a W4 draft cuts
    tree-build time ~4x. The reference has no quantized-draft path (its drafts
    are AWQ checkpoints or fp16)."""
    from ..models.auto_model import ModelRuntime

    params = quantize_params(runtime.params, group_size=group_size, dtype=dtype,
                             quantize_lm_head=quantize_lm_head)
    return ModelRuntime(runtime.cfg, params, runtime.max_length, dtype=dtype,
                        family=runtime.family, n_layers=runtime.args.n_layers,
                        model_name=runtime.model_name)
