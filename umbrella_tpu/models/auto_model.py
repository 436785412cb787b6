"""Model registry and runtime construction.

Counterpart of the reference's `umbrella/models/auto_model.py` (three hardcoded
string->class maps keyed on `(model_name, offload, cuda_graph)`, reference
`auto_model.py:156-182`). TPU deltas:

- The `cuda_graph` axis disappears: every phase is jit-compiled, which IS the graph
  (reference worked around eager-mode launch latency; XLA doesn't have that problem).
- Family is resolved from the checkpoint's `model_type` first, with the reference's
  known-id table kept for exact-name parity.
- `offload=True` selects the host-DRAM weight-streaming runtime (offload/streaming.py);
  quantized checkpoints are detected from `quantization_config` in config.json.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .kv_cache import KVCache, init_kv_cache
from .llama import StaticModelArgs, init_llama_params, llama_forward
from .weights import load_llama_params

# Qwen2.5 serving vocab (checkpoints pad the embedding past it; ref qwen.py:12).
QWEN25_VOCAB = 151936

# Known model ids (parity with reference's _MODEL_MAPPING families).
_KNOWN_FAMILIES = {
    "llama": [
        "meta-llama/Llama-3.3-70B-Instruct", "meta-llama/Llama-3.1-70B-Instruct",
        "meta-llama/Llama-3.1-8B-Instruct", "meta-llama/Meta-Llama-3-70B-Instruct",
        "meta-llama/Meta-Llama-3-8B-Instruct", "meta-llama/Llama-3.2-1B-Instruct",
        "meta-llama/Llama-3.2-3B-Instruct", "Felladrin/Llama-68M-Chat-v1",
        "facebook/layerskip-llama3.2-1B", "Zhuominc/Llama-3-330M",
        "Zhuominc/Coder-670M", "Zhuominc/Coder-400M", "Zhuominc/Coder-400M-IT",
        "Zhuominc/FastCode-500M", "InfiniAILab/CodeDrafter-500M",
        "ibnzterrell/Meta-Llama-3.3-70B-Instruct-AWQ-INT4",
        "lambdalabs/Llama-3.3-70B-Instruct-AWQ-4bit",
        "casperhansen/llama-3.3-70b-instruct-awq",
        "hugging-quants/Meta-Llama-3.1-70B-Instruct-AWQ-INT4",
        "hugging-quants/Meta-Llama-3.1-8B-Instruct-AWQ-INT4",
        "casperhansen/deepseek-r1-distill-llama-70b-awq",
    ],
    "qwen2": ["Qwen/Qwen2.5", "Qwen/QwQ", "KirillR/QwQ-32B-Preview-AWQ",
              "casperhansen/deepseek-r1-distill-qwen-32b-awq"],
    "mistral": ["mistralai/Mistral", "mistralai/Ministral",
                "solidrust/Mistral-7B-Instruct-v0.3-AWQ",
                "stelterlab/Mistral-Small-24B-Instruct-2501-AWQ",
                "PyrTools/Ministral-8B-Instruct-2410-AWQ"],
    "gemma2": ["google/gemma-2"],
    "moe": ["mistralai/Mixtral"],
}


def resolve_family(model_name: str, cfg: Optional[ModelConfig] = None) -> str:
    if cfg is not None and cfg.model_type:
        mt = cfg.model_type.lower()
        if "mixtral" in mt:
            return "moe"
        if (cfg.num_local_experts or 0) > 0:
            # other MoE variants (qwen-moe, deepseek-moe, ...) store experts
            # under different tensor names than Mixtral's block_sparse_moe.* —
            # reject clearly instead of failing deep inside load_moe_params
            raise ValueError(
                f"unsupported MoE variant model_type={cfg.model_type!r} "
                f"(num_local_experts={cfg.num_local_experts}): only "
                "Mixtral-format checkpoints (block_sparse_moe.* expert "
                "tensors) are loadable as family 'moe'")
        if "gemma2" in mt:
            return "gemma2"
        if "qwen" in mt:
            return "qwen2"
        if "mistral" in mt:
            return "mistral"
        if "llama" in mt:
            return "llama"
    for family, prefixes in _KNOWN_FAMILIES.items():
        for p in prefixes:
            if model_name.startswith(p):
                return family
    return "llama"


class ModelRuntime:
    """A loaded model: config + params pytree + pure forward fn.

    The engine-facing contract (reference `models/base.py:4-31` reimagined
    functionally): `forward(params, kv, input_ids, position_ids, attn_mask,
    write_offset) -> (fp32 logits, kv)` is pure and jit-safe; state lives in the
    KVCache the caller owns and donates.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params: dict,
        max_length: int,
        dtype=jnp.bfloat16,
        family: str = "llama",
        n_layers: Optional[int] = None,
        model_name: str = "",
    ):
        self.cfg = cfg
        self.params = params
        self.max_length = max_length
        self.dtype = dtype
        self.family = family
        self.model_name = model_name
        self.args = StaticModelArgs.from_config(cfg, n_layers=n_layers)
        if family == "gemma2":
            from .gemma import gemma2_forward, GemmaStaticArgs

            self.gemma_args = GemmaStaticArgs.from_config(cfg, n_layers=n_layers)
            self._forward = gemma2_forward
        elif family == "moe":
            import functools

            from .moe import moe_decode_forward

            self._forward = functools.partial(
                moe_decode_forward, top_k=cfg.num_experts_per_tok)
        else:
            self._forward = llama_forward

    @property
    def forward(self) -> Callable:
        if getattr(self, "_tp", False):
            # tensor-parallel runtimes (parallel.mesh.shard_runtime) trace the
            # forward inside shard_map with Megatron collectives
            from ..parallel.mesh import tp_shard_map_forward

            return tp_shard_map_forward(self)
        if getattr(self, "_pp", False):
            # pipeline-parallel runtimes (parallel.pipeline.shard_runtime_pp):
            # layer blocks staged over 'pipe', per-stage KV, ppermute hops
            from ..parallel.pipeline import pp_shard_map_forward

            return pp_shard_map_forward(self)
        args = self.gemma_args if self.family == "gemma2" else self.args

        def fwd(params, kv, input_ids, position_ids, attn_mask, write_offset):
            return self._forward(params, args, kv, input_ids, position_ids, attn_mask, write_offset)

        return fwd

    def init_kv(self, kv_dtype=None) -> KVCache:
        return init_kv_cache(
            self.cfg, self.max_length, dtype=kv_dtype or self.dtype, num_layers=self.args.n_layers
        )

    @property
    def eos_ids(self):
        return self.cfg.eos_token_ids

    @property
    def supports_fused_phases(self) -> bool:
        """True if forward can be traced inside one engine-phase jit (resident weights)."""
        return True


class AutoModelLM:
    """from_pretrained dispatch (reference auto_model.py:156-182, minus cuda_graph)."""

    @classmethod
    def from_pretrained(
        cls,
        model_name: str,
        offload: bool = False,
        max_length: int = 8192,
        dtype=jnp.bfloat16,
        exit_layer: int = -1,
        num_cache_layers: int = 0,
        packed: bool = True,
        **kwargs,
    ) -> ModelRuntime:
        """packed=False keeps q/k/v and gate/up as separate weights — required for
        tensor-parallel sharding (column shards of a packed wqkv would straddle
        section boundaries, parallel/mesh.llama_param_specs). Ignored by the gemma
        and offload loaders (neither layout is TP-shardable)."""
        cfg = ModelConfig.from_pretrained(model_name)
        family = resolve_family(model_name, cfg)
        if family == "qwen2":
            # Qwen2.5 checkpoints pad the embedding (e.g. 152064 stored); serve the
            # real 151936-token vocab so draft/target token ids always align
            # (reference hardcodes this trim, ref qwen.py:12,27,47).
            cfg.vocab_size = min(cfg.vocab_size, QWEN25_VOCAB)
        n_layers = exit_layer if (exit_layer and exit_layer > 0) else None

        if cfg.quantization and cfg.quantization.get("method") == "awq":
            from ..quantization.loader import load_awq_runtime

            return load_awq_runtime(
                model_name, cfg, max_length=max_length, dtype=dtype,
                family=family, n_layers=n_layers, offload=offload,
                num_cache_layers=num_cache_layers, packed=packed,
            )
        if offload:
            from ..offload.streaming import OffloadModelRuntime

            return OffloadModelRuntime.load(
                model_name, cfg, max_length=max_length, dtype=dtype, family=family,
                n_layers=n_layers, num_cache_layers=num_cache_layers,
            )
        if family == "moe":
            from .moe import load_moe_params

            params = load_moe_params(model_name, cfg, dtype, n_layers=n_layers)
        elif family == "gemma2":
            from .gemma import load_gemma_params

            params = load_gemma_params(model_name, cfg, max_length, dtype, n_layers=n_layers)
        else:
            params = load_llama_params(model_name, cfg, max_length, dtype,
                                       n_layers=n_layers, packed=packed)
        return ModelRuntime(
            cfg, params, max_length, dtype=dtype, family=family, n_layers=n_layers,
            model_name=model_name,
        )


def early_exit_runtime(runtime: ModelRuntime, exit_layer: int) -> ModelRuntime:
    """Early-exit draft SHARING the target's weights: the first `exit_layer`
    decoder layers + the target's own final norm and lm_head (the reference's
    exit_layer trick, ref `llama.py:421,450-451`, loads a truncated copy; here
    the layer stacks are sliced in place, so the draft costs no extra HBM beyond
    its KV cache). A correlated draft like this yields acceptance far above the
    random-draft floor — the acceptance-evidence harness and bench use it."""
    layers = {k: v[:exit_layer] for k, v in runtime.params["layers"].items()}
    params = dict(runtime.params, layers=layers)
    return ModelRuntime(
        runtime.cfg, params, runtime.max_length, dtype=runtime.dtype,
        family=runtime.family, n_layers=exit_layer, model_name=runtime.model_name)


def random_runtime(
    cfg: ModelConfig, max_length: int = 128, dtype=jnp.float32, seed: int = 0,
    n_layers: Optional[int] = None,
) -> ModelRuntime:
    """Tiny random model for tests/benchmarks without checkpoints."""
    params = init_llama_params(cfg, jax.random.PRNGKey(seed), max_length, dtype, n_layers=n_layers)
    return ModelRuntime(cfg, params, max_length, dtype=dtype, n_layers=n_layers)


def random_awq_runtime(
    cfg: ModelConfig, max_length: int = 128, dtype=jnp.bfloat16, seed: int = 0,
    group_size: int = 128, n_layers: Optional[int] = None,
    quantize_lm_head: bool = False, weight_dist: str = "gaussian",
) -> ModelRuntime:
    """Random W4-quantized model; lets benchmarks exercise the real 4-bit kernels
    at 8B/70B shapes without checkpoints.

    weight_dist="gaussian" (default) builds each AwqTensor by AWQ-quantizing a
    gaussian weight matrix through the REAL pipeline (quantize_pack_device), so
    the synthetic scale/zero matrices have the structure actual checkpoints
    have: scales ~ per-column magnitude x small per-group variation (the
    group max-min of 128 gaussians concentrates to ~10% CV — measured here),
    zeros mid-range. That structure is what acceptance-emulation and the
    factorized-scale Int4F draft path legitimately depend on. "raw" keeps the
    old iid-uniform scales + uniform nibbles (scale CV ~55%, an adversarial
    structure no real checkpoint exhibits); the W4A16/W4A8 kernels are
    insensitive to the difference (same shapes, dtypes, and traffic)."""
    import numpy as np

    from ..ops.rope import rope_params
    from ..quantization.awq import AwqTensor, concat_awq, quantize_pack_device

    n = n_layers if n_layers is not None else cfg.num_hidden_layers
    H, D = cfg.hidden_size, cfg.resolved_head_dim
    Hq = cfg.num_attention_heads * D
    KV = cfg.num_key_value_heads * D
    I, V = cfg.intermediate_size, cfg.vocab_size
    rng = np.random.default_rng(seed)
    gkey = jax.random.PRNGKey(seed)
    counter = [0]

    def q_one(k_dim, n_dim):
        if weight_dist == "gaussian":
            # quantize a gaussian weight in N-chunks (fp32 intermediates of the
            # 8B head would be 2.1 GB whole); one fold_in per chunk keeps the
            # result deterministic in (seed, shapes) and backend-independent
            parts = []
            n_chunk = 8192
            for n0 in range(0, n_dim, n_chunk):
                counter[0] += 1
                w = jax.random.normal(jax.random.fold_in(gkey, counter[0]),
                                      (k_dim, min(n_chunk, n_dim - n0)),
                                      jnp.float32) * 0.02
                parts.append(quantize_pack_device(w, group_size, dtype=dtype))
            return parts[0] if len(parts) == 1 else concat_awq(parts)
        G = k_dim // group_size
        return AwqTensor(
            w8=jnp.asarray(rng.integers(0, 256, (k_dim // 2, n_dim), dtype=np.uint8).view(np.int8)),
            scales=jnp.asarray(
                rng.uniform(0.001, 0.01, (G, n_dim)).astype(np.float32)).astype(dtype),
            zeros=jnp.asarray(
                rng.integers(0, 16, (G, n_dim)).astype(np.float32)).astype(dtype),
        )

    def q(k_dim, n_dim, stack=True):
        # per-layer tuple, not stacked — see quantization/loader._stack_awq
        if not stack:
            return q_one(k_dim, n_dim)
        return tuple(q_one(k_dim, n_dim) for _ in range(n))

    layers = {
        "input_norm": jnp.ones((n, H), dtype),
        "post_norm": jnp.ones((n, H), dtype),
        "wqkv": q(H, Hq + 2 * KV), "wo": q(Hq, H),
        "gate_up": q(H, 2 * I), "down": q(I, H),
    }
    params = {
        "embed": jnp.asarray(
            (rng.standard_normal((V, H)) * 0.02).astype(np.float32)).astype(dtype),
        "final_norm": jnp.ones((H,), dtype),
        "layers": layers,
        **rope_params(cfg),
    }
    if not cfg.tie_word_embeddings:
        if quantize_lm_head:
            params["lm_head"] = q(H, V, stack=False)
        else:
            params["lm_head"] = jnp.asarray(
                (rng.standard_normal((H, V)) * 0.02).astype(np.float32)).astype(dtype)
    elif quantize_lm_head:
        # tied config: a W4 head (instead of the bf16 embed.T logits matmul) —
        # mirrors quantize_params' tied-head path for benchmark shapes
        params["lm_head"] = q(H, V, stack=False)
    return ModelRuntime(cfg, params, max_length, dtype=dtype, n_layers=n_layers)
