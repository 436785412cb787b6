"""Engine dispatch from JSON config (reference `speculation/auto_engine.py:4-22`).

Beyond the reference: `from_config` validates config keys against the selected
engine's consumed-key allowlist. The reference's engines silently swallow unknown
kwargs into `self.config` and forward them to `model.alloc(**config)` (ref
static:36-45) — a typo'd or unsupported key (e.g. `tensor_paralel`, or
`pipeline_parallel` on an engine that can't stage) loads an engine that quietly
ignores the user's intent. Here it raises with the engine name.
"""
from __future__ import annotations

from .dynamic_engine import DynamicEngine
from .static_engine import StaticEngine

# Keys consumed by the app/server layer (chatbot/gradio/api pop template etc.
# before from_config; APIServer strips "scheduler" — accepted here so a full
# documented-schema config can be passed straight through).
_APP_KEYS = frozenset({"template", "generation_length", "max_turns", "scheduler"})

# Keys consumed by AutoModelLM.from_pretrained / the engines' model setup.
_MODEL_KEYS = frozenset({"offload", "exit_layer", "num_cache_layers",
                         "quantize_draft"})

# Keys popped by SpecEngineBase.__init__ (plus dtype, a named ctor param).
_COMMON_KEYS = frozenset({
    "max_length", "stop_distance", "safe_buffer", "temperature", "topp",
    "repetition_penalty", "topk", "tokenizer", "eos_token_ids", "seed",
    "kv_dtype", "draft_topk_recall", "dtype",
})

_ENGINE_CONFIG_KEYS = {
    "static": _COMMON_KEYS | _MODEL_KEYS | _APP_KEYS | {
        "growmap_path", "growmap", "tensor_parallel", "pipeline_parallel",
        "expert_parallel"},
    "dynamic": _COMMON_KEYS | _MODEL_KEYS | _APP_KEYS | {
        "width", "num_beams", "depth", "tensor_parallel", "pipeline_parallel",
        "expert_parallel"},
    # batched: no offload (resident models only), no pipeline_parallel (both are
    # ALSO rejected loudly by BatchedStaticEngine.__init__ — listed here so the
    # error names them as unsupported-for-this-engine rather than unknown)
    "batched_static": (_COMMON_KEYS - {"stop_distance"}) | _APP_KEYS | {
        "growmap_path", "growmap", "batch_size", "segment_steps",
        "prefill_chunks_per_segment", "tensor_parallel", "pipeline_parallel",
        "expert_parallel", "offload", "exit_layer", "num_cache_layers",
        "quantize_draft"},
}


class AutoEngine:
    _ENGINE_MAPPING = {
        "static": StaticEngine,
        "dynamic": DynamicEngine,
    }

    @classmethod
    def _resolve(cls, engine_name: str):
        if engine_name == "batched_static":
            # lazy: serving layer imports models/batched which is heavier
            from ..serving.batched_engine import BatchedStaticEngine

            return BatchedStaticEngine
        if engine_name not in cls._ENGINE_MAPPING:
            raise ValueError(
                f"Engine type '{engine_name}' is not supported. Supported types: "
                f"{list(cls._ENGINE_MAPPING.keys()) + ['batched_static']}")
        return cls._ENGINE_MAPPING[engine_name]

    @classmethod
    def from_config(cls, device=None, **kwargs):
        engine_name = kwargs.pop("engine", "dynamic")
        engine_class = cls._resolve(engine_name)
        draft_model_name = kwargs.pop("draft_model", None)
        target_model_name = kwargs.pop("model", None)
        assert draft_model_name is not None
        assert target_model_name is not None
        unknown = sorted(set(kwargs) - _ENGINE_CONFIG_KEYS[engine_name])
        if unknown:
            raise ValueError(
                f"config key(s) {unknown} are not consumed by engine "
                f"'{engine_name}' (allowed: "
                f"{sorted(_ENGINE_CONFIG_KEYS[engine_name])})")
        return engine_class(
            draft_model_name=draft_model_name, target_model_name=target_model_name,
            device=device, **kwargs)
