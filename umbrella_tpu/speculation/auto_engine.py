"""Engine dispatch from JSON config (reference `speculation/auto_engine.py:4-22`)."""
from __future__ import annotations

from .dynamic_engine import DynamicEngine
from .static_engine import StaticEngine


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
        return engine_class(
            draft_model_name=draft_model_name, target_model_name=target_model_name,
            device=device, **kwargs)
