"""Unknown/unsupported config keys must raise at `AutoEngine.from_config` with the
engine name — not be silently swallowed by `from_pretrained(**kwargs)` (the failure
mode where `tensor_parallel` in a config was consumed by nothing)."""
import pytest

from umbrella_tpu.speculation.auto_engine import AutoEngine

BASE = dict(model="m", draft_model="d", growmap_path="t.json")


def test_unknown_key_raises_with_engine_name():
    with pytest.raises(ValueError, match=r"tensor_paralel.*'static'"):
        AutoEngine.from_config(engine="static", tensor_paralel=4, **BASE)


def test_dynamic_rejects_static_keys():
    with pytest.raises(ValueError, match=r"growmap_path.*'dynamic'"):
        AutoEngine.from_config(engine="dynamic", **BASE)


def test_batched_rejects_unknown_key():
    with pytest.raises(ValueError, match=r"stop_distance.*'batched_static'"):
        AutoEngine.from_config(engine="batched_static", stop_distance=3, **BASE)


def test_batched_pipeline_parallel_is_loud():
    # allowed through the allowlist (so the message names the real problem),
    # rejected by the engine ctor as unsupported
    with pytest.raises(ValueError, match="pipeline_parallel"):
        AutoEngine.from_config(engine="batched_static", pipeline_parallel=4, **BASE)


def test_shipped_configs_pass_the_allowlist():
    """Every shipped configs/*.json must construct (model loading not attempted)."""
    import glob
    import json
    import os

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    for path in sorted(glob.glob(os.path.join(cfg_dir, "*.json"))):
        with open(path) as f:
            config = json.load(f)
        eng = AutoEngine.from_config(**config)
        assert eng is not None, path
