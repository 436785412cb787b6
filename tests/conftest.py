"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

This is the TPU-world replacement for the reference's absent test infra (SURVEY.md §4):
mesh/pjit code is exercised on a simulated 8-device host mesh.
Must run before jax is imported anywhere.
"""
import os

# Force CPU even if the outer env points at a real TPU (JAX_PLATFORMS=axon/tpu):
# unit tests must never grab the chip the benchmark driver uses.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Plugins (jaxtyping) import jax before this conftest runs, so the env vars above may
# be read too late — override the live config as well (backends not yet initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402

_exit_status = {"code": 0}


def pytest_sessionfinish(session, exitstatus):
    _exit_status["code"] = int(exitstatus)


def pytest_unconfigure(config):
    # torch's interpreter shutdown hangs ~2min in this sandbox (background thread
    # with no network egress); hard-exit once pytest has printed its summary.
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exit_status["code"])


@pytest.fixture(scope="session")
def tiny_cfg():
    from umbrella_tpu.config import ModelConfig

    return ModelConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        eos_token_id=2,
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (spawns subprocesses); deselect with -m 'not slow'")
