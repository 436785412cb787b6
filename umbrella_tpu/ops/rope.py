"""Rotary position embeddings, including Llama-3 frequency scaling.

The reference reads `inv_freq` / `attention_scaling` off the HF model object and
caches cos/sin tables gathered per position (`umbrella/models/llama.py:48-60`). Here
the angles are computed ON THE FLY from (positions, inv_freq) — a tiny outer product
plus cos/sin on the VPU. Besides matching HF numerics (HF also computes the angles in
fp32), this keeps position lookup gather-free (see ops/select.py for why gathers are
banned from hot paths on this runtime).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def _base_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


def compute_inv_freq(cfg: ModelConfig) -> Tuple[np.ndarray, float]:
    """Return (inv_freq[head_dim//2], attention_scaling) honouring HF rope_scaling."""
    inv_freq = _base_inv_freq(cfg.resolved_head_dim, cfg.rope_theta)
    scaling = cfg.rope_scaling or {}
    rope_type = scaling.get("rope_type", scaling.get("type", "default"))
    attention_scaling = 1.0

    if rope_type == "llama3":
        # HF llama3 rule: leave high-frequency bands, divide low-frequency bands by
        # `factor`, smoothly interpolate in between.
        factor = scaling["factor"]
        low_factor = scaling["low_freq_factor"]
        high_factor = scaling["high_freq_factor"]
        old_len = scaling["original_max_position_embeddings"]
        low_wavelen = old_len / low_factor
        high_wavelen = old_len / high_factor
        wavelen = 2 * math.pi / inv_freq
        scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (old_len / wavelen - low_factor) / (high_factor - low_factor)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        is_medium = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
        inv_freq = np.where(is_medium, smoothed, scaled)
    elif rope_type == "linear":
        inv_freq = inv_freq / scaling["factor"]
    elif rope_type in ("default", "dynamic"):
        pass  # dynamic NTK only differs beyond max_position_embeddings
    # yarn etc. can be added as needed

    return inv_freq.astype(np.float64), attention_scaling


def rope_params(cfg: ModelConfig) -> dict:
    """Param-pytree entries for rope: {'rope_inv_freq': [D/2] f32, 'rope_scale': f32}."""
    inv_freq, attention_scaling = compute_inv_freq(cfg)
    return {
        "rope_inv_freq": jnp.asarray(inv_freq, jnp.float32),
        "rope_scale": jnp.float32(attention_scaling),
    }


def rope_angles(position_ids: jnp.ndarray, inv_freq: jnp.ndarray,
                attention_scaling) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [S, D] for the given positions (fp32, HF-duplicated layout)."""
    freqs = position_ids.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * attention_scaling, jnp.sin(emb) * attention_scaling


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,  # [S, H, D]
    k: jnp.ndarray,  # [S, KVH, D]
    inv_freq: jnp.ndarray,  # [D/2] f32
    attention_scaling,  # scalar
    position_ids: jnp.ndarray,  # [S]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cos, sin = rope_angles(position_ids, inv_freq, attention_scaling)
    cos = cos[:, None, :].astype(q.dtype)  # [S, 1, D]
    sin = sin[:, None, :].astype(q.dtype)
    q_out = q * cos + _rotate_half(q) * sin
    k_out = k * cos + _rotate_half(k) * sin
    return q_out, k_out


def precompute_rope_cache(
    cfg: ModelConfig, max_length: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin caches [max_length, head_dim] (kept for tests/tools; hot paths use
    on-the-fly rope_angles)."""
    inv_freq, attention_scaling = compute_inv_freq(cfg)
    t = np.arange(max_length, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return (jnp.asarray(np.cos(emb) * attention_scaling, dtype=dtype),
            jnp.asarray(np.sin(emb) * attention_scaling, dtype=dtype))
