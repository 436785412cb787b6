"""RMS norms (fp32 accumulation, matching HF semantics).

TPU-native replacement for the reference's `flashinfer.rmsnorm` /
`flashinfer.gemma_rmsnorm` calls (reference: `umbrella/models/model_utils.py:54-76`).
These are plain jnp — XLA fuses them into neighbouring ops, so a handwritten kernel
buys nothing here.
"""
import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """y = x / rms(x) * w, computed in fp32, cast back to x.dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)


def gemma_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Gemma flavour: scale by (1 + w) instead of w."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(dtype)
