"""Flash tree-attention kernel vs the dense oracle (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from umbrella_tpu.ops.attention import attend_dense
from umbrella_tpu.ops.pallas.tree_attention import attend_flash


def _rand(shape, rng, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


@pytest.mark.parametrize("S,H,KVH,D,L,limit", [
    (8, 8, 4, 64, 256, 100),
    (16, 4, 4, 128, 512, 512),
    (8, 8, 2, 64, 256, 30),  # limit < one block
])
def test_flash_matches_dense(S, H, KVH, D, L, limit):
    rng = np.random.default_rng(0)
    q = jnp.asarray(_rand((S, H, D), rng))
    k = jnp.asarray(_rand((KVH, L, D), rng))
    v = jnp.asarray(_rand((KVH, L, D), rng))
    # random mask restricted to [0, limit), with at least one visible slot per row
    mask_np = rng.random((S, L)) > 0.4
    mask_np[:, limit:] = False
    mask_np[:, 0] = True
    mask = jnp.asarray(mask_np)

    out = attend_flash(q, k, v, mask, jnp.int32(limit), block_k=128, interpret=True)
    ref = attend_dense(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_soft_cap():
    rng = np.random.default_rng(1)
    S, H, KVH, D, L = 8, 4, 2, 64, 256
    q = jnp.asarray(_rand((S, H, D), rng, 2.0))
    k = jnp.asarray(_rand((KVH, L, D), rng, 2.0))
    v = jnp.asarray(_rand((KVH, L, D), rng))
    mask_np = np.ones((S, L), bool)
    mask = jnp.asarray(mask_np)
    out = attend_flash(q, k, v, mask, jnp.int32(L), soft_cap=20.0, block_k=128,
                       interpret=True)
    ref = attend_dense(q, k, v, mask, logits_soft_cap=20.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_ignores_kv_beyond_limit():
    """Slots >= kv_limit must not affect the result even if the mask is sloppy there."""
    rng = np.random.default_rng(2)
    S, H, KVH, D, L, limit = 8, 4, 2, 64, 512, 128
    q = jnp.asarray(_rand((S, H, D), rng))
    k = _rand((KVH, L, D), rng)
    v = _rand((KVH, L, D), rng)
    mask_np = np.zeros((S, L), bool)
    mask_np[:, :limit] = True
    out1 = attend_flash(q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask_np),
                        jnp.int32(limit), block_k=128, interpret=True)
    k[:, limit:] = 1e6  # garbage beyond the live window
    v[:, limit:] = 1e6
    out2 = attend_flash(q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask_np),
                        jnp.int32(limit), block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)
