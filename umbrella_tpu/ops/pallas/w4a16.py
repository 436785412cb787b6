"""Fused W4A16 dequant+matmul Pallas kernel (decode path).

TPU-native replacement for the reference's external `awq_ext.gemm_forward_cuda`
(reference `umbrella/quantization/awq_utils.py:70-77`). Operates on the split-halves
packing (quantization/awq.py): the uint8 weight tile's low nibbles are original rows
[0, K/2) and high nibbles rows [K/2, K), so the kernel computes

    y = x[:, :K/2] @ (lo - z)*s  +  x[:, K/2:] @ (hi - z)*s

with zero lane/sublane interleaving — nibble unpack is two VPU ops, scale/zero
expansion is a sublane repeat, and both halves feed the MXU directly. The weight
matrix streams HBM->VMEM once per call (the op is bandwidth-bound at decode sizes,
which is exactly why the 4-bit format wins).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4a16_kernel(x_ref, w8_ref, scales_ref, zeros_ref, out_ref, *, group_size: int):
    k2 = w8_ref.shape[0]  # packed rows = K/2
    g2 = scales_ref.shape[0] // 2  # groups covering the low half

    # int8-packed nibbles; Mosaic legalizes int32 shifts/masks (not uint8), and
    # (x >> 4) & 0xF is sign-safe on two's-complement int32
    w32 = w8_ref[:].astype(jnp.int32)
    lo = (w32 & 0xF).astype(jnp.float32)
    hi = ((w32 >> 4) & 0xF).astype(jnp.float32)

    s = scales_ref[:].astype(jnp.float32)
    z = zeros_ref[:].astype(jnp.float32)
    bn = s.shape[-1]

    def expand(a):  # [g2, bn] per-group -> [k2, bn] per-row (np.repeat semantics)
        return jnp.broadcast_to(a[:, None, :], (g2, group_size, bn)).reshape(k2, bn)

    s_lo, z_lo = expand(s[:g2]), expand(z[:g2])
    s_hi, z_hi = expand(s[g2:]), expand(z[g2:])

    w_lo = ((lo - z_lo) * s_lo).astype(jnp.bfloat16)
    w_hi = ((hi - z_hi) * s_hi).astype(jnp.bfloat16)

    x = x_ref[:]
    x_lo = x[:, :k2].astype(jnp.bfloat16)
    x_hi = x[:, k2:].astype(jnp.bfloat16)
    acc = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _pick_bn(n: int) -> int:
    for bn in (512, 256, 128):
        if n % bn == 0:
            return bn
    raise ValueError(f"N={n} must be a multiple of 128")


@functools.partial(jax.jit, static_argnames=("interpret",))
def w4a16_matmul(x: jnp.ndarray, q, interpret: bool = False) -> jnp.ndarray:
    """x [S, K] @ split-halves W4 [K, N] -> [S, N] in x.dtype (fp32 accumulation)."""
    S, K = x.shape
    K2, N = q.w8.shape
    G = q.scales.shape[0]
    assert K == 2 * K2, (K, K2)
    group_size = K // G
    assert K2 % group_size == 0, "K/2 must be divisible by group_size (split-halves)"

    # pad token rows to the bf16 sublane tile
    S_pad = max(16, ((S + 15) // 16) * 16)
    if S_pad != S:
        x = jnp.pad(x, ((0, S_pad - S), (0, 0)))

    bn = _pick_bn(N)
    out = pl.pallas_call(
        functools.partial(_w4a16_kernel, group_size=group_size),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((S_pad, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_pad, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * K * N,
            bytes_accessed=K2 * N + 2 * G * N * 2 + S_pad * K * 2 + S_pad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q.w8, q.scales, q.zeros)
    return out[:S] if S_pad != S else out
