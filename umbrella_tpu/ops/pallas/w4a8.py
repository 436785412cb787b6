"""Fused W4A8 dequant+matmul Pallas kernel (opt-in, decode path).

Past the W4A16 floor: at S<=128 tokens the bf16 MXU is the bottleneck for the
W4A16 kernel (see w4a16.py docstring — MXU time is S-independent below S=128 at
2*128*K*N/197e12 s). The int8 MXU runs at 2x the bf16 rate on v5e (394 TOPS), so
quantizing activations to int8 per row halves the MXU floor; the weight stream is
unchanged (the packed W4 tensor is read once either way).

Math (split-halves AwqTensor layout, quantization/awq.py):

    sx[s]   = max|x[s,:]| / 127          (per-row symmetric activation scale)
    xq      = round(x / sx)  in int8
    y[s,n]  = sx[s] * sum_g  s_g[n] * ( xq[s, g] @ (w4[g] - z_g[n]) )   [int8 MXU]

Per-group int8 matmuls with fp32 scale application afterwards; (w4 - z) stays in
int8 ([-15, 15]). Per-ROW activation quantization (not per-tile) means a token's
quantized activations are identical whether it is processed in a tree batch or
alone — greedy spec decode therefore remains token-identical with the same
model's AR decode (the losslessness anchor), which per-tile quant would break.

No reference analogue: the reference's AWQ path is W4A16 only
(`umbrella/quantization/awq_utils.py:63-86`). This is a TPU-native extension,
opt-in via `ModelConfig.awq_act = "int8"`.

MEASURED (v5e, slope method, S=128 K=4096 N=28672): 0.229 ms/op vs w4a16's
0.172 ms — SLOWER despite the 2x int8 MXU rate. The per-group structure forces
64 sequential K=128-depth dots with fp32 VPU accumulation between them, wasting
MXU pipeline depth, while w4a16 dequantizes weight tiles elementwise and issues
full-K bf16 dots (88% of its MXU floor). A faster int8 path would need whole-K
int8 dots, which per-group scales forbid (scales are per (group, n) and cannot
move to the activation side). Kept opt-in for experimentation; W4A16 remains
the default and the faster kernel at all measured tree sizes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .w4a16 import _pick_bk2, _pick_bn


def _w4a8_kernel(xq_lo_ref, xq_hi_ref, sx_ref, w8_ref, s_lo_ref, z_lo_ref,
                 s_hi_ref, z_hi_ref, out_ref, acc_ref, *, group_size: int, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # nibble unpack via int32 (Mosaic lacks sub-int32 vector shifts), back to int8
    w32 = w8_ref[:].astype(jnp.int32)
    lo = (w32 & 0xF).astype(jnp.int8)
    hi = ((w32 >> 4) & 0xF).astype(jnp.int8)

    bk2, _ = lo.shape
    g2 = bk2 // group_size

    acc = jnp.zeros_like(acc_ref)
    for g in range(g2):
        sl = slice(g * group_size, (g + 1) * group_size)
        for xq_ref, w, s_ref, z_ref in ((xq_lo_ref, lo, s_lo_ref, z_lo_ref),
                                        (xq_hi_ref, hi, s_hi_ref, z_hi_ref)):
            # Fold the zero point in AFTER the MXU: xq @ (w - z) == xq @ w -
            # rowsum(xq) * z. Keeps raw nibbles (0..15) as the int8 MXU operand —
            # Mosaic has no int8 vector subtract (arith.subi fails to legalize).
            xg = xq_ref[:, sl]
            p = jnp.dot(xg, w[sl], preferred_element_type=jnp.int32)
            rs = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
            pf = (p.astype(jnp.float32)
                  - rs.astype(jnp.float32) * z_ref[g][None, :].astype(jnp.float32))
            acc += pf * s_ref[g][None, :].astype(jnp.float32)
    acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] * sx_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_n", "block_k2",
                                             "out_dtype"))
def w4a8_matmul(x: jnp.ndarray, q, interpret: bool = False,
                block_n: int | None = None, block_k2: int | None = None,
                out_dtype=None) -> jnp.ndarray:
    """x [S, K] @ split-halves W4 [K, N] with int8 activations -> [S, N]."""
    S, K = x.shape
    K2, N = q.w8.shape
    G = q.scales.shape[0]
    assert K == 2 * K2, (K, K2)
    group_size = K // G
    assert K2 % group_size == 0

    S_pad = max(32, ((S + 31) // 32) * 32)  # int8 sublane tile = 32
    if S_pad != S:
        x = jnp.pad(x, ((0, S_pad - S), (0, 0)))

    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    bn = block_n if block_n is not None else _pick_bn(N)
    bk2 = block_k2 if block_k2 is not None else _pick_bk2(K2, group_size)
    assert N % bn == 0 and K2 % bk2 == 0 and bk2 % group_size == 0
    n_k = K2 // bk2
    bg = bk2 // group_size
    xq_lo, xq_hi = xq[:, :K2], xq[:, K2:]
    s_lo, s_hi = q.scales[: G // 2], q.scales[G // 2:]
    z_lo, z_hi = q.zeros[: G // 2], q.zeros[G // 2:]

    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, group_size=group_size, n_k=n_k),
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((S_pad, bk2), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, bk2), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, 1), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_pad, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, N), out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((S_pad, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * K * N,
            bytes_accessed=K2 * N + 2 * G * N * 2 + S_pad * K + S_pad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq_lo, xq_hi, sx, q.w8, s_lo, z_lo, s_hi, z_hi)
    return out[:S] if S_pad != S else out
