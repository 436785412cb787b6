"""Fused W4A8 matmul for Int4F weights (factorized scales, full-K int8 dots).

The draft-build hot path. Math (see quantization/int4f.py for the format):

    y[s, n] = b[n] * sx[s] * ( xq[s, :] @ (q4[:, n] - 8) )
            = b[n] * sx[s] * ( xq @ q4  -  8 * rowsum(xq) )

where xq = round(x * a / sx) in int8 (per-row scale sx), q4 the packed nibbles.
Both the -8 zero shift and the row factor `a` live OUTSIDE the kernel: `a` is
folded into the activations before quantization, rowsum(xq) is one XLA
reduction. The kernel therefore issues only full-depth int8 x int8 MXU dots
(394 TOPS on v5e — 2x the bf16 rate that bounds the W4A16 kernel) over the
same split-halves nibble stream, with an int32 accumulator and a single fp32
scale application at the last K step. Nibble unpack is two VPU ops; there is
no (w - z) * s dequant expansion at all.

Why the earlier W4A8 kernel (w4a8.py) could not do this: AWQ's per-(group,
column) scales force K=group_size-deep dots with fp32 fixups between them,
wasting the MXU pipeline. Int4F's rank-1 scale restriction is what buys the
full-K dot; the representational loss lands on the draft's acceptance rate,
never on output correctness.

MEASURED (v5e, slope method over an in-jit chained scan, 2026-08, S=24 rows,
tuned blocks — see _pick_bn_int8):
  8B gate_up  [4096, 28672]: 0.092 ms vs W4A16 0.155  (int8 MXU floor 0.075)
  8B qkv      [4096,  6144]: 0.028 ms vs W4A16 0.033
  8B wo       [4096,  4096]: 0.015 ms vs W4A16 0.027
  8B down    [14336,  4096]: 0.045 ms vs W4A16 0.085
  8B lm_head [4096, 128256]: 0.412 ms vs W4A16 0.615  (bn=768; DMA floor 0.36)
End-to-end at the 8B-AWQ early-exit(3/32) primary (24x6 tree): decode step
25.6 -> 21.6 ms with acceptance unchanged (the shared prefix is converted on
the TARGET, quantization/int4f.hybridize_shared_prefix; converting only the
draft's copy adds requant noise on otherwise bit-shared weights and collapses
acceptance 5.1 -> 1.1 on flat synthetic logits).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pick_bn_int8(n: int) -> int:
    # Swept on v5e (2026-08, S=24, slope method): bn=1024 beats 512 at the 8B
    # MLP shapes (gate_up 0.092 vs 0.110 ms; down 0.045 vs 0.071) — without the
    # W4A16 kernel's fp32 dequant temporaries the VMEM budget allows the wider
    # block and the shorter grid wins. The V=128256 head has no 1024-divisor
    # (128256 = 2^8*3*167) — bn=768 with whole-K2 blocks measures 0.417 ms
    # (bk2=1024: 0.492; bn=384: 0.478). bn=2048 fails to compile (VMEM).
    for bn in (1024, 768, 512, 384, 256, 128):
        if n % bn == 0:
            return bn
    raise ValueError(f"N={n} must be a multiple of 128")


def _w4a8f_kernel(xq_lo_ref, xq_hi_ref, srow_ref, w8_ref, b_ref, out_ref,
                  acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # nibble unpack via int32 (Mosaic lacks sub-int32 vector shifts), back to
    # int8 for the MXU; values 0..15, zero-point 8 corrected via srow
    w32 = w8_ref[:].astype(jnp.int32)
    lo = (w32 & 0xF).astype(jnp.int8)
    hi = ((w32 >> 4) & 0xF).astype(jnp.int8)

    acc = jnp.dot(xq_lo_ref[:], lo, preferred_element_type=jnp.int32)
    acc += jnp.dot(xq_hi_ref[:], hi, preferred_element_type=jnp.int32)
    acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        # srow = sx * (acc - 8*rowsum) pre-split: srow[:, 0] = sx, [:, 1] = rowsum
        sx = srow_ref[:, 0:1]
        rs = srow_ref[:, 1:2]
        out_ref[:] = ((acc_ref[:].astype(jnp.float32) - 8.0 * rs) * sx
                      * b_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _pick_bk2_int8(k2: int) -> int:
    # int8 sublane tile is 32; larger K blocks -> fewer grid steps. VMEM at
    # bk2=4096, bn=768: w8 block 3 MB (+double buffering) — comfortably inside
    # the ~16 MB budget alongside the int32 accumulator.
    for bk2 in (4096, 2048, 1024, 512, 256, 128, 64, 32):
        if k2 % bk2 == 0:
            return bk2
    raise ValueError(f"K/2={k2} must be a multiple of 32")


@functools.partial(jax.jit, static_argnames=("interpret", "block_n", "block_k2",
                                             "out_dtype"))
def w4a8f_matmul(x: jnp.ndarray, q, interpret: bool = False,
                 block_n: int | None = None, block_k2: int | None = None,
                 out_dtype=None) -> jnp.ndarray:
    """x [S, K] @ Int4FTensor [K, N] -> [S, N] in out_dtype (default x.dtype)."""
    S, K = x.shape
    K2, N = q.w8.shape
    assert K == 2 * K2, (K, K2)

    xq, sx, rsum = quantize_activations_int8(x, q.a)

    S_pad = max(32, ((S + 31) // 32) * 32)  # int8 sublane tile
    if S_pad != S:
        xq = jnp.pad(xq, ((0, S_pad - S), (0, 0)))
        sx = jnp.pad(sx, ((0, S_pad - S), (0, 0)))
        rsum = jnp.pad(rsum, ((0, S_pad - S), (0, 0)))
    srow = jnp.concatenate([sx, rsum.astype(jnp.float32)], axis=1)  # [S_pad, 2]

    bn = block_n if block_n is not None else _pick_bn_int8(N)
    bk2 = block_k2 if block_k2 is not None else _pick_bk2_int8(K2)
    assert N % bn == 0 and K2 % bk2 == 0
    n_k = K2 // bk2
    xq_lo, xq_hi = xq[:, :K2], xq[:, K2:]
    b2 = q.b.reshape(1, N)

    out = pl.pallas_call(
        functools.partial(_w4a8f_kernel, n_k=n_k),
        grid=(N // bn, n_k),
        in_specs=[
            pl.BlockSpec((S_pad, bk2), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, bk2), lambda j, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((S_pad, 2), lambda j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_pad, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, N), out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((S_pad, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * K * N,
            bytes_accessed=K2 * N + N * 4 + S_pad * K + S_pad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq_lo, xq_hi, srow, q.w8, b2)
    return out[:S] if S_pad != S else out


def quantize_activations_int8(x: jnp.ndarray, a: jnp.ndarray):
    """(xq int8 [S, K], sx fp32 [S, 1], rowsum int32->[S, 1]) for x*a per-row
    symmetric quantization. Per ROW (token), so values are batch-invariant."""
    xf = x.astype(jnp.float32) * a[None, :].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    rsum = jnp.sum(xq.astype(jnp.int32), axis=1, keepdims=True)
    return xq, sx, rsum


def w4a8f_matmul_xla(x: jnp.ndarray, q, out_dtype=None) -> jnp.ndarray:
    """XLA fallback with IDENTICAL numerics to the kernel (integer dot of the
    same quantized operands) — used on CPU so engine tests exercise the same
    draft distribution the TPU runs."""
    xq, sx, rsum = quantize_activations_int8(x, q.a)
    w32 = q.w8.astype(jnp.int32)
    lo = (w32 & 0xF) - 8
    hi = ((w32 >> 4) & 0xF) - 8
    acc = (jnp.dot(xq[:, : q.w8.shape[0]].astype(jnp.int32), lo)
           + jnp.dot(xq[:, q.w8.shape[0]:].astype(jnp.int32), hi))
    # kernel computes (xq @ q4) - 8*rowsum == xq @ (q4 - 8); both exact in int32
    del rsum
    y = acc.astype(jnp.float32) * sx * q.b[None, :].astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


# Kernel token cap: the int8 kernel's VMEM working set scales with S_pad
# (xq lo/hi + int32 acc + bf16 out blocks, all [S_pad, *]). At a 512-token
# prefill chunk it exceeds the ~16 MB scoped-vmem budget (measured on v5e
# 2026-08-22: "16.16M vs limit 16.00M" compile failure at
# [512, 2048]x[4096, 6144]); linear S_pad scaling puts 384 at ~12 MB — safe —
# and 384 keeps every documented batched-DECODE point on the int8 kernel
# (B x tree_size tops out at 288 verify tokens for the promoted B=32-48 x 2x3
# serving rows, which compiled and ran at the recorded 1043/1327 tok/s).
# Above the cap (prefill-sized calls only) dequantize to bf16 and ride the
# MXU dense — at many tokens the matmul is MXU-throughput-bound and the int8
# rate advantage is irrelevant (same tradeoff as
# quantization/awq.FP16_MATMUL_HEURISTIC_TOKENS). The CPU branch mirrors the
# SAME routing so engine tests exercise the same per-phase numerics the TPU
# runs (int8-exact at decode sizes, dequant-dense at prefill sizes).
INT8_KERNEL_MAX_TOKENS = 384


def int4f_matmul(x: jnp.ndarray, q, bias=None, out_dtype=None) -> jnp.ndarray:
    """Shape-flexible entry: x [..., K] -> [..., N]; int8 kernel on TPU at
    decode token counts, dequant+bf16 dense above INT8_KERNEL_MAX_TOKENS
    (mirrored on CPU), exact XLA emulation elsewhere."""
    import numpy as np

    tokens = int(np.prod(x.shape[:-1]))
    x2 = x.reshape(tokens, x.shape[-1])
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if tokens > INT8_KERNEL_MAX_TOKENS:
        from ...quantization.int4f import dequantize_int4f

        w = dequantize_int4f(q, dtype=jnp.bfloat16)
        y = jnp.dot(x2.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32) \
            .astype(out_dtype or x.dtype)
    elif on_tpu:
        y = w4a8f_matmul(x2, q, out_dtype=out_dtype)
    else:
        y = w4a8f_matmul_xla(x2, q, out_dtype=out_dtype)
    y = y.reshape(*x.shape[:-1], q.n)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
