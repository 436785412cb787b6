"""Fused W4A16 dequant+matmul Pallas kernel (decode path).

TPU-native replacement for the reference's external `awq_ext.gemm_forward_cuda`
(reference `umbrella/quantization/awq_utils.py:70-77`). Operates on the split-halves
packing (quantization/awq.py): the int8 weight tile's low nibbles are original rows
[0, K/2) and high nibbles rows [K/2, K), so the kernel computes

    y = x[:, :K/2] @ (lo - z)*s  +  x[:, K/2:] @ (hi - z)*s

with zero lane/sublane interleaving — nibble unpack is two VPU ops, scale/zero
expansion is a sublane broadcast, and both halves feed the MXU directly. The packed
weight streams HBM->VMEM exactly once.

Measured roofline (v5e, slope method over in-jit scan, 2026-08): ~390-420 GB/s of
packed-weight traffic at S=16..128 vs ~740 GB/s for a dense bf16 XLA matmul on the
same shapes. The gap is NOT a DMA or VPU deficiency: at S tokens the MXU runs at
S/128 efficiency, so MXU time for x[S,K] @ W[K,N] is S-independent below S=128
(2*128*K*N / 197e12 s), and at 8B shapes that (~0.15 ms for the gate|up matrix)
exceeds both the DMA time (~0.08 ms at full bandwidth) and the VPU dequant time
(~0.08 ms). Empirically kernel time is FLAT from S=16 to S=128 and doubles at
S=256 — i.e. the kernel is MXU-latency-bound, already at its structural limit for
a W4A16 (bf16 MXU) design. Consequences exploited elsewhere:
  - speculation trees up to ~128 nodes verify at the SAME cost as 16-node trees
    (see trees/ and configs: TPU configs default to larger growmaps than the
    reference's 31-43 node GPU trees);
  - alternate-variant sweeps (grouped per-128-row MXU dequant, all-bf16 VPU
    dequant, zs-precompute) all land within noise of this kernel or worse
    (bf16 VPU arithmetic legalizes to f32 with pack/unpack overhead on Mosaic).
Going faster at small S requires the int8 MXU path (W4A8), a numerics change.

Grid is (N tiles, K tiles) with an fp32 accumulator in scratch — K-tiling keeps the
fp32 dequant temporaries inside the ~16MB VMEM budget for 70B-scale matrices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4a16_kernel(x_lo_ref, x_hi_ref, w8_ref, s_lo_ref, z_lo_ref, s_hi_ref, z_hi_ref,
                  out_ref, acc_ref, *, group_size: int, n_k: int,
                  layered: bool = False):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def rd(ref):  # layered blocks carry a leading (1,) layer dim
        return ref[0] if layered else ref[:]

    # int8-packed nibbles; Mosaic legalizes int32 shifts/masks (not uint8), and
    # (x >> 4) & 0xF is sign-safe on two's-complement int32
    w32 = rd(w8_ref).astype(jnp.int32)
    lo = (w32 & 0xF).astype(jnp.float32)
    hi = ((w32 >> 4) & 0xF).astype(jnp.float32)

    bk2, bn = lo.shape
    g2 = bk2 // group_size

    def expand(a):  # [g2, bn] per-group -> [bk2, bn] per-row (np.repeat semantics)
        return jnp.broadcast_to(a[:, None, :], (g2, group_size, bn)).reshape(bk2, bn)

    w_lo = ((lo - expand(rd(z_lo_ref).astype(jnp.float32)))
            * expand(rd(s_lo_ref).astype(jnp.float32))).astype(jnp.bfloat16)
    w_hi = ((hi - expand(rd(z_hi_ref).astype(jnp.float32)))
            * expand(rd(s_hi_ref).astype(jnp.float32))).astype(jnp.bfloat16)

    acc = jnp.dot(x_lo_ref[:].astype(jnp.bfloat16), w_lo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi_ref[:].astype(jnp.bfloat16), w_hi,
                   preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pick_bn(n: int) -> int:
    # larger bn => shorter grid => less per-step overhead. The V=128256 lm_head
    # divides by 768 (167 steps): slope-measured 0.261 vs 0.305 ms at the
    # K=1536 draft head (S=24, the MXU-latency floor is 0.256 ms) and 0.758 vs
    # 0.784 ms at the K=4096 8B head (v5e, 2026-08). bn=768/bk2=2048 fp32
    # dequant temporaries are 12.6 MB — still inside the ~16 MB VMEM budget.
    # Layer-sized N keeps 512 (wqkv N=6144 measured 0.038 at 512 vs 0.039 at
    # 768 — within noise; no reason to churn those shapes).
    if n >= 65536 and n % 768 == 0:
        return 768
    for bn in (512, 384, 256, 128):
        if n % bn == 0:
            return bn
    raise ValueError(f"N={n} must be a multiple of 128")


def _pick_bk2(k2: int, group_size: int) -> int:
    # swept on v5e: bk2=2048/bn=512 is fastest that still fits the fp32 dequant
    # temporaries (2 x bk2 x bn x 4B ~= 8MB) in VMEM; scale blocks need >= 8
    # sublanes (so bk2 >= 8*group_size) — OR to span the whole scale array, whose
    # block then equals its overall dim (always legal; e.g. hidden=1536 drafts
    # have only 6 groups per half)
    for bk2 in (2048, 1024, 512, 256, 128):
        if k2 % bk2 == 0 and bk2 % group_size == 0 and bk2 // group_size >= 8:
            return bk2
    assert k2 % group_size == 0
    return k2


def _w4a16_gusilu_kernel(x_lo_ref, x_hi_ref, wg_ref, wu_ref,
                         sg_lo_ref, zg_lo_ref, sg_hi_ref, zg_hi_ref,
                         su_lo_ref, zu_lo_ref, su_hi_ref, zu_hi_ref,
                         out_ref, g_acc, u_acc, *, group_size: int, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)
        u_acc[:] = jnp.zeros_like(u_acc)

    def dequant(w8_ref, s_lo_ref, z_lo_ref, s_hi_ref, z_hi_ref):
        w32 = w8_ref[:].astype(jnp.int32)
        lo = (w32 & 0xF).astype(jnp.float32)
        hi = ((w32 >> 4) & 0xF).astype(jnp.float32)
        bk2, bn = lo.shape
        g2 = bk2 // group_size

        def expand(a):
            return jnp.broadcast_to(a[:, None, :], (g2, group_size, bn)) \
                .reshape(bk2, bn)

        w_lo = ((lo - expand(z_lo_ref[:].astype(jnp.float32)))
                * expand(s_lo_ref[:].astype(jnp.float32))).astype(jnp.bfloat16)
        w_hi = ((hi - expand(z_hi_ref[:].astype(jnp.float32)))
                * expand(s_hi_ref[:].astype(jnp.float32))).astype(jnp.bfloat16)
        return w_lo, w_hi

    x_lo = x_lo_ref[:].astype(jnp.bfloat16)
    x_hi = x_hi_ref[:].astype(jnp.bfloat16)
    wg_lo, wg_hi = dequant(wg_ref, sg_lo_ref, zg_lo_ref, sg_hi_ref, zg_hi_ref)
    g_acc[:] += jnp.dot(x_lo, wg_lo, preferred_element_type=jnp.float32) \
        + jnp.dot(x_hi, wg_hi, preferred_element_type=jnp.float32)
    wu_lo, wu_hi = dequant(wu_ref, su_lo_ref, zu_lo_ref, su_hi_ref, zu_hi_ref)
    u_acc[:] += jnp.dot(x_lo, wu_lo, preferred_element_type=jnp.float32) \
        + jnp.dot(x_hi, wu_hi, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        g = g_acc[:]
        out_ref[:] = (g * jax.lax.logistic(g) * u_acc[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_n", "block_k2",
                                             "out_dtype"))
def w4a16_gate_up_silu(x: jnp.ndarray, q, interpret: bool = False,
                       block_n: int | None = None, block_k2: int | None = None,
                       out_dtype=None) -> jnp.ndarray:
    """Fused x @ W4[gate|up] -> silu(gate) * up in ONE kernel: [S, K] -> [S, I].

    `q` is a packed gate_up AwqTensor ([K, 2I], gate columns [0, I), up columns
    [I, 2I) — loader `stack_packed` order). The kernel runs BOTH column tiles
    (gate at j, up at j + I/bn — the same w8/scales/zeros arrays passed twice
    with shifted index maps; total DMA bytes unchanged) and applies
    silu(g) * u on the fp32 accumulators in the epilogue.

    MEASURED SLOWER than the composed sequence — kept as an explored variant,
    NOT on any default path (same status as w4a8.py). v5e slope method,
    2026-08, 8B MLP shapes H=4096 I=14336, S=127: composed
    gate_up-matmul -> XLA silu*mul = 0.171 ms vs fused 0.197 (bn=256 bk2=2048)
    / 0.211 (256/1024) / 0.179-0.192 (512/1024); S=24 composed 0.134 vs fused
    0.163. Why: each grid step holds FOUR (bk2, bn) fp32 dequant temporaries
    (the single-matmul kernel holds two) and issues two dependent accumulator
    chains, which costs more VMEM-pipeline overlap than the saved [S, 2I] HBM
    round-trip (~25 us) + dispatch boundary recover. The per-layer chain gap
    over the summed MXU floors (~65 us/layer at S=127, /tmp-probe 2026-08) is
    MXU ramp internal to each kernel, not boundary overhead this fusion can
    reclaim. bk2=512 is illegal (scale blocks need >= 8 sublane groups)."""
    S, K = x.shape
    K2, N2 = q.w8.shape
    assert K == 2 * K2
    I = N2 // 2
    G = q.scales.shape[0]
    group_size = K // G
    S_pad = max(16, ((S + 15) // 16) * 16)
    if S_pad != S:
        x = jnp.pad(x, ((0, S_pad - S), (0, 0)))
    bn = block_n if block_n is not None else _pick_bn(I)
    bk2 = block_k2 if block_k2 is not None else min(_pick_bk2(K2, group_size), 1024)
    assert I % bn == 0 and K2 % bk2 == 0 and bk2 % group_size == 0
    n_k = K2 // bk2
    bg = bk2 // group_size
    nj = I // bn  # up column-block offset in units of bn
    x_lo, x_hi = x[:, :K2], x[:, K2:]
    s_lo, s_hi = q.scales[: G // 2], q.scales[G // 2:]
    z_lo, z_hi = q.zeros[: G // 2], q.zeros[G // 2:]

    x_spec = pl.BlockSpec((S_pad, bk2), lambda j, k: (0, k),
                          memory_space=pltpu.VMEM)
    wg_spec = pl.BlockSpec((bk2, bn), lambda j, k: (k, j),
                           memory_space=pltpu.VMEM)
    wu_spec = pl.BlockSpec((bk2, bn), lambda j, k: (k, j + nj),
                           memory_space=pltpu.VMEM)
    gg_spec = pl.BlockSpec((bg, bn), lambda j, k: (k, j),
                           memory_space=pltpu.VMEM)
    gu_spec = pl.BlockSpec((bg, bn), lambda j, k: (k, j + nj),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_w4a16_gusilu_kernel, group_size=group_size, n_k=n_k),
        grid=(nj, n_k),
        in_specs=[x_spec, x_spec, wg_spec, wu_spec,
                  gg_spec, gg_spec, gg_spec, gg_spec,
                  gu_spec, gu_spec, gu_spec, gu_spec],
        out_specs=pl.BlockSpec((S_pad, bn), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, I), out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((S_pad, bn), jnp.float32),
                        pltpu.VMEM((S_pad, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * S_pad * K * I,
            bytes_accessed=K2 * N2 + 2 * G * N2 * 2 + S_pad * K * 2 + S_pad * I * 2,
            transcendentals=S_pad * I,
        ),
        interpret=interpret,
    )(x_lo, x_hi, q.w8, q.w8, s_lo, z_lo, s_hi, z_hi, s_lo, z_lo, s_hi, z_hi)
    return out[:S] if S_pad != S else out


@functools.partial(jax.jit, static_argnames=("interpret", "block_n", "block_k2",
                                             "out_dtype"))
def w4a16_matmul(x: jnp.ndarray, q, interpret: bool = False,
                 block_n: int | None = None, block_k2: int | None = None,
                 out_dtype=None, layer_idx=None) -> jnp.ndarray:
    """x [S, K] @ split-halves W4 [K, N] -> [S, N] in out_dtype (default x.dtype;
    fp32 accumulation either way — fp32 out is exact, used for lm_head logits).

    Layered mode: q.w8 may be a STACKED [n_layers, K/2, N] array (scales/zeros
    [n_layers, G, N]) with `layer_idx` a traced scalar. The kernel indexes the
    layer itself via scalar prefetch, so per-layer weights are DMA'd straight
    from the stacked HBM buffer — an XLA dynamic-slice of the stack would
    materialize a full per-layer copy (~0.3 ms/layer at 8B shapes) because
    pallas inputs must be whole buffers. Same trick as the layered flash
    attention kernel (tree_attention.py)."""
    S, K = x.shape
    layered = q.w8.ndim == 3
    if layered:
        assert layer_idx is not None
        _n_layers, K2, N = q.w8.shape
        G = q.scales.shape[1]
    else:
        K2, N = q.w8.shape
        G = q.scales.shape[0]
    assert K == 2 * K2, (K, K2)
    group_size = K // G
    assert K2 % group_size == 0, "K/2 must be divisible by group_size (split-halves)"

    # pad token rows to the bf16 sublane tile
    S_pad = max(16, ((S + 15) // 16) * 16)
    if S_pad != S:
        x = jnp.pad(x, ((0, S_pad - S), (0, 0)))

    bn = block_n if block_n is not None else _pick_bn(N)
    bk2 = block_k2 if block_k2 is not None else _pick_bk2(K2, group_size)
    assert N % bn == 0 and K2 % bk2 == 0 and bk2 % group_size == 0
    n_k = K2 // bk2
    bg = bk2 // group_size
    x_lo, x_hi = x[:, :K2], x[:, K2:]
    if layered:
        s_lo, s_hi = q.scales[:, : G // 2], q.scales[:, G // 2 :]
        z_lo, z_hi = q.zeros[:, : G // 2], q.zeros[:, G // 2 :]
    else:
        s_lo, s_hi = q.scales[: G // 2], q.scales[G // 2 :]
        z_lo, z_hi = q.zeros[: G // 2], q.zeros[G // 2 :]

    if layered:
        def kern(li_ref, *refs):  # scalar-prefetch ref is consumed by index maps
            _w4a16_kernel(*refs, group_size=group_size, n_k=n_k, layered=True)
    else:
        kern = functools.partial(_w4a16_kernel, group_size=group_size, n_k=n_k,
                                 layered=False)
    out_shape = jax.ShapeDtypeStruct((S_pad, N), out_dtype or x.dtype)
    scratch = [pltpu.VMEM((S_pad, bn), jnp.float32)]
    cost = pl.CostEstimate(
        flops=2 * S_pad * K * N,
        bytes_accessed=K2 * N + 2 * G * N * 2 + S_pad * K * 2 + S_pad * N * 2,
        transcendentals=0,
    )
    if layered:
        x_spec = pl.BlockSpec((S_pad, bk2), lambda j, k, li: (0, k),
                              memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((1, bk2, bn), lambda j, k, li: (li[0], k, j),
                              memory_space=pltpu.VMEM)
        g_spec = pl.BlockSpec((1, bg, bn), lambda j, k, li: (li[0], k, j),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((S_pad, bn), lambda j, k, li: (0, j),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N // bn, n_k),
            in_specs=[x_spec, x_spec, w_spec, g_spec, g_spec, g_spec, g_spec],
            out_specs=out_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            cost_estimate=cost, interpret=interpret,
        )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
          x_lo, x_hi, q.w8, s_lo, z_lo, s_hi, z_hi)
    else:
        out = pl.pallas_call(
            kern,
            grid=(N // bn, n_k),
            in_specs=[
                pl.BlockSpec((S_pad, bk2), lambda j, k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((S_pad, bk2), lambda j, k: (0, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk2, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bg, bn), lambda j, k: (k, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S_pad, bn), lambda j, k: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=interpret,
        )(x_lo, x_hi, q.w8, s_lo, z_lo, s_hi, z_hi)
    return out[:S] if S_pad != S else out
