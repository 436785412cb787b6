"""AWQ W4A16 weight-only quantization, TPU-native.

Checkpoint compatibility: reads the HF AutoAWQ "GEMM" format the reference serves
(`qweight` int32 [K, N/8] nibble-packed along N with the AWQ interleave order,
`qzeros` int32 [K/g, N/8], `scales` fp16 [K/g, N]; reference
`umbrella/quantization/awq_utils.py:18-30`). Dequant: w = (int4 - zero) * scale.

TPU storage layout ("split-halves" packing — designed so the matmul kernel never
interleaves lanes or sublanes):
    w8     uint8 [K/2, N]  — low nibble = original row r, high nibble = row r + K/2
    scales bf16  [K/g, N]
    zeros  bf16  [K/g, N]  (zero-point pre-cast, so dequant is one fused (w-z)*s)
Then  x @ W == x[:, :K/2] @ deq(lo(w8)) + x[:, K/2:] @ deq(hi(w8))
with both halves in ORIGINAL row order — no permutation anywhere in the hot path.

Two matmul paths mirroring the reference's size heuristic (`awq_utils.py:67-77`):
  - many tokens (prefill): dequantize the whole matrix to bf16 once, XLA matmul;
  - few tokens (tree decode): fused Pallas dequant+matmul streaming w8 through VMEM.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import setup_logger

logger = setup_logger()

AWQ_REVERSE_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])

# tokens >= this use dequant-to-bf16 + XLA matmul. The reference dispatches at
# 1024 (awq_utils.py:67) because its fused int4 CUDA GEMM loses to cuBLAS fp16
# at large batch; on TPU the fused Pallas kernel keeps full MXU efficiency at
# every S, while the dequant path pays a fixed HBM round-trip of the expanded
# bf16 matrix. Measured (v5e slope, 8B gate_up [4096, 28672], 2026-08): fused
# 0.188/0.363/0.671/1.348 ms at S=128/256/512/1024 vs dequant+dot
# 1.78/1.79/1.95/2.39 ms — fused wins everywhere tested, and the gap cannot
# close (both run the same MXU work; dequant adds a fixed ~1.6 ms). The
# threshold stays only as a VMEM guard: past ~2048 padded token rows the
# kernel's x/accumulator blocks outgrow comfortable VMEM tiling.
FP16_MATMUL_HEURISTIC_TOKENS = 2048


def unpack_awq_numpy(qweight: np.ndarray, qzeros: np.ndarray, bits: int = 4):
    """AutoAWQ GEMM-format unpack -> (int_weights [K, N], int_zeros [K/g, N])."""
    assert bits == 4
    shifts = np.arange(0, 32, bits, dtype=np.uint32)

    def unpack(packed):
        x = (packed.astype(np.uint32)[:, :, None] >> shifts[None, None, :]) & 0xF
        x = x.reshape(packed.shape[0], -1)
        # undo the AWQ nibble interleave within each group of 8 columns
        idx = (np.arange(x.shape[1]).reshape(-1, 8)[:, AWQ_REVERSE_ORDER]).reshape(-1)
        return x[:, idx].astype(np.int8)

    return unpack(qweight), unpack(qzeros)


def pack_awq_numpy(int_weights: np.ndarray, int_zeros: np.ndarray, bits: int = 4):
    """Inverse of unpack (for tests / synthetic checkpoints)."""
    assert bits == 4
    AWQ_ORDER = np.argsort(AWQ_REVERSE_ORDER)  # forward interleave

    def pack(x):
        idx = (np.arange(x.shape[1]).reshape(-1, 8)[:, AWQ_ORDER]).reshape(-1)
        x = x[:, idx].astype(np.uint32).reshape(x.shape[0], -1, 8)
        shifts = np.arange(0, 32, bits, dtype=np.uint32)
        out = (x << shifts[None, None, :]).sum(-1).astype(np.uint32).view(np.int32)
        # numpy's reduce can emit F-ordered output (order-'K'); serializers like
        # safetensors write the raw buffer, so hand back C-contiguous data.
        return np.ascontiguousarray(out)

    return pack(int_weights), pack(int_zeros)


class AwqTensor(NamedTuple):
    """Split-halves packed W4 linear weight (logical shape [K, N])."""
    w8: jnp.ndarray  # int8 [K/2, N] (two nibbles; int8 because Mosaic lacks u8 shifts)
    scales: jnp.ndarray  # [K/g, N]
    zeros: jnp.ndarray  # [K/g, N] (same dtype as scales)

    @property
    def k(self) -> int:
        return 2 * self.w8.shape[-2]

    @property
    def n(self) -> int:
        return self.w8.shape[-1]

    @property
    def group_size(self) -> int:
        return self.k // self.scales.shape[-2]


def has_awq_layers(layers: dict) -> bool:
    """True if any layer entry is quantized (a single AwqTensor or a per-layer
    tuple of AwqTensors)."""
    for v in layers.values():
        if isinstance(v, AwqTensor):
            return True
        if isinstance(v, tuple) and v and isinstance(v[0], AwqTensor):
            return True
    return False


class AwqLayerView(NamedTuple):
    """One layer of a STACKED AwqTensor ([n_layers, K/2, N] leaves) addressed by a
    traced scalar index. The layered W4A16 kernel DMAs the layer straight from the
    stacked HBM buffer via scalar prefetch; slicing the stack in XLA instead would
    materialize a per-layer copy (~0.3 ms/layer at 8B shapes, ~7 ms per 32-layer
    verify pass) because pallas inputs must be whole buffers."""
    q: AwqTensor  # stacked: w8 [n, K/2, N], scales/zeros [n, G, N]
    layer: jnp.ndarray  # scalar int32

    @property
    def n(self) -> int:
        return self.q.n


def pack_tpu_layout(int_weights: np.ndarray, int_zeros: np.ndarray,
                    scales: np.ndarray, dtype=jnp.bfloat16) -> AwqTensor:
    """[K, N] int4 values (+ per-group zeros/scales) -> split-halves AwqTensor."""
    K, N = int_weights.shape
    assert K % 2 == 0
    lo = int_weights[: K // 2].astype(np.uint8)
    hi = int_weights[K // 2 :].astype(np.uint8)
    w8 = (lo | (hi << 4)).astype(np.uint8).view(np.int8)
    return AwqTensor(
        w8=jnp.asarray(w8),
        scales=jnp.asarray(scales).astype(dtype),
        zeros=jnp.asarray(int_zeros.astype(np.float32)).astype(dtype),
    )


def quantize_pack_device(w: jnp.ndarray, group_size: int = 128,
                         dtype=jnp.bfloat16) -> AwqTensor:
    """Device-side quantize_matrix + split-halves pack in ONE jit — no host
    round-trip. quantize_runtime previously pulled every weight through the
    host (np.asarray -> numpy quantize -> re-upload): ~218 s of tunnel transfer
    for a 500M draft on this sandbox; on-device it is milliseconds."""
    return _quantize_pack_jit(jnp.asarray(w), group_size, jax.dtypes.canonicalize_dtype(dtype))


def _quantize_pack_body(w, *, group_size):
    K, N = w.shape
    assert K % group_size == 0 and K % 2 == 0, (K, group_size)
    g = w.astype(jnp.float32).reshape(K // group_size, group_size, N)
    w_max = g.max(axis=1)
    w_min = g.min(axis=1)
    scales = jnp.maximum((w_max - w_min) / 15.0, 1e-8)
    zeros = jnp.clip(jnp.round(-w_min / scales), 0, 15)
    q = jnp.clip(jnp.round(g / scales[:, None, :]) + zeros[:, None, :],
                 0, 15).astype(jnp.int32).reshape(K, N)
    lo, hi = q[: K // 2], q[K // 2:]
    w8 = lo | (hi << 4)  # 0..255; int32->int8 convert truncates = two's complement
    return w8.astype(jnp.int8), scales, zeros


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _pack_fn(group_size):
    return jax.jit(_functools.partial(_quantize_pack_body, group_size=group_size))


def _quantize_pack_jit(w, group_size, dtype):
    w8, scales, zeros = _pack_fn(group_size)(w)
    return AwqTensor(w8=w8, scales=scales.astype(dtype), zeros=zeros.astype(dtype))


def quantize_matrix(w: np.ndarray, group_size: int = 128):
    """AWQ-style symmetric-range quantization of [K, N] fp weights (per-group along K).

    Returns (int_weights [K,N] in [0,15], int_zeros [K/g,N], scales [K/g,N]).
    Used for tests and for quantizing random/bench models; real checkpoints ship
    their own qweight/qzeros/scales.
    """
    K, N = w.shape
    assert K % group_size == 0
    g = w.reshape(K // group_size, group_size, N)
    w_max = g.max(axis=1)
    w_min = g.min(axis=1)
    scales = np.maximum((w_max - w_min) / 15.0, 1e-8)
    zeros = np.clip(np.round(-w_min / scales), 0, 15)
    q = np.clip(np.round(g / scales[:, None, :]) + zeros[:, None, :], 0, 15)
    return (q.reshape(K, N).astype(np.int8), zeros.astype(np.int8),
            scales.astype(np.float32))


def repack_row_shards(q: AwqTensor, m: int) -> AwqTensor:
    """Re-pack split-halves w8 for row-parallel (K-axis) sharding over m shards.

    Global split-halves packs logical row r with row r+K/2 into one byte — a plain
    row split of w8 would give each shard nibbles from two far-apart K blocks,
    mismatching its contiguous scales/zeros block. This re-packs so each of the m
    contiguous w8 row-blocks is a standalone split-halves pack of its own K/m
    logical rows: after `P('model', None)` sharding, every shard holds a
    self-consistent AwqTensor for its K-block. The repacked GLOBAL tensor is only
    meaningful under that sharding (dequantize() on it whole would misorder rows),
    so it is applied at shard time (parallel/mesh.py), never to resident weights.
    """
    if m == 1:
        return q
    K, N = q.k, q.n
    assert K % (2 * m) == 0, f"K={K} must divide 2*model axis ({2*m})"
    w8 = np.asarray(q.w8).view(np.uint8)
    lo = w8 & 0xF
    hi = w8 >> 4
    w = np.concatenate([lo, hi], axis=0)  # [K, N] logical row order
    blocks = w.reshape(m, K // m, N)
    half = K // (2 * m)
    repacked = (blocks[:, :half] | (blocks[:, half:] << 4)).astype(np.uint8)
    return q._replace(w8=jnp.asarray(repacked.reshape(K // 2, N).view(np.int8)))


def dequantize(q: AwqTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Full dequant to [K, N] dtype (the many-token path; XLA fuses into the matmul)."""
    g = q.group_size
    w32 = q.w8.astype(jnp.int32)
    lo = (w32 & 0xF).astype(dtype)
    hi = ((w32 >> 4) & 0xF).astype(dtype)
    w = jnp.concatenate([lo, hi], axis=-2)  # [K, N] original row order
    scales = jnp.repeat(q.scales, g, axis=-2)
    zeros = jnp.repeat(q.zeros, g, axis=-2)
    return (w - zeros) * scales


def _use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def awq_gate_up_silu(x: jnp.ndarray, q, out_dtype=None,
                     fused: bool = False) -> jnp.ndarray:
    """silu(x @ W_gate) * (x @ W_up) for a PACKED gate_up AwqTensor ([K, 2I],
    gate columns first). Default = COMPOSED ops (one gate_up matmul + XLA
    silu*mul): the fused single-kernel variant measured SLOWER on v5e (0.197
    vs 0.171 ms at 8B S=127 — four fp32 dequant temporaries per grid step cost
    more pipeline overlap than the saved HBM round-trip buys; see
    ops/pallas/w4a16.w4a16_gate_up_silu). `fused=True` opts in for A/B runs."""
    tokens = int(np.prod(x.shape[:-1]))
    I = q.n // 2
    if fused:
        if tokens < FP16_MATMUL_HEURISTIC_TOKENS and _use_pallas():
            from ..ops.pallas.w4a16 import w4a16_gate_up_silu

            y = w4a16_gate_up_silu(x.reshape(tokens, x.shape[-1]), q,
                                   out_dtype=out_dtype)
            return y.reshape(*x.shape[:-1], I)
        # fused=True exists solely for A/B measurement — falling back silently
        # would make a "fused" run measure the composed path (ADVICE r4)
        logger.warning(
            "awq_gate_up_silu(fused=True) falling back to the composed path "
            "(tokens=%d >= %d or backend=%s != tpu) — this run does NOT "
            "measure the fused kernel", tokens, FP16_MATMUL_HEURISTIC_TOKENS,
            jax.default_backend())
    gu = awq_matmul(x, q, out_dtype=out_dtype)
    return jax.nn.silu(gu[..., :I]) * gu[..., I:]


def awq_matmul(x: jnp.ndarray, q, bias: Optional[jnp.ndarray] = None,
               prefer_fused: Optional[bool] = None, out_dtype=None,
               act_int8: bool = False) -> jnp.ndarray:
    """y = x @ W for split-halves W4 weights; x [..., K] -> [..., N] in out_dtype
    (default x.dtype; fp32 accumulation either way). `q` is an AwqTensor or an
    AwqLayerView (stacked weights + traced layer index -> layered kernel).

    Size heuristic: the fused kernel serves every token count up to the VMEM
    guard (FP16_MATMUL_HEURISTIC_TOKENS — measured faster than dequant+dot at
    ALL tested S on TPU, unlike the reference's GPU where fused int4 loses to
    cuBLAS at >=1024 tokens, `awq_utils.py:67-77`); beyond it, dequantize once
    and ride the MXU in bf16.
    `act_int8` opts the fused path into the W4A8 kernel (int8 activations on the
    2x-rate int8 MXU, ops/pallas/w4a8.py); the many-token dequant path stays bf16
    (prefill is MXU-efficient already, and bf16 there costs no extra HBM reads).
    """
    layer_idx = None
    if isinstance(q, AwqLayerView):
        q, layer_idx = q.q, q.layer
    tokens = int(np.prod(x.shape[:-1]))
    if prefer_fused is None:
        prefer_fused = tokens < FP16_MATMUL_HEURISTIC_TOKENS and _use_pallas()
    if prefer_fused and not act_int8:
        from ..ops.pallas.w4a16 import w4a16_matmul

        y = w4a16_matmul(x.reshape(tokens, x.shape[-1]), q, out_dtype=out_dtype,
                         layer_idx=layer_idx)
        y = y.reshape(*x.shape[:-1], q.n)
    else:
        if layer_idx is not None:  # w4a8 / dequant paths take a single layer
            q = AwqTensor(
                w8=jax.lax.dynamic_index_in_dim(q.w8, layer_idx, 0, keepdims=False),
                scales=jax.lax.dynamic_index_in_dim(q.scales, layer_idx, 0,
                                                    keepdims=False),
                zeros=jax.lax.dynamic_index_in_dim(q.zeros, layer_idx, 0,
                                                   keepdims=False))
        if prefer_fused:
            from ..ops.pallas.w4a8 import w4a8_matmul

            y = w4a8_matmul(x.reshape(tokens, x.shape[-1]), q, out_dtype=out_dtype)
            y = y.reshape(*x.shape[:-1], q.n)
        else:
            w = dequantize(q, dtype=x.dtype)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            y = y.astype(out_dtype or x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def concat_awq(tensors) -> "AwqTensor":
    """Concatenate AwqTensors along the output (N) axis (same K/group_size) —
    used to pack QKV / gate|up into one kernel call."""
    return AwqTensor(
        w8=jnp.concatenate([t.w8 for t in tensors], axis=-1),
        scales=jnp.concatenate([t.scales for t in tensors], axis=-1),
        zeros=jnp.concatenate([t.zeros for t in tensors], axis=-1),
    )


def awq_from_hf_tensors(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                        dtype=jnp.bfloat16) -> AwqTensor:
    """HF AutoAWQ GEMM tensors -> TPU split-halves layout.

    Uses the native C repacker (quantization/_repack.c) when available — one pass
    over the packed words instead of numpy's temporary int8 blow-ups (matters for
    70B-scale checkpoints); falls back to the numpy path transparently.
    """
    from .native import repack_weights_native, unpack_zeros_native

    w8 = repack_weights_native(qweight)
    zeros = unpack_zeros_native(qzeros)
    if w8 is not None and zeros is not None:
        return AwqTensor(
            w8=jnp.asarray(w8.view(np.int8)),
            scales=jnp.asarray(scales.astype(np.float32)).astype(dtype),
            zeros=jnp.asarray(zeros).astype(dtype),
        )
    int_w, int_z = unpack_awq_numpy(qweight, qzeros)
    return pack_tpu_layout(int_w, int_z, scales.astype(np.float32), dtype=dtype)
