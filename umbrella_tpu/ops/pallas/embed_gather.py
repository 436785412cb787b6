"""Embedding row gather as ONE Pallas kernel (pipelined tile DMAs).

The engine avoids XLA gathers entirely (advanced-index gathers poison this
runtime's dispatch path — see ops/select.py), so `embed[input_ids]` was a
`fori_loop` of S sequential `dynamic_slice` reads: each iteration is a full
XLA op with its own latency, ~1-2 ms at S=127 on an 8B verify step. This
kernel replaces the loop with a single call: token ids arrive via scalar
prefetch (SMEM), and each grid step DMAs the 8-row sublane tile containing
its token from the HBM-resident table, with the next step's DMA started
before the current wait (double buffering).

Mosaic cannot slice a single row out of an (8,128)-tiled HBM memref at a
dynamic sublane offset, so the table is viewed as [V/8, 8, H] — the leading
dim is untiled and dynamically indexable (the same trick the layered flash
kernel uses for KV layers) — and the wanted row is selected from the 8-row
tile in VMEM with a one-hot sum (no dynamic sublane indexing).

Reference analogue: plain `F.embedding` (reference models call
`self.embed_tokens`, e.g. `umbrella/models/llama.py:118`); the reference runs
on CUDA where gathers are native. This is the TPU-native equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM = 4  # outstanding tile DMAs


def _gather_kernel(ids_ref, embed_ref, out_ref, scratch, sems, *, S: int):
    i = pl.program_id(0)

    def dma(j):
        return pltpu.make_async_copy(
            embed_ref.at[ids_ref[j] >> 3], scratch.at[j % NSEM], sems.at[j % NSEM])

    @pl.when(i == 0)
    def _():  # warm-up: fill the DMA window
        for j in range(min(NSEM, S)):
            dma(j).start()

    dma(i).wait()
    tile = scratch[i % NSEM]  # [8, H]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    sel = (sub == (ids_ref[i] & 7)).astype(jnp.float32)
    out_ref[:] = jnp.sum(tile.astype(jnp.float32) * sel, axis=0,
                         keepdims=True)[None].astype(out_ref.dtype)

    # start the refill of this slot only AFTER its tile has been consumed
    @pl.when(i + NSEM < S)
    def _():
        dma(i + NSEM).start()


@functools.partial(jax.jit, static_argnames=("interpret",))
def embed_gather(embed: jnp.ndarray, input_ids: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """embed[input_ids] via pipelined tile DMAs; [V, H] x [S] -> [S, H]."""
    S = input_ids.shape[0]
    V, H = embed.shape
    if V % 8:
        embed = jnp.pad(embed, ((0, 8 - V % 8), (0, 0)))
    embed3 = embed.reshape(-1, 8, H)  # row-major view; leading dim untiled
    out = pl.pallas_call(
        functools.partial(_gather_kernel, S=S),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table stays in HBM
            # out is [S, 1, H] so the per-token block (1, 1, H) is a legal tile
            out_specs=pl.BlockSpec((1, 1, H), lambda i, ids: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((NSEM, 8, H), embed.dtype),
                            pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((S, 1, H), embed.dtype),
        interpret=interpret,
    )(input_ids.astype(jnp.int32), embed3)
    return out.reshape(S, H)
