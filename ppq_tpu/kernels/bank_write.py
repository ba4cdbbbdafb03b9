"""Pallas in-place COLUMN write for the decode burst's banked K/V buffers.

Reference counterpart: none — PPQ has no serving runtime; this is the
TPU-native mechanism behind burst_forward's in-burst K/V banking
(serving/model.py).

Why a kernel: the burst scan carries per-layer (B, CH, KV, Dh) buffer
leaves and banks each step's K/V at column `ic`. As an XLA
dynamic_update_slice on a scan carry, every leaf pays a full read+write
each step — XLA never aliases the DUS'd carry in place
(probes/bank_dus.py) — measured 32 leaves x 16.3 us = 0.52 ms/step at
the 1B/B=128 config (r5 trace). This kernel writes the single column of
ALL leaves in ONE pallas_call whose buffer operands are
input_output_aliased: XLA keeps the aliased buffers in place through the
while-loop carry (probes/alias_colwrite.py: 6.7 us/step for the whole
write vs 520 us of DUS rewrites), so the per-step cost is exactly the
new column's bytes.

DMA legality: the buffers keep (KV, Dh) as the tiled pair, so the column
dim CH is an untiled major dim and a width-1 slice is legal (slicing a
TILED dim at width 1 is rejected: 'Slice shape along dimension ... must
be aligned to tiling').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA copies kept in flight (issue latency hides under prior transfers)
_WAVE = 8


def _make_writer(n_arrays):
    def kernel(col_ref, *refs):
        # refs: n_arrays new (ANY), n_arrays buf_in (ANY, aliased),
        #       n_arrays buf_out (ANY), sem (DMA semaphore array)
        news = refs[:n_arrays]
        outs = refs[2 * n_arrays:3 * n_arrays]
        sem = refs[-1]
        ic = col_ref[0]

        def copy(j):
            return pltpu.make_async_copy(
                news[j], outs[j].at[:, pl.ds(ic, 1)], sem.at[j % _WAVE])

        for j in range(n_arrays):
            if j >= _WAVE:
                copy(j - _WAVE).wait()
            copy(j).start()
        for j in range(max(0, n_arrays - _WAVE), n_arrays):
            copy(j).wait()
    return kernel


@functools.partial(jax.jit, static_argnames=('interpret',))
def bank_write_inplace(bufs, news, col, interpret: bool = False):
    """Write one column into every banked buffer, in place.

    bufs: tuple of (B, CH, F...) arrays — ALIASED to the outputs (the
          caller's values are dead after this call)
    news: tuple of (B, 1, F...) per-buffer new columns
    col:  scalar int32 (device value OK) — destination column
    Returns the updated buffers (same shapes/dtypes/order as bufs).
    """
    bufs = tuple(bufs)
    news = tuple(news)
    na = len(bufs)
    kernel = _make_writer(na)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * na),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * na,
        scratch_shapes=[pltpu.SemaphoreType.DMA((_WAVE,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs],
        # operand numbering includes the scalar-prefetch arg: 0 = col,
        # [1, 1+na) = news, [1+na, 1+2na) = bufs -> alias bufs to outputs
        input_output_aliases={1 + na + j: j for j in range(na)},
        interpret=interpret,
    )(jnp.asarray(col, jnp.int32).reshape(1), *news, *bufs)
    return tuple(out)


def supports_bank(buf_shape) -> bool:
    """The column dim must be untiled (>= 2 trailing dims after it) and
    the lane dim 128-aligned."""
    return len(buf_shape) >= 4 and buf_shape[-1] % 128 == 0
