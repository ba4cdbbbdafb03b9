"""On-device histogram kernel (native equivalent of ppq/csrc/cuda/linear.cu
Histogram_T / Histogram_Asymmetric_T).

TPUs have no fast scatter-add; the TPU-native formulation turns the
histogram into a one-hot matmul that rides the MXU: each (BLOCK, LANES)
tile of |x|/scale bin indices is compared against the bin iota, and the
resulting one-hot mask is contracted with a ones-vector — the per-block
bincount — accumulated across the grid into the output. For the 2k/4k-bin
observers this is bandwidth-bound (one read of x), which is optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import BLOCK_ROWS, LANES, _interpret, _pad_to_2d

BIN_TILE = 512


def _hist_kernel(s_ref, x_ref, hist_ref, *, bins, bin_tile, absolute):
    i = pl.program_id(0)      # data block
    j = pl.program_id(1)      # bin tile

    @pl.when(i == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    scale = s_ref[0, 0]
    v = x_ref[:]
    if absolute:
        v = jnp.abs(v)
    idx = jnp.clip((v / scale).astype(jnp.int32),
                   0, bins - 1)
    # one-hot contraction over this bin tile: (rows*lanes) vs (BIN_TILE,)
    flat = idx.reshape(-1, LANES)                       # (R, 128)
    base = j * bin_tile
    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (bin_tile, 1), 0) + base
    # count[b] = sum over elements of (idx == b)
    onehot = (flat[None, :, :] == bin_ids[:, :, None]).astype(jnp.float32)
    counts = jnp.sum(onehot, axis=(1, 2))
    hist_ref[:, 0] = hist_ref[:, 0] + counts


def pallas_histogram(x: jnp.ndarray, hist_scale: float, bins: int,
                     absolute: bool = True) -> jnp.ndarray:
    """Count |x|/hist_scale occurrences into `bins` buckets (clipped)."""
    x2d, n = _pad_to_2d(jnp.asarray(x, jnp.float32), BLOCK_ROWS)
    rows = x2d.shape[0]
    grid_i = rows // BLOCK_ROWS
    assert bins % BIN_TILE == 0 or bins < BIN_TILE, bins
    bin_tile = min(bins, BIN_TILE)
    grid_j = (bins + bin_tile - 1) // bin_tile
    s = jnp.asarray(hist_scale, jnp.float32).reshape(1, 1)

    hist = pl.pallas_call(
        functools.partial(_hist_kernel, bins=bins, bin_tile=bin_tile,
                          absolute=absolute),
        out_shape=jax.ShapeDtypeStruct((bins, 1), jnp.float32),
        grid=(grid_i, grid_j),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bin_tile, 1), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(s, x2d)
    hist = hist[:, 0]
    # remove the zero-bin contribution of padded elements
    if x2d.size != n:
        pad_count = x2d.size - n
        hist = hist.at[0].add(-float(pad_count))
    return hist
