"""Fused linear fake-quant Pallas kernels (fwd + LSQ bwd).

Native equivalents of ppq/csrc/cuda/linear.cu (QuantizeTensor_LT/LC,
vectorized VPT=4 variants) and train.cu (QuantizeTensor_LT_B/LC_B LSQ
gradients). Design per the TPU kernel playbook:

  * data is flattened/padded to (rows, 128) lanes and tiled in VMEM blocks
    aligned to the f32 (8, 128) tile; the whole quant formula
    `clip(round(x/s)+o) -> (q-o)*s` runs in one VPU pass per block —
    one HBM read + one HBM write, the bandwidth lower bound.
  * tensorwise scale/offset ride in SMEM as (1,1) scalars; channelwise
    kernels put the channel on the sublane axis and broadcast a (C,1)
    VMEM vector across lanes.
  * the backward kernel fuses the STE mask with the LSQ dScale/dOffset
    partial reductions (block-level), so training reads each tensor once.

Off-TPU the same kernels execute via `interpret=True`, keeping CI on the
CPU mesh bit-identical with the compiled TPU path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import RoundingPolicy
from ..quantization.rounding import round_tensor

LANES = 128
SUBLANES = 8
BLOCK_ROWS = 256          # 256x128 f32 = 128 KiB per VMEM block


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False


def _interpret() -> bool:
    return not pallas_available()


def _pad_to_2d(x: jnp.ndarray, rows_mult: int) -> Tuple[jnp.ndarray, int]:
    """Flatten to (rows, LANES), zero-padded; returns (x2d, n_valid)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    per_block = rows_mult * LANES
    padded = ((n + per_block - 1) // per_block) * per_block
    if padded != n:
        flat = jnp.pad(flat, (0, padded - n))
    return flat.reshape(-1, LANES), n


# ============================================================ tensorwise ===

def _quant_fwd_t_kernel(s_ref, o_ref, x_ref, y_ref, *, qmin, qmax, rounding):
    s = s_ref[0, 0]
    o = o_ref[0, 0]
    inv = 1.0 / s
    q = round_tensor(x_ref[:] * inv, rounding) + o
    q = jnp.clip(q, qmin, qmax)
    y_ref[:] = (q - o) * s


def _quant_bwd_t_kernel(s_ref, o_ref, x_ref, g_ref, dx_ref, ds_ref, do_ref,
                        *, qmin, qmax, rounding):
    s = s_ref[0, 0]
    o = o_ref[0, 0]
    raw = x_ref[:] / s
    q_un = round_tensor(raw, rounding) + o
    below = q_un < qmin
    above = q_un > qmax
    inside = jnp.logical_not(below | above)
    g = g_ref[:]
    dx_ref[:] = jnp.where(inside, g, 0.0)
    q = jnp.clip(q_un, qmin, qmax)
    ds_elem = jnp.where(inside, (q - o) - raw,
                        jnp.where(below, qmin - o, qmax - o)) * g
    do_elem = jnp.where(inside, 0.0, s) * g
    # TPU grid execution is sequential → accumulate vector partials in VMEM
    # (scalar stores to VMEM are unsupported; SMEM outputs with multi-output
    # kernels miscompile on some Mosaic versions — keep it all vector math).
    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        do_ref[:] = jnp.zeros_like(do_ref)
    ds_ref[:] += jnp.sum(
        ds_elem.reshape(SUBLANES, BLOCK_ROWS // SUBLANES, LANES), axis=1)
    do_ref[:] += jnp.sum(
        do_elem.reshape(SUBLANES, BLOCK_ROWS // SUBLANES, LANES), axis=1)


def pallas_linear_quant(x: jnp.ndarray, scale, offset,
                        qmin: float, qmax: float,
                        rounding: RoundingPolicy = RoundingPolicy.ROUND_HALF_EVEN,
                        channel_axis: Optional[int] = None) -> jnp.ndarray:
    """Fake-quant forward; tensorwise (channel_axis=None) or channelwise."""
    x = jnp.asarray(x, jnp.float32)
    if channel_axis is not None:
        return _channelwise_fwd(x, scale, offset, qmin, qmax, rounding,
                                channel_axis)
    x2d, n = _pad_to_2d(x, BLOCK_ROWS)
    rows = x2d.shape[0]
    grid = rows // BLOCK_ROWS
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    o = jnp.round(jnp.asarray(offset, jnp.float32)).reshape(1, 1)
    y2d = pl.pallas_call(
        functools.partial(_quant_fwd_t_kernel, qmin=float(qmin),
                          qmax=float(qmax), rounding=rounding),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(s, o, x2d)
    return y2d.reshape(-1)[:n].reshape(x.shape)


def pallas_linear_quant_bwd(x: jnp.ndarray, g: jnp.ndarray, scale, offset,
                            qmin: float, qmax: float,
                            rounding: RoundingPolicy,
                            channel_axis: Optional[int] = None):
    """Fused STE/LSQ backward: returns (dx, dscale, doffset)."""
    x = jnp.asarray(x, jnp.float32)
    g = jnp.asarray(g, jnp.float32)
    if channel_axis is not None:
        return _channelwise_bwd(x, g, scale, offset, qmin, qmax, rounding,
                                channel_axis)
    x2d, n = _pad_to_2d(x, BLOCK_ROWS)
    g2d, _ = _pad_to_2d(g, BLOCK_ROWS)
    rows = x2d.shape[0]
    grid = rows // BLOCK_ROWS
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    o = jnp.round(jnp.asarray(offset, jnp.float32)).reshape(1, 1)
    dx2d, ds_part, do_part = pl.pallas_call(
        functools.partial(_quant_bwd_t_kernel, qmin=float(qmin),
                          qmax=float(qmax), rounding=rounding),
        out_shape=(
            jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(s, o, x2d, g2d)
    dx = dx2d.reshape(-1)[:n].reshape(x.shape)
    # padded tail contributes 0 to ds (x=g=0 → inside, (q-raw)*0=0) and do
    return dx, jnp.sum(ds_part), jnp.sum(do_part)


# =========================================================== channelwise ===

def _quant_fwd_c_kernel(x_ref, s_ref, o_ref, y_ref, *, qmin, qmax, rounding):
    s = s_ref[:]              # (C_BLK, 1) broadcast over lanes
    o = o_ref[:]
    q = round_tensor(x_ref[:] / s, rounding) + o
    q = jnp.clip(q, qmin, qmax)
    y_ref[:] = (q - o) * s


def _quant_bwd_c_kernel(x_ref, g_ref, s_ref, o_ref,
                        dx_ref, ds_ref, do_ref, *, qmin, qmax, rounding):
    s = s_ref[:]
    o = o_ref[:]
    raw = x_ref[:] / s
    q_un = round_tensor(raw, rounding) + o
    below = q_un < qmin
    above = q_un > qmax
    inside = jnp.logical_not(below | above)
    g = g_ref[:]
    dx_ref[:] = jnp.where(inside, g, 0.0)
    q = jnp.clip(q_un, qmin, qmax)
    ds_elem = jnp.where(inside, (q - o) - raw,
                        jnp.where(below, qmin - o, qmax - o)) * g
    do_elem = jnp.where(inside, 0.0, s) * g
    # accumulate over the lane-tile grid axis (sequential on TPU)
    @pl.when(pl.program_id(1) == 0)
    def _():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        do_ref[:] = jnp.zeros_like(do_ref)
    ds_ref[:] += jnp.sum(ds_elem, axis=1, keepdims=True)
    do_ref[:] += jnp.sum(do_elem, axis=1, keepdims=True)


def _to_channel_major(x: jnp.ndarray, axis: int):
    axis = axis % x.ndim
    moved = jnp.moveaxis(x, axis, 0)
    c = moved.shape[0]
    flat = moved.reshape(c, -1)
    m = flat.shape[1]
    pad_m = ((m + LANES - 1) // LANES) * LANES
    pad_c = ((c + SUBLANES - 1) // SUBLANES) * SUBLANES
    flat = jnp.pad(flat, ((0, pad_c - c), (0, pad_m - m)))
    return flat, moved.shape, c, m


def _from_channel_major(flat, moved_shape, c, m, axis, ndim):
    moved = flat[:c, :m].reshape(moved_shape)
    return jnp.moveaxis(moved, 0, axis % ndim)


def _channel_grid(flat):
    c_pad, m_pad = flat.shape
    c_blk = min(c_pad, 8 * SUBLANES)
    while c_pad % c_blk:
        c_blk -= SUBLANES
    m_blk = min(m_pad, 4 * LANES)
    while m_pad % m_blk:
        m_blk -= LANES
    return c_blk, m_blk, (c_pad // c_blk, m_pad // m_blk)


def _channelwise_fwd(x, scale, offset, qmin, qmax, rounding, axis):
    flat, moved_shape, c, m = _to_channel_major(x, axis)
    c_pad = flat.shape[0]
    s = jnp.pad(jnp.asarray(scale, jnp.float32).reshape(-1),
                (0, c_pad - c), constant_values=1.0).reshape(-1, 1)
    o = jnp.pad(jnp.round(jnp.asarray(offset, jnp.float32)).reshape(-1),
                (0, c_pad - c)).reshape(-1, 1)
    c_blk, m_blk, grid = _channel_grid(flat)
    y = pl.pallas_call(
        functools.partial(_quant_fwd_c_kernel, qmin=float(qmin),
                          qmax=float(qmax), rounding=rounding),
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c_blk, m_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_blk, m_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(flat, s, o)
    return _from_channel_major(y, moved_shape, c, m, axis, x.ndim)


def _channelwise_bwd(x, g, scale, offset, qmin, qmax, rounding, axis):
    flat, moved_shape, c, m = _to_channel_major(x, axis)
    gflat, _, _, _ = _to_channel_major(g, axis)
    c_pad = flat.shape[0]
    s = jnp.pad(jnp.asarray(scale, jnp.float32).reshape(-1),
                (0, c_pad - c), constant_values=1.0).reshape(-1, 1)
    o = jnp.pad(jnp.round(jnp.asarray(offset, jnp.float32)).reshape(-1),
                (0, c_pad - c)).reshape(-1, 1)
    c_blk, m_blk, grid = _channel_grid(flat)
    dx, ds_part, do_part = pl.pallas_call(
        functools.partial(_quant_bwd_c_kernel, qmin=float(qmin),
                          qmax=float(qmax), rounding=rounding),
        out_shape=(
            jax.ShapeDtypeStruct(flat.shape, jnp.float32),
            jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((c_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c_blk, m_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, m_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((c_blk, m_blk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_blk, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(flat, gflat, s, o)
    dx = _from_channel_major(dx, moved_shape, c, m, axis, x.ndim)
    return dx, ds_part[:c, 0], do_part[:c, 0]
