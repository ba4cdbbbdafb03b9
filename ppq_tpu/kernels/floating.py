"""Fused FP8/low-bit-float fake-quant Pallas kernels (fwd + STE bwd).

Native equivalent of ppq/csrc/cuda/floating.cu (QuantizeTensor_FT/FC +
backward, 331 LoC with subnormal handling). Same layout discipline as the
linear kernels (kernels/quant.py): tensors flatten/pad to (rows, 128)
lanes, scale rides SMEM, the whole pipeline — divide by scale, clip to the
float range, round-half-even mantissa truncation on the fp32 bit pattern,
exponent clamp, subnormal-grid snap, rescale — runs in ONE VPU pass per
block. Off-TPU the kernels run under `interpret=True` so CPU CI stays
bit-identical with the compiled TPU path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import (BLOCK_ROWS, LANES, _interpret, _pad_to_2d,
                    _to_channel_major, _from_channel_major, _channel_grid)


def _float_round_block(scaled, exponent_bits: int, mantissa_bits: int,
                       max_val: float):
    """Round an fp32 block to the E/M float grid — kernel-safe bit math
    (mirrors qfunction._generic_float_round; parity-tested)."""
    bits = jax.lax.bitcast_convert_type(scaled, jnp.uint32)
    drop = 23 - mantissa_bits
    lsb = (bits >> drop) & jnp.uint32(1)
    bias_bits = jnp.uint32((1 << (drop - 1)) - 1) + lsb
    rounded = (bits + bias_bits) & ~jnp.uint32((1 << drop) - 1)
    y = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    e_bias = (1 << (exponent_bits - 1)) - 1
    min_normal = 2.0 ** (1 - e_bias)
    min_subnormal = min_normal * (2.0 ** (-mantissa_bits))
    y = jnp.clip(y, -max_val, max_val)
    sub = jnp.abs(y) < min_normal
    sub_grid = jnp.round(y / min_subnormal) * min_subnormal
    return jnp.where(sub, sub_grid, y)


def _fp_fwd_t_kernel(s_ref, x_ref, y_ref, *, e_bits, m_bits, qmin, qmax,
                     max_val):
    s = s_ref[0, 0]
    scaled = jnp.clip(x_ref[:] / s, qmin, qmax)
    y_ref[:] = _float_round_block(scaled, e_bits, m_bits, max_val) * s


def _fp_bwd_t_kernel(s_ref, x_ref, g_ref, dx_ref, *, qmin, qmax):
    s = s_ref[0, 0]
    raw = x_ref[:] / s
    inside = jnp.logical_and(raw >= qmin, raw <= qmax)
    dx_ref[:] = jnp.where(inside, g_ref[:], 0.0)


def _fp_fwd_c_kernel(x_ref, s_ref, y_ref, *, e_bits, m_bits, qmin, qmax,
                     max_val):
    s = s_ref[:]                                     # (C_block, 1)
    scaled = jnp.clip(x_ref[:] / s, qmin, qmax)
    y_ref[:] = _float_round_block(scaled, e_bits, m_bits, max_val) * s


def pallas_floating_quant(x: jnp.ndarray, scale, exponent_bits: int,
                          mantissa_bits: int, qmin: float, qmax: float,
                          channel_axis: Optional[int] = None) -> jnp.ndarray:
    """FP8-style fake quant: y = float_round(clip(x/s, qmin, qmax)) * s."""
    from ..quantization.qfunction import _float_minmax
    x = jnp.asarray(x, jnp.float32)
    max_val = float(_float_minmax(exponent_bits, mantissa_bits))
    kw = dict(e_bits=int(exponent_bits), m_bits=int(mantissa_bits),
              qmin=float(qmin), qmax=float(qmax), max_val=max_val)
    if channel_axis is not None:
        flat, moved_shape, c, m = _to_channel_major(x, channel_axis)
        c_pad = flat.shape[0]
        s = jnp.pad(jnp.asarray(scale, jnp.float32).reshape(-1),
                    (0, c_pad - c), constant_values=1.0).reshape(-1, 1)
        c_blk, m_blk, grid = _channel_grid(flat)
        y = pl.pallas_call(
            functools.partial(_fp_fwd_c_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((c_blk, m_blk), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_blk, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c_blk, m_blk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(flat, s)
        return _from_channel_major(y, moved_shape, c, m, channel_axis,
                                   x.ndim)
    x2d, n = _pad_to_2d(x, BLOCK_ROWS)
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    y2d = pl.pallas_call(
        functools.partial(_fp_fwd_t_kernel, **kw),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
        grid=(x2d.shape[0] // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(s, x2d)
    return y2d.reshape(-1)[:n].reshape(x.shape)


def pallas_floating_quant_bwd(x: jnp.ndarray, g: jnp.ndarray, scale,
                              qmin: float, qmax: float) -> jnp.ndarray:
    """STE backward: pass gradient where x/s lands inside [qmin, qmax]
    (reference floating.cu QuantizeTensor_FT_B)."""
    x = jnp.asarray(x, jnp.float32)
    g = jnp.asarray(g, jnp.float32)
    x2d, n = _pad_to_2d(x, BLOCK_ROWS)
    g2d, _ = _pad_to_2d(g, BLOCK_ROWS)
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    dx2d = pl.pallas_call(
        functools.partial(_fp_bwd_t_kernel, qmin=float(qmin),
                          qmax=float(qmax)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, jnp.float32),
        grid=(x2d.shape[0] // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(s, x2d, g2d)
    return dx2d.reshape(-1)[:n].reshape(x.shape)
