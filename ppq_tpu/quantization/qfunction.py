"""Fake-quantization functions — the numerical heart of the framework.

Redesign of ppq/quantization/qfunction/{linear,floating}.py for JAX:

  * `linear_fake_quant`   — y = (clip(round(x/s) + o, qmin, qmax) - o) * s,
    per-tensor or per-channel, 7 rounding policies, with a `jax.custom_vjp`
    implementing clip-aware STE for x and LSQ gradients for scale/offset
    (replaces both the torch autograd Functions qfunction/linear.py:8-130
    and the CUDA LSQ kernels csrc/cuda/train.cu).
  * `floating_fake_quant` — FP8-style exponent/mantissa quantization
    (qfunction/floating.py:7-120); E4M3/E5M2 ride XLA's native fp8 dtypes,
    other bit layouts use a generic float32 bit-twiddle.
  * `ppq_fake_quant(x, cfg)` — TQC-driven dispatch (qfunction/__init__.py:10)
  * `ppq_quant_toint(value, cfg)` — real integer output for exporters
    (qfunction/linear.py:218).

Scales/offsets live host-side in TQCs; they enter the traced computation as
constants (PTQ) or as traced arrays (LSQ finetuning) — both paths share the
same primitive here.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (QuantizationProperty, QuantizationStates, RoundingPolicy,
                    TensorQuantizationConfig)
from .rounding import round_tensor

# ========================================================== linear quant ===


def _broadcast_shape(param: jnp.ndarray, ndim: int, channel_axis: Optional[int]):
    """Reshape a per-channel vector so it broadcasts along channel_axis."""
    if param.ndim == 0 or channel_axis is None:
        return param
    shape = [1] * ndim
    shape[channel_axis] = -1
    return param.reshape(shape)


def _use_pallas() -> bool:
    from ..core.config import PPQ_TPU_CONFIG
    return PPQ_TPU_CONFIG.USING_PALLAS_KERNEL


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _linear_quant_core(x, scale, offset, quant_min, quant_max,
                       rounding: RoundingPolicy, channel_axis: Optional[int]):
    if _use_pallas():
        from ..kernels.quant import pallas_linear_quant
        return pallas_linear_quant(x, scale, offset, quant_min, quant_max,
                                   rounding, channel_axis)
    s = _broadcast_shape(scale, x.ndim, channel_axis)
    o_r = jnp.round(_broadcast_shape(offset, x.ndim, channel_axis))
    q = round_tensor(x / s, rounding) + o_r
    q = jnp.clip(q, quant_min, quant_max)
    return (q - o_r) * s


def _linear_quant_fwd(x, scale, offset, quant_min, quant_max, rounding, channel_axis):
    y = _linear_quant_core(x, scale, offset, quant_min, quant_max, rounding,
                           channel_axis)
    return y, (x, scale, offset)


def _linear_quant_bwd(quant_min, quant_max, rounding, channel_axis,
                      residuals, gy):
    """Clip-aware STE for x + LSQ gradients for scale/offset.

    dL/dx     = gy            where qmin <= round(x/s)+o <= qmax, else 0
    dL/dscale = gy * (q - x/s) inside range; gy * (qmin|qmax - o) outside
                (Esser et al. LSQ; replaces csrc/cuda/train.cu
                 QuantizeTensor_LT_B/LC_B)
    dL/doffset= gy * s outside range (asym learnable zero point), 0 inside
    """
    x, scale, offset = residuals
    if _use_pallas():
        from ..kernels.quant import pallas_linear_quant_bwd
        dx, ds, do = pallas_linear_quant_bwd(
            x, gy, scale, offset, quant_min, quant_max, rounding,
            channel_axis)
        return dx, ds.reshape(scale.shape), do.reshape(offset.shape)
    s = _broadcast_shape(scale, x.ndim, channel_axis)
    o = _broadcast_shape(offset, x.ndim, channel_axis)
    o_r = jnp.round(o)
    raw = x / s
    q_unclipped = round_tensor(raw, rounding) + o_r
    below = q_unclipped < quant_min
    above = q_unclipped > quant_max
    inside = jnp.logical_not(below | above)

    dx = jnp.where(inside, gy, 0.0)

    q = jnp.clip(q_unclipped, quant_min, quant_max)
    ds_elem = jnp.where(inside, (q - o_r) - raw,
                        jnp.where(below, quant_min - o_r, quant_max - o_r)) * gy
    do_elem = jnp.where(inside, 0.0, s) * gy

    if scale.ndim == 0 or channel_axis is None:
        ds = jnp.sum(ds_elem).reshape(scale.shape)
        do = jnp.sum(do_elem).reshape(offset.shape)
    else:
        axes = tuple(i for i in range(x.ndim) if i != channel_axis)
        ds = jnp.sum(ds_elem, axis=axes).reshape(scale.shape)
        do = jnp.sum(do_elem, axis=axes).reshape(offset.shape)
    return dx, ds, do


_linear_quant_core.defvjp(_linear_quant_fwd, _linear_quant_bwd)


def linear_fake_quant(x: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray,
                      quant_min: float, quant_max: float,
                      rounding: RoundingPolicy = RoundingPolicy.ROUND_HALF_EVEN,
                      channel_axis: Optional[int] = None) -> jnp.ndarray:
    """Differentiable linear fake-quant (tensorwise or channelwise)."""
    scale = jnp.asarray(scale, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    return _linear_quant_core(jnp.asarray(x), scale, offset,
                              float(quant_min), float(quant_max),
                              rounding, channel_axis)


def linear_quant_codes(x: jnp.ndarray, scale: jnp.ndarray,
                       offset: jnp.ndarray, quant_min: float, quant_max: float,
                       rounding: RoundingPolicy = RoundingPolicy.ROUND_HALF_EVEN,
                       channel_axis: Optional[int] = None) -> jnp.ndarray:
    """Centered integer codes of linear quantization: q - round(o), where
    q = clip(round(x/s) + round(o), qmin, qmax).

    The codes are integer-valued fp32 with |code| <= qmax - qmin, i.e.
    exactly representable in bfloat16 for any <=8-bit scheme — the input of
    the integer-exact simulation path (executor/compile.py), which runs
    conv/matmul over codes on the bf16 MXU with fp32 accumulation and
    factors the scales out: exact integer arithmetic, like a real int8
    backend, at bf16 speed. Identity: fake_quant(x) == codes * s.
    """
    scale = jnp.asarray(scale, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    s = _broadcast_shape(scale, x.ndim, channel_axis)
    o_r = jnp.round(_broadcast_shape(offset, x.ndim, channel_axis))
    q = round_tensor(x / s, rounding) + o_r
    q = jnp.clip(q, quant_min, quant_max)
    return q - o_r


def linear_recover_codes(x_fq: jnp.ndarray, scale: jnp.ndarray,
                         offset: jnp.ndarray, quant_min: float,
                         quant_max: float,
                         channel_axis: Optional[int] = None) -> jnp.ndarray:
    """Recover centered integer codes from an ALREADY fake-quantized value
    (x_fq == codes * s exactly, up to one fp32 rounding): round(x_fq / s),
    clipped to the code range. Used by the integer-exact simulation path at
    OVERLAPPED/BAKED sites, where the quantization happened upstream."""
    scale = jnp.asarray(scale, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    x_fq = jnp.asarray(x_fq, jnp.float32)
    s = _broadcast_shape(scale, x_fq.ndim, channel_axis)
    o_r = jnp.round(_broadcast_shape(offset, x_fq.ndim, channel_axis))
    codes = jnp.round(x_fq / s)
    return jnp.clip(codes, quant_min - o_r, quant_max - o_r)


def dynamic_linear_fake_quant(x: jnp.ndarray, quant_min: float, quant_max: float,
                              symmetric: bool = True,
                              rounding: RoundingPolicy = RoundingPolicy.ROUND_HALF_EVEN,
                              channel_axis: Optional[int] = None) -> jnp.ndarray:
    """Dynamic quantization: scale computed from the tensor itself at runtime
    (qfunction/linear.py:99-130)."""
    if channel_axis is not None:
        axes = tuple(i for i in range(x.ndim) if i != channel_axis)
    else:
        axes = tuple(range(x.ndim))
    if symmetric:
        amax = jnp.max(jnp.abs(x), axis=axes)
        scale = jnp.maximum(amax / float(quant_max), 1e-8)
        offset = jnp.zeros_like(scale)
    else:
        hi = jnp.max(x, axis=axes)
        lo = jnp.min(x, axis=axes)
        scale = jnp.maximum((hi - lo) / float(quant_max - quant_min), 1e-8)
        offset = jnp.round(float(quant_min) - lo / scale)
    return _linear_quant_core(x, scale, offset, float(quant_min),
                              float(quant_max), rounding, channel_axis)


# ======================================================== floating quant ===

_FP8_MAX = {(4, 3): 448.0, (5, 2): 57344.0}


def _float_minmax(exponent_bits: int, mantissa_bits: int) -> float:
    """Largest representable magnitude of a 1-sign/E/M float (finite,
    e4m3fn-style: all-ones exponent is a normal number except all-ones
    mantissa)."""
    if (exponent_bits, mantissa_bits) in _FP8_MAX:
        return _FP8_MAX[(exponent_bits, mantissa_bits)]
    bias = (1 << (exponent_bits - 1)) - 1
    max_exp = (1 << exponent_bits) - 1 - bias  # IEEE-style, inf reserved
    max_mant = 2.0 - 2.0 ** (-mantissa_bits)
    return max_mant * (2.0 ** (max_exp - 1))


def floating_fake_quant(x: jnp.ndarray, scale: jnp.ndarray,
                        exponent_bits: int, mantissa_bits: int,
                        quant_min: float, quant_max: float,
                        channel_axis: Optional[int] = None) -> jnp.ndarray:
    """FP8-style fake quant: y = cast_to_lowbit_float(clip(x/s)) * s.

    E4M3 / E5M2 use XLA's native fp8 conversions (exact, fast on TPU);
    other layouts use a round-half-even mantissa truncation on the fp32
    bit pattern (reference: csrc/cuda/floating.cu QuantizeTensor_FT).
    """
    x = jnp.asarray(x, jnp.float32)
    if _use_pallas():
        from ..kernels.floating import pallas_floating_quant
        return pallas_floating_quant(x, scale, exponent_bits, mantissa_bits,
                                     quant_min, quant_max, channel_axis)
    s = _broadcast_shape(jnp.asarray(scale, jnp.float32), x.ndim, channel_axis)
    scaled = jnp.clip(x / s, quant_min, quant_max)
    key = (exponent_bits, mantissa_bits)
    if key == (4, 3):
        q = scaled.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    elif key == (5, 2):
        q = scaled.astype(jnp.float8_e5m2).astype(jnp.float32)
    else:
        q = _generic_float_round(scaled, exponent_bits, mantissa_bits)
    return q * s


def _generic_float_round(x: jnp.ndarray, exponent_bits: int,
                         mantissa_bits: int) -> jnp.ndarray:
    """Round fp32 values to a narrower exponent/mantissa grid via bit math.

    Steps: (1) round mantissa to `mantissa_bits` with round-half-even on the
    fp32 bit pattern; (2) clamp exponent range [min_normal, max_value];
    (3) flush-to-zero below the smallest subnormal.
    """
    bits = x.view(jnp.uint32) if hasattr(x, 'view') else jnp.asarray(x).view(jnp.uint32)
    drop = 23 - mantissa_bits
    # round-half-even at bit position `drop`
    lsb = (bits >> drop) & jnp.uint32(1)
    rounding_bias = jnp.uint32((1 << (drop - 1)) - 1) + lsb
    rounded = (bits + rounding_bias) & ~jnp.uint32((1 << drop) - 1)
    y = rounded.view(jnp.float32)
    bias = (1 << (exponent_bits - 1)) - 1
    max_val = _float_minmax(exponent_bits, mantissa_bits)
    min_normal = 2.0 ** (1 - bias)
    min_subnormal = min_normal * (2.0 ** (-mantissa_bits))
    y = jnp.clip(y, -max_val, max_val)
    # subnormal region: snap to the subnormal grid
    sub = jnp.abs(y) < min_normal
    sub_grid = jnp.round(y / min_subnormal) * min_subnormal
    y = jnp.where(sub, sub_grid, y)
    return y


# ======================================================= TQC-driven APIs ===


def ppq_fake_quant(x: jnp.ndarray, cfg: TensorQuantizationConfig) -> jnp.ndarray:
    """Master dispatch (qfunction/__init__.py:10): apply cfg to x, honoring
    state, policy (linear/floating/dynamic) and granularity."""
    if not cfg.is_active:
        return x
    pol = cfg.policy
    axis = cfg.channel_axis if pol.per_channel else None
    if pol.dynamic:
        return dynamic_linear_fake_quant(
            x, cfg.quant_min, cfg.quant_max, symmetric=pol.symmetric,
            rounding=cfg.rounding, channel_axis=axis)
    scale = jnp.asarray(cfg.scale, jnp.float32)
    offset = (jnp.asarray(cfg.offset, jnp.float32) if pol.asymmetric
              else jnp.zeros_like(scale))
    if pol.linear:
        return linear_fake_quant(x, scale, offset, cfg.quant_min, cfg.quant_max,
                                 cfg.rounding, channel_axis=axis)
    mantissa_bits = cfg.num_of_bits - 1 - cfg.exponent_bits
    return floating_fake_quant(x, scale, cfg.exponent_bits, mantissa_bits,
                               cfg.quant_min, cfg.quant_max, channel_axis=axis)


def ppq_quant_toint(value: np.ndarray, cfg: TensorQuantizationConfig) -> np.ndarray:
    """Produce REAL integer values for exporters (qfunction/linear.py:218).

    Returns int8 for signed 8-bit schemes, uint8 for unsigned, int32
    otherwise. Host-side numpy (exporters never run on device).
    """
    if not cfg.policy.linear:
        raise ValueError('toint only applies to linear quantization')
    value = np.asarray(value, np.float32)
    scale = np.asarray(cfg.scale, np.float32)
    offset = (np.asarray(cfg.offset, np.float32) if cfg.policy.asymmetric
              else np.zeros_like(scale))
    if cfg.policy.per_channel and cfg.channel_axis is not None:
        shape = [1] * value.ndim
        shape[cfg.channel_axis] = -1
        scale = scale.reshape(shape)
        offset = offset.reshape(shape)
    from .rounding import round_tensor_np
    q = round_tensor_np(value / scale, cfg.rounding)
    q = np.clip(q + np.round(offset), cfg.quant_min, cfg.quant_max)
    if cfg.num_of_bits <= 8:
        return q.astype(np.int8) if cfg.quant_min < 0 else q.astype(np.uint8)
    return q.astype(np.int32)


def fake_quant_np(value: np.ndarray, cfg: TensorQuantizationConfig) -> np.ndarray:
    """Host-side fake quant used by ParameterBakingPass.

    Pure numpy for linear policies — parameters live on host, and routing a
    per-weight eager jnp call through a remote TPU costs seconds per tensor
    (the compiled executor owns all accelerator math)."""
    from .rounding import round_tensor_np
    if not cfg.is_active:
        return np.asarray(value, np.float32)
    value = np.asarray(value, np.float32)
    if cfg.policy.linear and not cfg.policy.dynamic:
        scale = np.asarray(cfg.scale, np.float32)
        offset = (np.round(np.asarray(cfg.offset, np.float32))
                  if cfg.policy.asymmetric else np.zeros_like(scale))
        if cfg.policy.per_channel and cfg.channel_axis is not None:
            shape = [1] * value.ndim
            shape[cfg.channel_axis] = -1
            scale = scale.reshape(shape)
            offset = offset.reshape(shape)
        q = round_tensor_np(value / scale, cfg.rounding) + offset
        q = np.clip(q, cfg.quant_min, cfg.quant_max)
        return ((q - offset) * scale).astype(np.float32)
    # floating / dynamic: reuse the jnp path, pinned to the CPU backend
    import jax
    try:
        cpu = jax.devices('cpu')[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return np.asarray(ppq_fake_quant(jnp.asarray(value), cfg))
    return np.asarray(ppq_fake_quant(jnp.asarray(value), cfg))
