"""Fused dequant-matmul Pallas kernels for weight-only-quantized serving.

Reference counterpart: none — PPQ simulates quantization but delegates
deployed matmuls to vendor runtimes (ppl/trt, ppq/core/ffi.py). On TPU the
deployed runtime is ours, so the dequant must fuse into the matmul *here*:
decode is HBM bandwidth-bound and every byte of the weight read is
throughput.

Why not let XLA fuse `w_int.astype(bf16) * scale` into the dot itself?
Measured on v5e: inside a decode burst (lax.scan) the dequant is
loop-invariant, so XLA hoists it and materializes a bf16 weight copy —
per-step HBM traffic becomes 2x the int8 bytes, erasing the point of
int8 weights; the int4 shift/mask unpack isn't dot-fusable at all. These
kernels read the integer bytes and dequantize in VMEM, so the HBM cost is
exactly the quantized tensor.

Design (per pallas_guide.md):
  * the activation is tiny during decode (B <= 32 rows) — it rides fully
    resident in VMEM; the weight streams through in (D, TF) column panels
    (full contraction depth per panel: one dot per panel, no accumulator
    scratch, grid = F/TF steps so per-step pipeline overhead stays small).
  * per-output-channel scales are applied to the panel's f32 dot result.
  * int4 packing is SPLIT-HALF along the contraction dim: packed row r
    holds w[r] in the low nibble and w[r + D/2] in the high nibble, so a
    panel unpacks with two arithmetic shifts and contracts each nibble
    plane against its own half of x — no sublane interleave (a [::2]
    stack/reshape would de-tile the block), and no i8 left-shift (Mosaic
    cannot legalize shli on i8 vectors — nibbles sign-extend via i32 ops).

The wrapper falls back to the caller's XLA path when shapes don't tile
(serving dims are multiples of 128).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the whole kernel working set: double-buffered weight
# panel + double-buffered (B, TF) f32 output + the resident activation.
# 12 MiB of the 16 MiB scoped VMEM leaves headroom for Mosaic spills.
# Bigger panels = fewer grid steps; per-grid-step fixed cost measured
# ~1-2 us on v5e, so lm_head at TF=2048 (16 steps) runs 51.6 us vs
# 84.3 us at TF=256 (125 steps) — probes/qmm_lmhead_ab.py.
_VMEM_BUDGET = 12 * 1024 * 1024
# legacy knob kept for callers that referenced it (per-panel cap)
_PANEL_BYTES = 4 * 1024 * 1024


def _pick_tf(d_bytes_per_col: int, f: int, b: int = 64,
             x_bytes: int = 0) -> int:
    """Largest lane-aligned panel width TF dividing f whose double-
    buffered panel + output + resident activation fit _VMEM_BUDGET
    (0 if f doesn't tile)."""
    def fits(tf):
        return (2 * (d_bytes_per_col * tf + b * tf * 4) + x_bytes
                <= _VMEM_BUDGET and d_bytes_per_col * tf <= _PANEL_BYTES)
    best = 0
    tf = 128
    while tf <= f:
        if f % tf == 0 and fits(tf):
            best = tf
        tf *= 2
    if best == 0 and f % 128 == 0 and fits(128):
        best = 128
    return best


def supports(d: int, f: int, b: int = 64) -> bool:
    return d % 256 == 0 and _pick_tf(d, f, b, x_bytes=b * d * 2) > 0


def supports_int4(dp: int, f: int, b: int = 64) -> bool:
    """dp = packed contraction depth (D // 2); mirrors qmm_int4's
    unpack-aware 4x panel budget."""
    return dp % 256 == 0 and _pick_tf(dp * 4, f, b,
                                      x_bytes=b * dp * 2 * 2) > 0


# ------------------------------------------------------------- int8 ------

def _qmm8_kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _mk_qmm8_ex(has_row: bool, has_res: bool):
    """int8 kernel with optional fused epilogue operands: a per-row f32
    scale (the rms_norm rsqrt factor — a row scalar commutes with the
    dot, so pre-norm matmuls fold to  row_scale * (x @ W)  once the
    norm's gamma is folded into W) and a (B, F) bf16 residual (decode's
    `x + attn/mlp(x)` adds ride the kernel epilogue instead of paying a
    separate XLA op dispatch per layer)."""
    def kernel(x_ref, w_ref, s_ref, *refs):
        o_ref = refs[-1]
        acc = jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        acc = acc * s_ref[:].astype(jnp.float32)
        i = 0
        if has_row:
            acc = acc * refs[i][:].astype(jnp.float32)
            i += 1
        if has_res:
            acc = acc + refs[i][:].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)
    return kernel


_QMM8_EX = {(r, s): _mk_qmm8_ex(r, s)
            for r in (False, True) for s in (False, True)}


@functools.partial(jax.jit, static_argnames=('out_dtype', 'interpret'))
def qmm_int8(x: jnp.ndarray, w_int: jnp.ndarray, scale: jnp.ndarray,
             out_dtype=jnp.bfloat16, interpret: bool = False,
             row_scale: Optional[jnp.ndarray] = None,
             residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, D); w_int: (D, F) int8; scale: (F,) f32 → (B, F).
    row_scale: optional (B,) or (B, 1) f32 multiplied into each output
    row; residual: optional (B, F) added after all scaling."""
    B, D = x.shape
    F = w_int.shape[1]
    TF = _pick_tf(D, F, B, x_bytes=B * D * 2)
    assert TF, (D, F, B)
    extras, extra_specs = [], []
    if row_scale is not None:
        extras.append(row_scale.reshape(B, 1).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((B, 1), lambda j: (0, 0),
                                        memory_space=pltpu.VMEM))
    if residual is not None:
        extras.append(residual.reshape(B, F))
        extra_specs.append(pl.BlockSpec((B, TF), lambda j: (0, j),
                                        memory_space=pltpu.VMEM))
    kernel = _QMM8_EX[(row_scale is not None, residual is not None)]
    return pl.pallas_call(
        kernel,
        grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=D * F + 2 * B * (D + F),
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_int, scale.reshape(1, F), *extras)


# ------------------------------------------------------------- int4 ------

def pack_int4_splithalf(q: np.ndarray) -> np.ndarray:
    """(D, F) int8 in [-8, 7] → (D//2, F) packed: row r = (q[r] & 0xF) |
    (q[r + D//2] << 4)."""
    D = q.shape[0]
    assert D % 2 == 0
    lo = q[: D // 2] & 0x0F
    hi = (q[D // 2:] & 0x0F) << 4
    return (lo | hi).astype(np.int8)


def unpack_int4_splithalf(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4_splithalf (jnp, for the XLA fallback path)."""
    p32 = packed.astype(jnp.int32)
    lo = ((p32 & 15) ^ 8) - 8
    hi = p32 >> 4
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _mk_qmm4_ex(has_row: bool, has_res: bool):
    """int4 kernel with the same optional epilogue operands as the int8
    one (see _mk_qmm8_ex). Unpack stays the i32 formulation — measured
    best of 6 variants on v5e (probes/int4_prof.py, device-timed): the
    i8->bf16 casts of 'cheaper' unpacks lower through i32 anyway, and at
    decode batch >= 64 the kernel is MXU-bound (2 half-depth dots = full
    2*B*D*F flops), so unpack-op-count changes don't move the total.
    A scratch-pipelined unpack (overlap VPU with MXU across grid steps)
    measured 2x WORSE — Mosaic schedules the scratch round-trip
    serially (probes/int4_pipe.py)."""
    def kernel(x_ref, w_ref, s_ref, *refs):
        o_ref = refs[-1]
        p32 = w_ref[:].astype(jnp.int32)
        lo = (((p32 & 15) ^ 8) - 8).astype(jnp.bfloat16)
        hi = (p32 >> 4).astype(jnp.bfloat16)
        acc = jnp.dot(x_ref[:, 0], lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(x_ref[:, 1], hi, preferred_element_type=jnp.float32)
        acc = acc * s_ref[:].astype(jnp.float32)
        i = 0
        if has_row:
            acc = acc * refs[i][:].astype(jnp.float32)
            i += 1
        if has_res:
            acc = acc + refs[i][:].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)
    return kernel


_QMM4_EX = {(r, s): _mk_qmm4_ex(r, s)
            for r in (False, True) for s in (False, True)}


@functools.partial(jax.jit, static_argnames=('out_dtype', 'interpret'))
def qmm_int4(x: jnp.ndarray, w_packed: jnp.ndarray, scale: jnp.ndarray,
             out_dtype=jnp.bfloat16, interpret: bool = False,
             row_scale: Optional[jnp.ndarray] = None,
             residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, D); w_packed: (D//2, F) split-half int4; scale: (F,).
    w_ref panel: (Dp, TF) packed; low nibbles are w rows [0, Dp), high
    nibbles rows [Dp, 2*Dp). x reshapes to (B, 2, Dp) — [:, 0] multiplies
    the lo plane, [:, 1] the hi plane.

    Budget the panel as if columns were 4x wider: the nibble unpack
    materializes an i32 copy of the panel plus two bf16 planes in VMEM
    (Mosaic only legalizes shifts on i32), and a full-size panel OOMs
    the 16MB scoped vmem at B=128.

    Measured regime (probes/int4_pipe.py, device-timed, D=2048 F=11264):
    int4 beats int8 at decode batch <= 32 (HBM-bound: half the bytes),
    loses above (MXU flops equal int8's while the VPU unpack serializes
    against the MXU — Mosaic refuses to overlap them). int4's B>=64 win
    is HBM capacity; configs keep the lm_head int8 by default
    (LlamaConfig.lm_head_bits)."""
    B, D = x.shape
    Dp, F = w_packed.shape
    assert Dp * 2 == D, (D, Dp)
    TF = _pick_tf(Dp * 4, F, B, x_bytes=B * D * 2)
    assert TF, (Dp, F, B)
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    extras, extra_specs = [], []
    if row_scale is not None:
        extras.append(row_scale.reshape(B, 1).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((B, 1), lambda j: (0, 0),
                                        memory_space=pltpu.VMEM))
    if residual is not None:
        extras.append(residual.reshape(B, F))
        extra_specs.append(pl.BlockSpec((B, TF), lambda j: (0, j),
                                        memory_space=pltpu.VMEM))
    kernel = _QMM4_EX[(row_scale is not None, residual is not None)]
    return pl.pallas_call(
        kernel,
        grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, 2, Dp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, TF), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=Dp * F + 2 * B * (D + F),
            transcendentals=0),
        interpret=interpret,
    )(x2, w_packed, scale.reshape(1, F), *extras)


# ------------------------------------------------- fused gate-up (silu) ---

def _qmm8_gu_kernel(x_ref, wg_ref, wu_ref, sg_ref, su_ref, row_ref, o_ref):
    xb = x_ref[:]
    g = jnp.dot(xb, wg_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) \
        * sg_ref[:].astype(jnp.float32)
    u = jnp.dot(xb, wu_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) \
        * su_ref[:].astype(jnp.float32)
    r = row_ref[:].astype(jnp.float32)
    g = g * r
    u = u * r
    o_ref[:] = (g * jax.nn.sigmoid(g) * u).astype(o_ref.dtype)


def _qmm4_gu_kernel(x_ref, wg_ref, wu_ref, sg_ref, su_ref, row_ref, o_ref):
    def halfdot(w_ref):
        p32 = w_ref[:].astype(jnp.int32)
        lo = (((p32 & 15) ^ 8) - 8).astype(jnp.bfloat16)
        hi = (p32 >> 4).astype(jnp.bfloat16)
        acc = jnp.dot(x_ref[:, 0], lo, preferred_element_type=jnp.float32)
        return acc + jnp.dot(x_ref[:, 1], hi,
                             preferred_element_type=jnp.float32)
    r = row_ref[:].astype(jnp.float32)
    g = halfdot(wg_ref) * sg_ref[:].astype(jnp.float32) * r
    u = halfdot(wu_ref) * su_ref[:].astype(jnp.float32) * r
    o_ref[:] = (g * jax.nn.sigmoid(g) * u).astype(o_ref.dtype)


def supports_gateup(d: int, f2: int, b: int, bits: int) -> bool:
    """f2 = fused gate|up output width (2 * d_ff)."""
    if f2 % 2:
        return False
    f = f2 // 2
    if bits == 8:
        return d % 256 == 0 and f % 128 == 0 and \
            _pick_tf(2 * d, f, b, x_bytes=b * d * 2) > 0
    return d % 2 == 0 and (d // 2) % 256 == 0 and f % 128 == 0 and \
        _pick_tf(d * 4, f, b, x_bytes=b * d * 2) > 0   # (d//2)*8 == d*4


@functools.partial(jax.jit, static_argnames=('out_dtype', 'interpret'))
def qmm_gateup(x: jnp.ndarray, w_packed: jnp.ndarray, scale: jnp.ndarray,
               out_dtype=jnp.bfloat16, interpret: bool = False,
               row_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused SwiGLU front half: silu(x @ Wg) * (x @ Wu) where the weight
    is the decode-fused [gate | up] concatenation (D or D//2 packed rows,
    2*F columns). The (B, 2F) projection never round-trips HBM — decode
    measured it as one of the largest non-matmul costs (a (B, 2F) f32
    write + read + separate silu/mul dispatches per layer). row_scale
    folds the pre-norm rsqrt factor (see qmm_int8)."""
    B, D = x.shape
    rows, F2 = w_packed.shape
    F = F2 // 2
    int4 = rows * 2 == D
    assert int4 or rows == D, (rows, D)
    if row_scale is None:
        row = jnp.ones((B, 1), jnp.float32)
    else:
        row = row_scale.reshape(B, 1).astype(jnp.float32)
    scale = scale.reshape(1, F2)
    if int4:
        # two packed panels (gate + up) in flight, each unpacking to an
        # i32 copy + two bf16 planes -> budget 8x the packed column bytes
        TF = _pick_tf(rows * 8, F, B, x_bytes=B * D * 2)
        kernel = _qmm4_gu_kernel
        x2 = x.astype(jnp.bfloat16).reshape(B, 2, rows)
        xspec = pl.BlockSpec((B, 2, rows), lambda j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        flops = 2 * B * D * F2
        bytes_acc = rows * F2 + 2 * B * (D + F)
    else:
        TF = _pick_tf(2 * D, F, B, x_bytes=B * D * 2)
        kernel = _qmm8_gu_kernel
        x2 = x.astype(jnp.bfloat16)
        xspec = pl.BlockSpec((B, D), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
        flops = 2 * B * D * F2
        bytes_acc = D * F2 + 2 * B * (D + F)
    assert TF and F % TF == 0, (rows, F, B, TF)
    NJ = F // TF
    return pl.pallas_call(
        kernel,
        grid=(NJ,),
        in_specs=[
            xspec,
            pl.BlockSpec((rows, TF), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, TF), lambda j: (0, j + NJ),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j + NJ),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc,
            transcendentals=B * F),
        interpret=interpret,
    )(x2, w_packed, w_packed, scale, scale, row)
