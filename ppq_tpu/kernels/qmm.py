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


@functools.partial(jax.jit, static_argnames=('out_dtype', 'interpret'))
def qmm_int8(x: jnp.ndarray, w_int: jnp.ndarray, scale: jnp.ndarray,
             out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """x: (B, D); w_int: (D, F) int8; scale: (F,) f32 → (B, F)."""
    B, D = x.shape
    F = w_int.shape[1]
    TF = _pick_tf(D, F, B, x_bytes=B * D * 2)
    assert TF, (D, F, B)
    return pl.pallas_call(
        _qmm8_kernel,
        grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=D * F + 2 * B * (D + F),
            transcendentals=0),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_int, scale.reshape(1, F))


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


def _qmm4_kernel(x_ref, w_ref, s_ref, o_ref):
    # w_ref panel: (Dp, TF) packed; low nibbles are w rows [0, Dp), high
    # nibbles rows [Dp, 2*Dp). x_ref: (B, 2, Dp) — [:, 0] multiplies the
    # lo plane, [:, 1] the hi plane.
    p32 = w_ref[:].astype(jnp.int32)
    lo = (((p32 & 15) ^ 8) - 8).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:, 0], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, 1], hi, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('out_dtype', 'interpret'))
def qmm_int4(x: jnp.ndarray, w_packed: jnp.ndarray, scale: jnp.ndarray,
             out_dtype=jnp.bfloat16, interpret: bool = False) -> jnp.ndarray:
    """x: (B, D); w_packed: (D//2, F) split-half int4; scale: (F,)."""
    B, D = x.shape
    Dp, F = w_packed.shape
    assert Dp * 2 == D, (D, Dp)
    # budget the panel as if columns were 4x wider: the nibble unpack
    # materializes an i32 copy of the panel plus two bf16 planes in VMEM
    # (Mosaic only legalizes shifts on i32), and a full-size panel OOMs
    # the 16MB scoped vmem at B=128.
    # NOTE (probes/qmm4_ab.py, v5e): the unpack is the kernel's bound —
    # 35.5us at D=2048/F=11264 vs a 14.1us byte floor (int8: 32.2us).
    # Cheaper unpacks don't legalize: Mosaic rejects subi/shli on i8
    # vectors, and a bf16-domain unpack measured 47us. int4's win on
    # this chip is HBM capacity (2x model per chip), not decode latency.
    TF = _pick_tf(Dp * 4, F, B, x_bytes=B * D * 2)
    assert TF, (Dp, F, B)
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    return pl.pallas_call(
        _qmm4_kernel,
        grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, 2, Dp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, TF), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=Dp * F + 2 * B * (D + F),
            transcendentals=0),
        interpret=interpret,
    )(x2, w_packed, scale.reshape(1, F))
