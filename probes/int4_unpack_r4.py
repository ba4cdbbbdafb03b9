"""Round-4 int4 unpack attack (VERDICT #8): can the unpack get under the
int8 kernel's time so int4 wins on latency, not just capacity?

Known from probes/qmm4_ab.py + STATUS r3: the i32 unpack costs 7 VPU ops
per packed byte (convert, and, xor, sub, shift, 2 converts) and the kernel
runs 35.5us vs a 14.1us byte floor (int8: 32.2us) at B=64 D=2048 F=11264.
Mosaic rejects subi/shli on i8 vectors; andi legalizes.

New variants (all use BIASED packing: nibble = q + 8 in [0, 15], stored
uint8, so no sign-extension xor is ever needed; the -8 bias folds into a
per-row correction  acc -= 8 * rowsum(x)  computed OUTSIDE the kernel):

  A. bias5  — bf16-domain, exact, 5 ops/byte, 2 dots:
       p_f  = bf16(p_u8)            (1 convert)
       lo_f = bf16(p_u8 & 15)       (1 and + 1 convert)
       hi_f = (p_f - lo_f) * 1/16   (1 sub + 1 mul; all integers <= 255,
                                     bf16-exact: 8 significand bits)
  B. fused3 — 3 ops/byte, 2 dots, ONE extra bf16 rounding on x:
       dot(x_lo, lo_b) + dot(x_hi, hi_b)
         = dot(x_lo - x_hi/16, lo_b) + dot(x_hi/16, p_u)
       x transforms are (B, Dp), computed outside; in-kernel ops are just
       convert(p), and, convert(lo).  x_hi/16 is exact (power of 2);
       x_lo - x_hi/16 rounds once to bf16 (~2^-8 relative — the same
       magnitude as the bf16 rounding every activation already carries).
  C. exact3 — 3 ops/byte, 3 dots (+50% MXU), bit-identical to the
       reference unpack: dot(x_lo, lo_b) + dot(x_hi16, p_u) -
       dot(x_hi16, lo_b), with x_hi16 = x_hi/16 exact.
  D. i16    — signed split-half packing as today, but unpack in the i16
       domain (half the vector footprint of i32) IF Mosaic legalizes
       i16 shifts: convert i8->i16, and/xor/sub/shift in i16.

Run on an idle chip:  python probes/int4_unpack_r4.py [B]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from ppq_tpu.kernels.qmm import (_pick_tf, pack_int4_splithalf, qmm_int4,
                                 qmm_int8)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
D, F = 2048, 11264
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
w8 = np.asarray(rng.integers(-127, 127, (D, F)), np.int8)
q4 = np.asarray(rng.integers(-8, 8, (D, F)), np.int8)
w4 = jnp.asarray(pack_int4_splithalf(q4))
w8j = jnp.asarray(w8)
scale = jnp.asarray(rng.random(F) * 0.01, jnp.float32)
Dp = D // 2


def pack_int4_biased(q: np.ndarray) -> np.ndarray:
    """(D, F) int8 in [-8, 7] -> (D//2, F) uint8: row r = (q[r]+8) |
    ((q[r + D//2]+8) << 4)."""
    n = (q + 8).astype(np.uint8)
    return (n[: D // 2] | (n[D // 2:] << 4)).astype(np.uint8)


w4b = jnp.asarray(pack_int4_biased(q4))


def _mk(kernel, extra_in_specs=(), x_shape=None):
    def call(x2, w_packed, scale, *extras):
        Dp_, F_ = w_packed.shape
        TF = _pick_tf(Dp_ * 4, F_, B, x_bytes=B * D * 2)
        return pl.pallas_call(
            kernel,
            grid=(F_ // TF,),
            in_specs=[
                pl.BlockSpec(x_shape or (B, 2, Dp_), lambda j: (0,) * len(
                    x_shape or (B, 2, Dp_)), memory_space=pltpu.VMEM),
                pl.BlockSpec((Dp_, TF), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TF), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                *extra_in_specs,
            ],
            out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, F_), jnp.bfloat16),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * D * F_,
                bytes_accessed=Dp_ * F_ + 2 * B * (D + F_),
                transcendentals=0),
        )(x2, w_packed, scale.reshape(1, F_), *extras)
    return call


# --- A: bias5 -------------------------------------------------------------
def _k_bias5(x_ref, w_ref, s_ref, c_ref, o_ref):
    p_f = w_ref[:].astype(jnp.bfloat16)
    lo_f = (w_ref[:] & 15).astype(jnp.bfloat16)
    hi_f = (p_f - lo_f) * jnp.bfloat16(0.0625)
    acc = jnp.dot(x_ref[:, 0], lo_f, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, 1], hi_f, preferred_element_type=jnp.float32)
    acc += c_ref[:]                      # (B, 1) broadcast: -8 * rowsum(x)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


_call_bias5 = _mk(_k_bias5, extra_in_specs=(
    pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),))


@jax.jit
def qmm4_bias5(x, w_packed, scale):
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    corr = (-8.0 * jnp.sum(x.astype(jnp.float32), axis=1,
                           keepdims=True))
    return _call_bias5(x2, w_packed, scale, corr)


# --- B: fused3 ------------------------------------------------------------
def _k_fused3(x_ref, w_ref, s_ref, c_ref, o_ref):
    p_f = w_ref[:].astype(jnp.bfloat16)
    lo_f = (w_ref[:] & 15).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:, 0], lo_f, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, 1], p_f, preferred_element_type=jnp.float32)
    acc += c_ref[:]
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


_call_fused3 = _mk(_k_fused3, extra_in_specs=(
    pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),))


@jax.jit
def qmm4_fused3(x, w_packed, scale):
    xb = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    x_lo, x_hi = xb[:, 0], xb[:, 1]
    x_hi16 = x_hi * jnp.bfloat16(0.0625)          # exact
    x0 = (x_lo - x_hi16).astype(jnp.bfloat16)     # one extra rounding
    x2 = jnp.stack([x0, x_hi16], axis=1)
    corr = (-8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True))
    return _call_fused3(x2, w_packed, scale, corr)


# --- C: exact3 ------------------------------------------------------------
def _k_exact3(x_ref, w_ref, s_ref, c_ref, o_ref):
    p_f = w_ref[:].astype(jnp.bfloat16)
    lo_f = (w_ref[:] & 15).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:, 0], lo_f, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, 1], p_f, preferred_element_type=jnp.float32)
    acc -= jnp.dot(x_ref[:, 1], lo_f, preferred_element_type=jnp.float32)
    acc += c_ref[:]
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


_call_exact3 = _mk(_k_exact3, extra_in_specs=(
    pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),))


@jax.jit
def qmm4_exact3(x, w_packed, scale):
    xb = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    x_hi16 = xb[:, 1] * jnp.bfloat16(0.0625)
    x2 = jnp.stack([xb[:, 0], x_hi16], axis=1)
    corr = (-8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True))
    return _call_exact3(x2, w_packed, scale, corr)


# --- D: i16 ---------------------------------------------------------------
def _k_i16(x_ref, w_ref, s_ref, o_ref):
    p16 = w_ref[:].astype(jnp.int16)
    lo = (((p16 & 15) ^ 8) - 8).astype(jnp.bfloat16)
    hi = (p16 >> 4).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:, 0], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, 1], hi, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


_call_i16 = _mk(_k_i16)


@jax.jit
def qmm4_i16(x, w_packed, scale):
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    return _call_i16(x2, w_packed, scale)


# --- correctness ----------------------------------------------------------
ref = np.asarray(qmm_int4(x, w4, scale), np.float32)


def check(name, fn, w):
    try:
        r = np.asarray(fn(x, w, scale), np.float32)
    except Exception as e:
        print(f'{name}: FAILED to compile/run: {type(e).__name__}: '
              f'{str(e)[:200]}')
        return None
    d = np.abs(r - ref)
    rel = d.max() / max(np.abs(ref).max(), 1e-9)
    print(f'{name}: max abs diff {d.max():.6f}  rel {rel:.2e}')
    return fn


fns = {}
for name, fn, w in [('bias5', qmm4_bias5, w4b),
                    ('fused3', qmm4_fused3, w4b),
                    ('exact3', qmm4_exact3, w4b),
                    ('i16', qmm4_i16, w4)]:
    if check(name, fn, w):
        fns[name] = (fn, w)


# --- timing ---------------------------------------------------------------
def chain(fn, w, iters=60):
    def body(c, _):
        y = fn(c, w, scale)
        c2 = c + (y[:, :1] * 1e-9).astype(c.dtype)
        return c2, ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    np.asarray(f(x))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def baseline(iters=60):
    def body(c, _):
        return c + (c[:, :1] * 1e-9).astype(c.dtype), ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    np.asarray(f(x))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


base = baseline()
floor8 = D * F / 819e9
print(f'B={B}  baseline {base*1e6:.1f}us  int8 floor {floor8*1e6:.1f}us  '
      f'int4 floor {floor8/2*1e6:.1f}us')
t8 = chain(qmm_int8, w8j) - base
print(f'int8        {t8*1e6:7.1f}us')
t4 = chain(qmm_int4, w4) - base
print(f'int4 i32    {t4*1e6:7.1f}us')
for name, (fn, w) in fns.items():
    t = chain(fn, w) - base
    print(f'int4 {name:7s}{t*1e6:7.1f}us')
