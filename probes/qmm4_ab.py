"""Microbench: qmm int8 vs int4 (i32 unpack) vs int4 (i8-domain unpack).

Chain pattern: lax.scan, fetch-terminated, baseline-subtracted.
Shapes from the 1B decode: D=2048, F=5632 (gate-up fused = 11264), B=64.
"""
import functools
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

B, D, F = 64, 2048, 11264
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
w8 = np.asarray(rng.integers(-127, 127, (D, F)), np.int8)
q4 = np.asarray(rng.integers(-8, 7, (D, F)), np.int8)
w4 = jnp.asarray(pack_int4_splithalf(q4))
w8j = jnp.asarray(w8)
scale = jnp.asarray(rng.random(F) * 0.01, jnp.float32)


def _qmm4_kernel_i8(x_ref, w_ref, s_ref, o_ref):
    # no i32 expansion: i8 and/xor + exact bf16 arithmetic
    p = w_ref[:]
    loU = p & 15                                     # i8 andi
    lo = (loU ^ 8).astype(jnp.bfloat16) - 8.0        # sign-extend low nibble
    hi = (p.astype(jnp.bfloat16) - loU.astype(jnp.bfloat16)) * 0.0625
    acc = jnp.dot(x_ref[:, 0], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, 1], hi, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def qmm_int4_i8(x, w_packed, scale):
    B, D = x.shape
    Dp, F = w_packed.shape
    TF = _pick_tf(Dp, F)
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    return pl.pallas_call(
        _qmm4_kernel_i8,
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
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=Dp * F + 2 * B * (D + F),
            transcendentals=0),
    )(x2, w_packed, scale.reshape(1, F))


def _qmm4_kernel_i8b(x_ref, w_ref, s_ref, o_ref):
    # stay in the i8 domain until ONE convert per plane:
    #   loU = p & 15; lo = (loU ^ 8) - 8        (i8 and/xor/sub)
    #   hi16 = p - loU                            (i8 sub; == 16*hi exactly)
    # and the /16 folds into the hi activation half (tiny B x Dp scale).
    p = w_ref[:]
    loU = p & 15
    lo = ((loU ^ 8) - 8).astype(jnp.bfloat16)
    hi16 = (p - loU).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:, 0], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, 1], hi16, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@jax.jit
def qmm_int4_i8b(x, w_packed, scale):
    B, D = x.shape
    Dp, F = w_packed.shape
    TF = _pick_tf(Dp, F)
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    # fold the 1/16 of the high-nibble plane into its activation half
    x2 = x2.at[:, 1].multiply(0.0625)
    return pl.pallas_call(
        _qmm4_kernel_i8b,
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
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=Dp * F + 2 * B * (D + F),
            transcendentals=0),
    )(x2, w_packed, scale.reshape(1, F))


# correctness first
r8 = np.asarray(qmm_int8(x, w8j, scale))
r4 = np.asarray(qmm_int4(x, w4, scale))
r4b = np.asarray(qmm_int4_i8(x, w4, scale))
print('bf16-unpack max diff vs i32-unpack:', np.abs(r4b - r4).max())
r4c = np.asarray(qmm_int4_i8b(x, w4, scale))
print('i8-domain max diff vs i32-unpack:', np.abs(r4c - r4).max())


def chain(fn, w, iters=60):
    def body(c, _):
        y = fn(c, w, scale)
        c2 = c + (y[:, :1] * 1e-9).astype(c.dtype)
        return c2, ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    c = f(x)
    np.asarray(c)
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
t8 = chain(qmm_int8, w8j) - base
t4 = chain(qmm_int4, w4) - base
t4b = chain(lambda a, b, c: qmm_int4_i8(a, b, c), w4) - base
t4c = chain(lambda a, b, c: qmm_int4_i8b(a, b, c), w4) - base
floor8 = D * F / 819e9
print(f'baseline {base*1e6:.1f}us')
print(f'int8      {t8*1e6:7.1f}us  (floor {floor8*1e6:.1f}us)')
print(f'int4 i32  {t4*1e6:7.1f}us  (floor {floor8/2*1e6:.1f}us)')
print(f'int4 bf16 {t4b*1e6:7.1f}us')
print(f'int4 i8dom{t4c*1e6:7.1f}us')
