"""Software-pipelined int4 qmm: overlap the VPU nibble unpack with the MXU
dots across grid steps (VERDICT #8 structural attempt).

Measured context (probes/int4_prof.py, device time, B=128 D=2048 F=11264):
int8 37.5us; int4_i32 64.8us =~ 30us MXU floor + ~35us unpack SERIALIZED.
All cheaper-unpack variants (bias5x/fused3x/exact3x) land 69-96us — the
VPU work doesn't shrink (i8->bf16 casts lower through i32 anyway), so the
only lever left is OVERLap: unpack panel j into VMEM scratch while the
MXU contracts panel j-1's planes.

Kernel 'pipe': grid has N+1 steps; step j unpacks panel min(j, N-1) into
scratch[j%2] and (j>0) dots scratch[(j-1)%2], writing output block j-1.
Kernel 'ilv2': plain grid, body splits the panel into 2 column halves and
interleaves unpack(h+1) between dot issues of half h (gives Mosaic's
scheduler the independence without scratch).

python probes/int4_pipe.py [B] [D] [F]
"""
import functools
import glob
import gzip
import json
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from ppq_tpu.kernels.qmm import pack_int4_splithalf, qmm_int4, qmm_int8

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
D = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
F = int(sys.argv[3]) if len(sys.argv) > 3 else 11264
Dp = D // 2
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
q4 = np.asarray(rng.integers(-8, 8, (D, F)), np.int8)
w4 = jnp.asarray(pack_int4_splithalf(q4))
w8j = jnp.asarray(rng.integers(-127, 127, (D, F)), np.int8)
scale = jnp.asarray(rng.random(F) * 0.01, jnp.float32)

TF = 512
N = F // TF
assert F % TF == 0


def _unpack(p):
    p32 = p.astype(jnp.int32)
    lo = ((((p32 & 15) ^ 8) - 8)).astype(jnp.bfloat16)
    hi = (p32 >> 4).astype(jnp.bfloat16)
    return lo, hi


# --- pipe ----------------------------------------------------------------
def _k_pipe(x_ref, w_ref, s_ref, o_ref, lo_scr, hi_scr):
    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)
    prev = jax.lax.rem(j + 1, 2)

    @pl.when(j < N)
    def _():
        lo, hi = _unpack(w_ref[:])
        lo_scr[slot] = lo
        hi_scr[slot] = hi

    @pl.when(j > 0)
    def _():
        acc = jnp.dot(x_ref[:, 0], lo_scr[prev],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(x_ref[:, 1], hi_scr[prev],
                       preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@jax.jit
def qmm4_pipe(x, w_packed, scale):
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    return pl.pallas_call(
        _k_pipe,
        grid=(N + 1,),
        in_specs=[
            pl.BlockSpec((B, 2, Dp), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, TF), lambda j: (jnp.minimum(j, N - 1), 0)[::-1]
                         if False else (0, jnp.minimum(j, N - 1)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, jnp.maximum(j - 1, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, jnp.maximum(j - 1, 0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, Dp, TF), jnp.bfloat16),
                        pltpu.VMEM((2, Dp, TF), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=Dp * F + 2 * B * (D + F),
            transcendentals=0),
    )(x2, w_packed, scale.reshape(1, F))


# --- ilv2 ----------------------------------------------------------------
def _k_ilv2(x_ref, w_ref, s_ref, o_ref):
    H = TF // 2
    p = w_ref[:]
    lo0, hi0 = _unpack(p[:, :H])
    acc0 = jnp.dot(x_ref[:, 0], lo0, preferred_element_type=jnp.float32)
    lo1, hi1 = _unpack(p[:, H:])
    acc0 += jnp.dot(x_ref[:, 1], hi0, preferred_element_type=jnp.float32)
    acc1 = jnp.dot(x_ref[:, 0], lo1, preferred_element_type=jnp.float32)
    acc1 += jnp.dot(x_ref[:, 1], hi1, preferred_element_type=jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    o_ref[:, :H] = (acc0 * s[:, :H]).astype(o_ref.dtype)
    o_ref[:, H:] = (acc1 * s[:, H:]).astype(o_ref.dtype)


@jax.jit
def qmm4_ilv2(x, w_packed, scale):
    x2 = x.astype(jnp.bfloat16).reshape(B, 2, Dp)
    return pl.pallas_call(
        _k_ilv2,
        grid=(N,),
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


# --- correctness ----------------------------------------------------------
ref = np.asarray(qmm_int4(x, w4, scale), np.float32)
for name, fn in [('pipe', qmm4_pipe), ('ilv2', qmm4_ilv2)]:
    try:
        r = np.asarray(fn(x, w4, scale), np.float32)
        print(f'{name}: max abs diff {np.abs(r - ref).max():.6f}')
    except Exception as e:
        print(f'{name}: FAILED {type(e).__name__}: {str(e)[:200]}')

# --- device timing --------------------------------------------------------
ITERS = 256


def device_ms(fn):
    logdir = '/tmp/ppq_prof_int4p'
    fn()
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        fn()
    paths = glob.glob(logdir + '/**/*.trace.json.gz', recursive=True)
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        tr = json.load(f)
    events = tr['traceEvents']
    pids, tids = {}, {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pids[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tids[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
    return sum(e.get('dur', 0) / 1e3 for e in events
               if e.get('ph') == 'X'
               and 'TPU' in pids.get(e.get('pid'), '')
               and tids.get((e.get('pid'), e.get('tid'))) == 'XLA Modules')


def chain(fn, w):
    def body(c, _):
        y = fn(c, w, scale)
        return c + (y[:, :1] * 1e-9).astype(c.dtype), ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
    return lambda: np.asarray(f(x))


def base_chain():
    def body(c, _):
        return c + (c[:, :1] * 1e-9).astype(c.dtype), ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
    return lambda: np.asarray(f(x))


if __name__ == '__main__':
    base = device_ms(base_chain()) / ITERS * 1e3
    print(f'B={B} D={D} F={F} TF={TF}  base {base:.2f}us/it')
    for name, fn, w in [('int8', qmm_int8, w8j),
                        ('int4_i32', qmm_int4, w4),
                        ('pipe', qmm4_pipe, w4),
                        ('ilv2', qmm4_ilv2, w4)]:
        t = device_ms(chain(fn, w)) / ITERS * 1e3 - base
        print(f'{name:9s} {t:7.1f}us')
