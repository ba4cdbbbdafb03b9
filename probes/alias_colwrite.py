"""Can an in-scan aliased Pallas column write replace the banked-buffer
DUS carry rewrites?

Today burst_forward carries 32 per-layer (B, n, KV, Dh) s8 buffer leaves
through the scan and rewrites each with a dynamic_update_slice every
step: XLA never aliases a DUS'd carry in place, so each leaf pays a full
read+write (32 x 16.3 us = 0.52 ms/step at the 1B/B=128 config —
profiled r5). This probe carries ONE stacked (L, B, 2, n, KV*Dh) s8 leaf
and writes the step's column [.., i, :] with a pallas_call whose buffer
operand is input_output_aliased (the window_write.py pattern): if XLA
keeps the aliased buffer in place through the while-loop carry, the
per-step cost drops to the 4.2 MB column write.

Variants:
  a) dus-per-layer   — today's structure (32 leaves, 32 DUS/step)
  b) alias-colwrite  — 1 leaf, 1 aliased pallas DMA write/step
  c) dus-one-leaf    — 1 stacked leaf, 1 DUS/step (control: XLA should
                       copy all 134 MB/step — proves aliasing matters)
Each scan body also reads one layer's buffer slice into a tiny reduce so
the buffer is live inside the loop (prevents DCE).
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

L, B, KV, Dh, N = 16, 128, 8, 128, 32
KVDh = KV * Dh


def _colwrite_kernel(col_ref, new_ref, _buf_in, buf_out, sem):
    i = col_ref[0]
    # buffer is 6-D (L, B, 2, N, KV, Dh): (KV, Dh) is the tiled pair, so
    # the column dim N is untiled and a width-1 slice is DMA-legal
    cp = pltpu.make_async_copy(
        new_ref, buf_out.at[:, :, :, pl.ds(i, 1), :, :], sem)
    cp.start()
    cp.wait()


@jax.jit
def colwrite(buf, new, i):
    """buf (L,B,2,N,KV,Dh) s8; new (L,B,2,1,KV,Dh) s8; write column i."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _colwrite_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(buf.shape, buf.dtype)],
        input_output_aliases={2: 0},
    )(jnp.asarray([i], jnp.int32), new, buf)[0]


def make_new(i):
    return jnp.full((L, B, 2, 1, KV, Dh), i % 3, jnp.int8)


@jax.jit
def run_alias(buf0):
    def step(carry, i):
        buf, acc = carry
        buf = colwrite(buf, make_new(i), i)
        # read: one layer's k view, tiny reduce keeps it live
        acc = acc + jnp.sum(buf[3, :, 0].astype(jnp.float32))
        return (buf, acc), ()
    (buf, acc), _ = jax.lax.scan(step, (buf0, jnp.float32(0)),
                                 jnp.arange(N))
    return acc


@jax.jit
def run_dus_per_layer(leaves0):
    def step(carry, i):
        leaves, acc = carry
        leaves = list(leaves)
        new = jnp.full((B, 1, KV, Dh), i % 3, jnp.int8)
        for li in range(2 * L):
            leaves[li] = jax.lax.dynamic_update_slice(
                leaves[li], new, (0, i, 0, 0))
        acc = acc + jnp.sum(leaves[3].astype(jnp.float32))
        return (tuple(leaves), acc), ()
    (leaves, acc), _ = jax.lax.scan(step, (leaves0, jnp.float32(0)),
                                    jnp.arange(N))
    return acc


@jax.jit
def run_dus_one_leaf(buf0):
    def step(carry, i):
        buf, acc = carry
        new = jnp.full((L, B, 2, 1, KV, Dh), i % 3, jnp.int8)
        buf = jax.lax.dynamic_update_slice(buf, new, (0, 0, 0, i, 0, 0))
        acc = acc + jnp.sum(buf[3, :, 0].astype(jnp.float32))
        return (buf, acc), ()
    (buf, acc), _ = jax.lax.scan(step, (buf0, jnp.float32(0)),
                                 jnp.arange(N))
    return acc


def bench(name, fn, arg, iters=8):
    np.asarray(fn(arg))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(arg)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f'{name:16s}: {best * 1e3 / N:8.3f} ms/step '
          f'({best * 1e3:7.2f} ms/scan)', flush=True)


buf0 = jnp.zeros((L, B, 2, N, KV, Dh), jnp.int8)
leaves0 = tuple(jnp.zeros((B, N, KV, Dh), jnp.int8) for _ in range(2 * L))

bench('dus-per-layer', run_dus_per_layer, leaves0)
bench('alias-colwrite', run_alias, buf0)
bench('dus-one-leaf', run_dus_one_leaf, buf0)
