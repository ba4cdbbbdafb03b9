"""Is a per-iteration dynamic_update_slice on a scan-carried buffer
in-place, or does it copy the whole leaf?

The burst banks K/V at column i of (B, n, KV, Dh) buffers carried
through lax.scan — 64 DUS per step. Profiled at B=128: 8 us per DUS,
which is exactly a full 4 MB leaf copy (r+w at 819 GB/s), not the 128 KB
slice write it should be. Variants:
  dus_read    — DUS then einsum-read the updated buffer (production shape)
  dus_only    — DUS, reader uses a constant (is the read the culprit?)
  dus_first   — read BEFORE write (read old buffer, then DUS)
  two_buf     — fused (B, 2, n, KV, Dh) buffer, one DUS banks k and v
Chained scan, fetch-terminated.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

B, n, KV, Dh, L = 128, 32, 8, 128, 16
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, KV, 2, Dh)), jnp.bfloat16)
newkv = jnp.asarray(rng.integers(-127, 127, (B, 1, KV, Dh)), jnp.int8)

STEPS = 64


def run(variant):
    if variant == 'two_buf':
        bufs = tuple(jnp.zeros((B, 2, n, KV, Dh), jnp.int8)
                     for _ in range(L))
    elif variant == 'flat_read':
        bufs = tuple(jnp.zeros((B, n, KV * Dh), jnp.int8)
                     for _ in range(2 * L))
    elif variant in ('lead_read', 'pallas_bank'):
        # update axis OUTERMOST: the written column (1, B, KV*Dh) is one
        # contiguous 128 KB piece instead of B strided slivers
        bufs = tuple(jnp.zeros((n, B, KV * Dh), jnp.int8)
                     for _ in range(2 * L))
    else:
        bufs = tuple(jnp.zeros((B, n, KV, Dh), jnp.int8)
                     for _ in range(2 * L))

    def step(carry, i):
        bufs, acc = carry
        bufs = list(bufs)
        for li in range(len(bufs)):
            if variant == 'dus_first':
                lb = jnp.einsum('bkrd,bjkd->bkrj', q,
                                bufs[li].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(lb)
                bufs[li] = jax.lax.dynamic_update_slice(
                    bufs[li], newkv, (0, i, 0, 0))
            elif variant == 'two_buf':
                nk = jnp.stack([newkv, newkv], axis=1)  # (B,2,1,KV,Dh)
                bufs[li] = jax.lax.dynamic_update_slice(
                    bufs[li], nk, (0, 0, i, 0, 0))
                lb = jnp.einsum('bkrd,bjkd->bkrj', q,
                                bufs[li][:, 0].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(lb)
            elif variant == 'dus_barrier':
                # keep the DUS a standalone op: if it fuses with the
                # update's producer chain into a loop fusion, XLA
                # materializes the whole buffer (full-leaf copy) instead
                # of updating in place
                upd = jax.lax.optimization_barrier(newkv * 1)
                bufs[li] = jax.lax.dynamic_update_slice(
                    bufs[li], upd, (0, i, 0, 0))
                lb = jnp.einsum('bkrd,bjkd->bkrj', q,
                                bufs[li].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(lb)
            elif variant == 'lead_read':
                bufs[li] = jax.lax.dynamic_update_slice(
                    bufs[li], newkv.reshape(1, B, KV * Dh), (i, 0, 0))
                lb = jnp.einsum('bkrd,jbkd->bkrj', q,
                                bufs[li].reshape(n, B, KV, Dh)
                                .astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(lb)
            elif variant == 'pallas_bank':
                bufs[li] = _pallas_bank(bufs[li],
                                        newkv.reshape(1, B, KV * Dh), i)
                lb = jnp.einsum('bkrd,jbkd->bkrj', q,
                                bufs[li].reshape(n, B, KV, Dh)
                                .astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(lb)
            elif variant == 'flat_read':
                # (B, n, KV*Dh) layout: minor dims (n, 1024) tile cleanly
                bufs[li] = jax.lax.dynamic_update_slice(
                    bufs[li], newkv.reshape(B, 1, KV * Dh), (0, i, 0))
                lb = jnp.einsum('bkrd,bjkd->bkrj', q,
                                bufs[li].reshape(B, n, KV, Dh)
                                .astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                acc = acc + jnp.sum(lb)
            else:
                bufs[li] = jax.lax.dynamic_update_slice(
                    bufs[li], newkv, (0, i, 0, 0))
                if variant == 'dus_read':
                    lb = jnp.einsum('bkrd,bjkd->bkrj', q,
                                    bufs[li].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                    acc = acc + jnp.sum(lb)
                else:
                    acc = acc + 1.0
        return (tuple(bufs), acc), ()

    @jax.jit
    def go():
        (bufs2, acc), _ = jax.lax.scan(
            step, (bufs, jnp.float32(0)),
            jnp.arange(STEPS, dtype=jnp.int32) % n)
        return acc

    np.asarray(go())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(go())
        best = min(best, time.perf_counter() - t0)
    n_dus = STEPS * (L if variant == 'two_buf' else 2 * L)
    print(f'{variant:10s} {best / STEPS * 1e3:7.3f} ms/step '
          f'({best / n_dus * 1e6:6.2f} us per DUS)', flush=True)


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bank_kernel(i_ref, new_ref, buf_in, buf_out):
    del i_ref, buf_in
    buf_out[...] = new_ref[...]


@jax.jit
def _pallas_bank(buf, new, i):
    nn, Bd, F = buf.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, Bd, F), lambda g, iref: (iref[0], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bd, F), lambda g, iref: (iref[0], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Bd, F), lambda g, iref: (iref[0], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _bank_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={2: 0},
    )(jnp.asarray(i, jnp.int32).reshape(1), new, buf)


import sys
VARIANTS = sys.argv[1:] or ('dus_read', 'dus_only', 'dus_first', 'dus_barrier', 'flat_read', 'two_buf', 'lead_read')
for v in VARIANTS:
    run(v)
