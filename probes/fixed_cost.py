"""Isolate the paged kernel's per-call fixed cost at minimal fill.

Variants at B=64, fill=128, MB=1 (one block per slot):
  full      — production kernel
  noscale   — bf16-style (kv_scale=None math skipped, scale input dummy)
  emptybody — same grid/specs, body writes zeros (isolates DMA/specs)
  nodots    — masks + softmax chain only, dots removed
Chain timing, fetch-terminated, baseline-subtracted.
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

import ppq_tpu.kernels.paged_attention as pa

B, KV, rep, Dh, BLK = 64, 8, 2, 128, 128
MB = 1
NB = 513            # engine-size pool: scale pool 4.2MB rides full-VMEM
R = KV * rep
KVDh = KV * Dh
NEG_INF = -1e30

rng = np.random.default_rng(0)
q4 = jnp.asarray(rng.standard_normal((B, KV, rep, Dh)), jnp.bfloat16)
kv_pool = jnp.asarray(rng.integers(-127, 127, (NB, 2, BLK, KVDh)), jnp.int8)
kv_scale = jnp.asarray(rng.random((NB, 2, KV, BLK)) * .01 + .001,
                       jnp.float32)
tbl = jnp.asarray(rng.permutation(NB - 1)[:B * MB] + 1,
                  jnp.int32).reshape(B, MB)
lens = jnp.full((B,), 128, jnp.int32)


def variant(mode):
    def kernel(tbl_ref, lens_ref, qb_ref, kv_ref, sc_ref,
               acc_o, ml_o, accw_s, ms, ls):
        j = pl.program_id(1)
        b = pl.program_id(0)

        if mode == 'emptybody':
            @pl.when(j == MB - 1)
            def _():
                acc_o[b] = jnp.zeros_like(acc_o[b])
                ml_o[b] = jnp.zeros_like(ml_o[b])
            return

        @pl.when(jnp.logical_and(b == 0, j == 0))
        def _():
            accw_s[:] = jnp.zeros_like(accw_s)

        @pl.when(j == 0)
        def _():
            ms[:] = jnp.full_like(ms, NEG_INF)
            ls[:] = jnp.zeros_like(ls)

        n_valid = lens_ref[b] - j * BLK
        nb = jax.lax.div(lens_ref[b] + (BLK - 1), BLK)
        jj = jnp.clip(j, 0, jnp.maximum(nb - 1, 0))
        row = tbl_ref[b, jj]

        @pl.when(n_valid > 0)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 1)
            mask = lane < n_valid
            inv_sqrt = np.float32(1.0 / np.sqrt(Dh))
            if mode == 'nodots':
                s = kv_ref[0, 0, :R, :BLK].astype(jnp.float32).T[:R, :BLK]
            else:
                s = jax.lax.dot_general(
                    qb_ref[b], kv_ref[0, 0].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if mode in ('full', 'nodots'):
                ks = jnp.broadcast_to(sc_ref[row, 0][:, None, :],
                                      (KV, rep, BLK)).reshape(R, BLK)
                s = s * ks
            s = jnp.where(mask, s * inv_sqrt, NEG_INF)
            m_new = jnp.maximum(ms[:], jnp.max(s, axis=1, keepdims=True))
            corr = jnp.exp(ms[:] - m_new)
            p = jnp.exp(s - m_new)
            ls[:] = ls[:] * corr + jnp.sum(p, axis=1, keepdims=True)
            if mode in ('full', 'nodots'):
                vs = jnp.broadcast_to(sc_ref[row, 1][:, None, :],
                                      (KV, rep, BLK)).reshape(R, BLK)
                p = p * vs
            if mode == 'nodots':
                pv = jnp.broadcast_to(p[:, :1], (R, KVDh)) * 0
            else:
                pv = jnp.dot(p.astype(jnp.bfloat16),
                             kv_ref[0, 1].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            accw_s[:] = accw_s[:] * corr + pv
            ms[:] = m_new

        @pl.when(j == MB - 1)
        def _():
            row_kv = jax.lax.broadcasted_iota(jnp.int32, (R, KVDh), 0) // rep
            col_kv = jax.lax.broadcasted_iota(jnp.int32, (R, KVDh), 1) // Dh
            accd = jnp.where(row_kv == col_kv, accw_s[:], 0) \
                .reshape(R, KV, Dh).sum(axis=1)
            acc_o[b] = accd.reshape(KV, rep, Dh)
            ml_o[b] = jnp.concatenate([ms[:], ls[:]],
                                      axis=1).reshape(KV, rep, 2)
    return kernel


@functools.partial(jax.jit, static_argnames=('mode',))
def call(q, mode):
    def blk_idx(b, j, tbl, lens):
        nb = jax.lax.div(lens[b] + (BLK - 1), BLK)
        jj = jnp.clip(j, 0, jnp.maximum(nb - 1, 0))
        return tbl[b, jj]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MB),
        in_specs=[
            pl.BlockSpec((B, R, KVDh), lambda b, j, t, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, BLK, KVDh),
                         lambda b, j, t, l: (blk_idx(b, j, t, l), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kv_scale.shape, lambda b, j, t, l: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, KV, rep, Dh), lambda b, j, t, l: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, rep, 2), lambda b, j, t, l: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, KVDh), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
        ],
    )
    acc, ml = pl.pallas_call(
        variant(mode), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, KV, rep, Dh), jnp.float32),
                   jax.ShapeDtypeStruct((B, KV, rep, 2), jnp.float32)],
    )(tbl, lens, pa.build_qblock(q), kv_pool, kv_scale)
    return acc, ml


def chain(fn, carry, iters=50):
    def body(c, _):
        out = fn(c)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return c + (leaf.reshape(-1)[:1] * 1e-20).astype(c.dtype).sum(), ()
    runj = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=iters)[0])
    np.asarray(runj(carry))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(runj(carry))
        best = min(best, (time.perf_counter() - t0) / iters * 1e6)
    return best


base = chain(lambda c: (c,), q4)
print(f'empty chain: {base:.1f} us')
t_prod = chain(lambda c: pa.paged_attention_decode_fused(
    c, kv_pool, kv_scale, tbl, lens), q4) - base
print(f'production kernel: {t_prod:7.1f} us', flush=True)
for mode in ('full', 'noscale', 'nodots', 'emptybody'):
    t = chain(lambda c: call(c, mode), q4) - base
    print(f'{mode:10s}: {t:7.1f} us', flush=True)
# floor: kv blocks 16MB + qb 4MB + scales 4.2MB + out 0.6MB
print('floor ~', (B * 2 * BLK * KVDh + B * R * KVDh * 2 + kv_scale.size * 4
                  + B * KV * rep * Dh * 4) / 819e9 * 1e6, 'us')
