"""Microbench: paged-pool scatter variants on chip.

Pool s8[L*NB, 2, BLK, KVDh] = (8208, 2, 256, 1024) ~4.3GB.
Burst write: L=16, B=128, T=32 consecutive tokens per (L,B) slot.
Variants:
  tok        — current: per-token rows, default scatter flags
  tok_uniq   — same + unique_indices=True, mode='promise_in_bounds'
  blk        — block-granularity: gather touched blocks, merge, scatter back
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

L, NB, BLK, KVDh = 16, 513, 256, 1024
B, T = 128, 32
rng = np.random.RandomState(0)
rows_np = rng.permutation(NB - 1)[:B] + 1          # physical block per slot
off0_np = rng.randint(0, BLK - T, size=B)          # within-block offset
pool = jnp.zeros((L * NB, 2, BLK, KVDh), jnp.int8)
upd = jnp.asarray(rng.randint(-127, 127, (L, B, T, 2, KVDh)), jnp.int8)
rows = jnp.asarray(rows_np, jnp.int32)
off0 = jnp.asarray(off0_np, jnp.int32)


def tok(pool, upd, rows, off0, uniq):
    pos = off0[:, None] + jnp.arange(T, dtype=jnp.int32)[None]      # (B,T)
    lrows = (jnp.arange(L, dtype=jnp.int32)[:, None, None] * NB
             + rows[None, :, None])                                 # (L,B,1)
    lrows = jnp.broadcast_to(lrows, (L, B, T))
    plane = jnp.arange(2, dtype=jnp.int32)[None, None, None]
    if uniq:
        return pool.at[lrows[..., None], plane,
                       pos[None, :, :, None]].set(
            upd, unique_indices=True, mode='promise_in_bounds')
    return pool.at[lrows[..., None], plane, pos[None, :, :, None]].set(upd)


def blk(pool, upd, rows, off0):
    # all T tokens fit in one block here (off0 < BLK-T): gather the block,
    # merge columns [off0, off0+T), scatter whole blocks back
    lrows = (jnp.arange(L, dtype=jnp.int32)[:, None] * NB
             + rows[None, :])                                       # (L,B)
    blocks = pool[lrows]                                            # (L,B,2,BLK,KVDh)
    cols = jnp.arange(BLK, dtype=jnp.int32)[None, :]                # (1,BLK)
    sel = (cols >= off0[:, None]) & (cols < off0[:, None] + T)      # (B,BLK)
    # place upd at the right columns: build (L,B,2,BLK,KVDh) from (L,B,T,2,KVDh)
    idx = jnp.clip(cols - off0[:, None], 0, T - 1)                  # (B,BLK)
    gath = jnp.take_along_axis(
        upd.transpose(0, 1, 3, 2, 4),                               # (L,B,2,T,KVDh)
        idx[None, :, None, :, None], axis=3)                        # (L,B,2,BLK,KVDh)
    merged = jnp.where(sel[None, :, None, :, None], gath, blocks)
    return pool.at[lrows].set(merged, unique_indices=True,
                              mode='promise_in_bounds')


f_tok = jax.jit(lambda p, u: tok(p, u, rows, off0, False), donate_argnums=0)
f_uni = jax.jit(lambda p, u: tok(p, u, rows, off0, True), donate_argnums=0)
f_blk = jax.jit(lambda p, u: blk(p, u, rows, off0), donate_argnums=0)


def bench(name, f):
    global pool
    pool = f(pool, upd)
    np.asarray(pool[0, 0, 0, :4])                  # sync via fetch
    t0 = time.perf_counter()
    for _ in range(10):
        pool = f(pool, upd)
    np.asarray(pool[0, 0, 0, :4])
    dt = (time.perf_counter() - t0) / 10
    print(f'{name}: {dt*1e3:.2f} ms/call', flush=True)


for name, f in [('tok', f_tok), ('tok_uniq', f_uni), ('blk', f_blk)]:
    bench(name, f)
