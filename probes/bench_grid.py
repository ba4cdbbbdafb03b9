"""Isolate the paged kernel's cost drivers: grid steps vs DMA bytes.

(a) fill=128, MB=1   — 64 grid steps, 64 active blocks
(b) fill=128, MB=8   — 512 grid steps, same 64 active blocks (448 idle)
(c) fill=896, MB=8   — 512 grid steps, 448 active blocks (7x bytes of a)
min-of-5 chain timings, empty-chain baseline subtracted.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
import ppq_tpu.kernels.paged_attention as pa

B, KV, rep, Dh, BLK = 64, 8, 2, 128, 128
NB = B * 8 + 1
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, KV, rep, Dh)), jnp.bfloat16)
kv_pool = jnp.asarray(rng.integers(-127, 127, (NB, 2, BLK, KV * Dh)),
                      jnp.int8)
kv_scale = jnp.asarray(rng.random((NB, 2, KV, BLK)) * .01 + .001,
                       jnp.float32)
tbl_full = jnp.asarray(rng.permutation(NB - 1)[:B * 8] + 1,
                       jnp.int32).reshape(B, 8)


def timed(fn, reps=5, iters=50):
    def body(c, _):
        acc, m, l = fn(c)
        return c + (acc[0, 0, 0, :1] * 1e-20).astype(c.dtype).sum(), ()
    runj = jax.jit(lambda q0: jax.lax.scan(body, q0, None, length=iters)[0])
    np.asarray(runj(q))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(runj(q))
        best = min(best, (time.perf_counter() - t0) / iters * 1e6)
    return best


def timed_empty(reps=5, iters=50):
    def body(c, _):
        return c + (c[0, 0, 0, :1] * 1e-20).astype(c.dtype).sum(), ()
    runj = jax.jit(lambda q0: jax.lax.scan(body, q0, None, length=iters)[0])
    np.asarray(runj(q))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(runj(q))
        best = min(best, (time.perf_counter() - t0) / iters * 1e6)
    return best


base = timed_empty()
print(f'empty chain: {base:.1f} us')

cases = [('a: fill128 MB1', 128, 1), ('b: fill128 MB8', 128, 8),
         ('c: fill896 MB8', 896, 8), ('d: fill384 MB4', 384, 4)]
for name, fill, mb in cases:
    lens = jnp.full((B,), fill, jnp.int32)
    tbl = tbl_full[:, :mb]
    t = timed(lambda c, tbl=tbl, lens=lens: pa.paged_attention_decode_fused(
        c, kv_pool, kv_scale, tbl, lens))
    act = B * -(-fill // BLK)
    print(f'{name}: {t - base:7.1f} us  grid={B * mb:4d} active={act:4d} '
          f'bytes={act * 2 * BLK * KV * Dh / 1e6:.1f}MB')
