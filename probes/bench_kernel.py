"""Microbench: paged-attention kernel, scales-full vs per-block DMA.

Chain pattern per memory notes: lax.scan chain, fetch-terminated,
empty-chain baseline subtracted.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import ppq_tpu.kernels.paged_attention as pa

B, KV, rep, Dh = 64, 8, 2, 128
BLK = 128
MB_SEQ = 8                      # max blocks per seq (max_seq_len 1024)
NB = B * MB_SEQ + 1
fill = 288                      # avg fill in the profile

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, KV, rep, Dh)), jnp.bfloat16)
kv_pool = jnp.asarray(rng.integers(-127, 127, (NB, 2, BLK, KV * Dh)),
                      jnp.int8)
kv_scale = jnp.asarray(rng.random((NB, 2, KV, BLK)) * 0.01 + 0.001,
                       jnp.float32)
tbl = jnp.asarray(rng.permutation(NB - 1)[:B * MB_SEQ] + 1,
                  jnp.int32).reshape(B, MB_SEQ)
lens = jnp.full((B,), fill, jnp.int32)

print('scale pool MB:', kv_scale.size * 4 / 1e6)

def chain(fn, iters=50):
    def body(c, _):
        acc, m, l = fn(c)
        # fold the output back into the carry so the chain serializes
        c2 = c + (acc[0, 0, 0, :1] * 1e-20).astype(c.dtype).sum()
        return c2, ()
    def run(q0):
        c, _ = jax.lax.scan(body, q0, None, length=iters)
        return c
    runj = jax.jit(run)
    out = runj(q); np.asarray(out)
    t0 = time.perf_counter()
    out = runj(q)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e6

def empty_chain(iters=50):
    def body(c, _):
        return c + (c[0, 0, 0, :1] * 1e-20).astype(c.dtype).sum(), ()
    def run(q0):
        c, _ = jax.lax.scan(body, q0, None, length=iters)
        return c
    runj = jax.jit(run)
    out = runj(q); np.asarray(out)
    t0 = time.perf_counter()
    out = runj(q); np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e6

base = empty_chain()
print(f'empty chain: {base:.1f} us/iter')


# force per-block scales by inflating the scale pool beyond the budget:
# same data replicated — identical math, >4MB triggers the per-block spec
reps = int(np.ceil(6.5e6 / (kv_scale.size * 4)))
if reps > 1:
    kv_scale_big = jnp.tile(kv_scale, (reps, 1, 1, 1))
else:
    kv_scale_big = kv_scale
print('big scale pool MB:', kv_scale_big.size * 4 / 1e6)
for it in range(3):
    t_full = chain(lambda c: pa.paged_attention_decode_fused(
        c, kv_pool, kv_scale, tbl, lens))
    t_blk = chain(lambda c: pa.paged_attention_decode_fused(
        c, kv_pool, kv_scale_big, tbl, lens))
    print(f'iter {it}: scales_full {t_full-base:.1f} us  '
          f'per-block {t_blk-base:.1f} us (net of {base:.1f})')

# numeric parity
a1 = pa.paged_attention_decode_fused(q, kv_pool, kv_scale, tbl, lens)
a2 = pa.paged_attention_decode_fused(q, kv_pool, kv_scale_big, tbl, lens)
for x, y in zip(a1, a2):
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
print('parity OK')

# read floor for reference: bytes touched per call
byts = B * (fill / BLK) * (2 * BLK * KV * Dh) + q.size * 2
print(f'kv bytes/call ~ {byts/1e6:.1f} MB -> floor ~ {byts/819e9*1e6:.1f} us')
