"""A/B: our fused paged decode kernel (block-size sweep) vs upstream.

Chain timing, fetch-terminated, empty-chain baseline subtracted.
Upstream uses short chains (tunnel remote-compile has a body-size cap).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import ppq_tpu.kernels.paged_attention as pa
from jax.experimental.pallas.ops.tpu.paged_attention import (
    paged_attention_kernel as upk,
)

B, KV, rep, Dh = 64, 8, 2, 128
S = 1024
H = KV * rep
rng = np.random.default_rng(0)
q4 = jnp.asarray(rng.standard_normal((B, KV, rep, Dh)), jnp.bfloat16)


def chain(fn, carry, iters=50):
    def body(c, _):
        out = fn(c)
        leaf = jax.tree_util.tree_leaves(out)[0]
        c2 = c + (leaf.reshape(-1)[:1] * 1e-20).astype(c.dtype).sum()
        return c2, ()
    runj = jax.jit(lambda c0: jax.lax.scan(body, c0, None, length=iters)[0])
    np.asarray(runj(carry))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(runj(carry))
        best = min(best, (time.perf_counter() - t0) / iters * 1e6)
    return best


base50 = chain(lambda c: (c,), q4, iters=50)
base8 = chain(lambda c: (c,), q4, iters=8)
print(f'empty chain: {base50:.1f} us (50it) {base8:.1f} us (8it)')

pools = {}
for BLK in (128, 256, 512):
    MB = S // BLK
    NB = B * MB + 1
    kv_pool = jnp.asarray(rng.integers(-127, 127, (NB, 2, BLK, KV * Dh)),
                          jnp.int8)
    kv_scale = jnp.asarray(rng.random((NB, 2, KV, BLK)) * .01 + .001,
                           jnp.float32)
    tbl = jnp.asarray(rng.permutation(NB - 1)[:B * MB] + 1,
                      jnp.int32).reshape(B, MB)
    pools[BLK] = (kv_pool, kv_scale, tbl)

for fill in (256, 1024):
    lens = jnp.full((B,), fill, jnp.int32)
    floor = B * fill * KV * Dh * 2 / 819e9 * 1e6
    for BLK in (128, 256, 512):
        if fill < BLK:
            continue
        kv_pool, kv_scale, tbl = pools[BLK]
        t = chain(lambda c: pa.paged_attention_decode_fused(
            c, kv_pool, kv_scale, tbl, lens, block_size=BLK), q4) - base50
        print(f'fill={fill} BLK={BLK}: ours {t:7.1f} us '
              f'(floor {floor:5.1f}, eff {floor/t*100:4.0f}%)', flush=True)

# upstream bf16, short chain
k_pages = jnp.asarray(rng.standard_normal((KV, B * 8 + 1, 128, Dh)),
                      jnp.bfloat16)
v_pages = jnp.asarray(rng.standard_normal((KV, B * 8 + 1, 128, Dh)),
                      jnp.bfloat16)
tbl128 = pools[128][2]
for fill in (256, 1024):
    lens = jnp.full((B,), fill, jnp.int32)
    floor = B * fill * KV * Dh * 2 * 2 / 819e9 * 1e6
    for ppcb in (2, 4, 8):
        if ppcb * 128 > fill:
            continue
        try:
            t = chain(lambda c: upk.paged_attention(
                c.reshape(B, H, Dh), k_pages, v_pages, lens, tbl128,
                pages_per_compute_block=ppcb), q4, iters=8) - base8
            print(f'fill={fill} upstream ppcb={ppcb}: {t:7.1f} us '
                  f'(bf16 floor {floor:5.1f}, eff {floor/t*100:4.0f}%)',
                  flush=True)
        except Exception as e:
            print(f'fill={fill} upstream ppcb={ppcb}: FAILED '
                  f'{str(e)[:100]}', flush=True)
