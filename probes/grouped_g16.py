"""Grouped decode-attention kernel: G sweep (8 vs 16 vs 32). Fewer grid
steps amortize the per-step fixed cost; VMEM slab doubles per doubling.
Chained timing, fetch-terminated, baseline-subtracted."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
from ppq_tpu.kernels.paged_attention import (
    blockmajor_window, paged_attention_decode_grouped)

B, KV, rep, Dh = 128, 8, 2, 128
S = 1024
rng = np.random.default_rng(0)
ck = jnp.asarray(rng.integers(-128, 127, (B, S, KV, Dh)), jnp.int8)
cv = jnp.asarray(rng.integers(-128, 127, (B, S, KV, Dh)), jnp.int8)
cks = jnp.asarray(rng.random((B, S, KV), np.float32) * 0.1)
cvs = jnp.asarray(rng.random((B, S, KV), np.float32) * 0.1)
q = jnp.asarray(rng.standard_normal((B, KV, rep, Dh)), jnp.float32)
REPS = 200


@functools.partial(jax.jit, static_argnames=('fn', 'n'))
def chain(q, args, fn, n):
    def body(c, _):
        acc, m, l = fn(c, *args)
        return c + 0.0 * acc.astype(c.dtype), None
    return jax.lax.scan(body, q, None, length=n)[0]


@functools.partial(jax.jit, static_argnames=('n',))
def empty(q, n):
    return jax.lax.scan(lambda c, _: (c + 0.0, None), q, None,
                        length=n)[0]


def timeit(fn, args):
    np.asarray(chain(q, args, fn, REPS))
    t0 = time.perf_counter()
    np.asarray(chain(q, args, fn, REPS))
    dt = time.perf_counter() - t0
    np.asarray(empty(q, REPS))
    t0 = time.perf_counter()
    np.asarray(empty(q, REPS))
    return (dt - time.perf_counter() + t0 + dt) and \
        (dt - (time.perf_counter() - t0)) / REPS * 1e6


ref = {}
for fill in (16, 128, 512):
    cap = min(-(-(fill + 32) // 128) * 128, S)
    RBLK = max(128, min(512, cap // 2))
    lens = jnp.full((B,), fill, jnp.int32)
    kv_bm, sc_bm = blockmajor_window(ck, cv, cks, cvs, cap, RBLK)
    for G in (8, 16, 32):
        if B % G:
            continue
        slab = G * 2 * RBLK * KV * Dh * 2
        if slab > 10 * 1024 * 1024:
            print(f'fill={fill} G={G}: skip (slab {slab >> 20}MB)')
            continue
        def f(qq, kv_bm, sc_bm, lens, RBLK=RBLK, G=G):
            return paged_attention_decode_grouped(
                qq, kv_bm, sc_bm, lens, block_size=RBLK, group=G)
        try:
            t = timeit(f, (kv_bm, sc_bm, lens))
        except Exception as e:
            print(f'fill={fill} G={G}: FAIL {type(e).__name__}', flush=True)
            continue
        a, m, l = f(q, kv_bm, sc_bm, lens)
        out = np.asarray(a / np.maximum(np.asarray(l), 1e-30)[..., None])
        key = fill
        if key not in ref:
            ref[key] = out
        d = np.abs(out - ref[key]).max()
        nbytes = B * cap * KV * Dh * 2
        print(f'fill={fill:4d} RBLK={RBLK} G={G:2d}: {t:7.1f}us '
              f'(floor {nbytes/819e9*1e6:5.1f}us) maxdiff {d:.1e}',
              flush=True)
