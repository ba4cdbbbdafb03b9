"""ADVICE r2 #3: grouped decode attention under SKEWED fills.

Grouping uses a per-group consensus fill (glens = max over the group), so
a fill-16 slot grouped with a fill-at-cap slot reads up to G x more KV
bytes than the per-slot fused kernel. Measure uniform vs skewed batches
at the engine's own G choice; if grouped regresses under skew, the
engine should gate on host-known fill variance.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
from ppq_tpu.kernels.paged_attention import (
    blockmajor_window, grouped_group_size, identity_block_tables,
    paged_attention_decode_fused, paged_attention_decode_grouped)

B, KV, rep, Dh = 128, 8, 2, 128
S = 1024
rng = np.random.default_rng(0)
ck = jnp.asarray(rng.integers(-128, 127, (B, S, KV, Dh)), jnp.int8)
cv = jnp.asarray(rng.integers(-128, 127, (B, S, KV, Dh)), jnp.int8)
cks = jnp.asarray(rng.random((B, S, KV), np.float32) * 0.1)
cvs = jnp.asarray(rng.random((B, S, KV), np.float32) * 0.1)
q = jnp.asarray(rng.standard_normal((B, KV, rep, Dh)), jnp.float32)
REPS = 100


@functools.partial(jax.jit, static_argnames=('fn', 'n'))
def chain(q, args, fn, n):
    def body(c, _):
        acc, m, l = fn(c, *args)
        return c + 0.0 * acc.astype(c.dtype), None
    return jax.lax.scan(body, q, None, length=n)[0]


def timeit(fn, args):
    np.asarray(chain(q, args, fn, REPS))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(q, args, fn, REPS))
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e6


scenarios = {
    'uniform16':   np.full(B, 16),
    'uniform992':  np.full(B, 992),
    'skew16/992':  np.where(np.arange(B) % 2 == 0, 16, 992),
    'skew-sorted': np.sort(np.where(np.arange(B) % 2 == 0, 16, 992)),
    'rand0..992':  rng.integers(0, 992, B),
}
for name, fills in scenarios.items():
    lens = jnp.asarray(fills, jnp.int32)
    cap = min(-(-(int(fills.max()) + 32) // 128) * 128, S)
    RBLK = max(128, min(512, cap // 2))
    NBp = cap // RBLK
    G = grouped_group_size(B, RBLK)
    kv_bm, sc_bm = blockmajor_window(ck, cv, cks, cvs, cap, RBLK)
    t_grp = timeit(lambda qq, a, b, c, RBLK=RBLK, G=G:
                   paged_attention_decode_grouped(qq, a, b, c,
                                                  block_size=RBLK,
                                                  group=G),
                   (kv_bm, sc_bm, lens))
    k2 = ck[:, :cap].reshape(B * NBp, RBLK, KV * Dh)
    v2 = cv[:, :cap].reshape(B * NBp, RBLK, KV * Dh)
    kv = jnp.stack([k2, v2], axis=1)
    ks2 = cks[:, :cap].reshape(B * NBp, RBLK, KV).transpose(0, 2, 1)
    vs2 = cvs[:, :cap].reshape(B * NBp, RBLK, KV).transpose(0, 2, 1)
    sc = jnp.stack([ks2, vs2], axis=1)
    tbl = identity_block_tables(B, cap, RBLK)
    t_fus = timeit(lambda qq, a, b, c, d, RBLK=RBLK:
                   paged_attention_decode_fused(qq, a, b, c, d,
                                                block_size=RBLK),
                   (kv, sc, tbl, lens))
    print(f'{name:12s} cap={cap:5d} RBLK={RBLK} G={G}: '
          f'grouped {t_grp:7.1f}us  fused {t_fus:7.1f}us  '
          f'({t_fus / max(t_grp, 1e-9):4.2f}x)', flush=True)
