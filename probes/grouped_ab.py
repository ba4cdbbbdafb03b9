"""A/B: grouped multi-slot decode-attention kernel vs the per-slot fused
kernel, across fills. Chained-scan timing, fetch-terminated. Pools ride as
jit ARGUMENTS (closure constants serialize into the remote-compile request
and blow its size limit)."""
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

REPS = 200


@functools.partial(jax.jit, static_argnames=('fn', 'n'))
def chain(q, args, fn, n):
    def body(c, _):
        acc, m, l = fn(c, *args)
        return c + 0.0 * acc.astype(c.dtype), None
    c, _ = jax.lax.scan(body, q, None, length=n)
    return c


@functools.partial(jax.jit, static_argnames=('n',))
def empty(q, n):
    def body(c, _):
        return c + 0.0, None
    c, _ = jax.lax.scan(body, q, None, length=n)
    return c


def timeit(fn, args):
    np.asarray(chain(q, args, fn, REPS))
    t0 = time.perf_counter()
    np.asarray(chain(q, args, fn, REPS))
    dt = time.perf_counter() - t0
    np.asarray(empty(q, REPS))
    t0 = time.perf_counter()
    np.asarray(empty(q, REPS))
    base = time.perf_counter() - t0
    return (dt - base) / REPS * 1e6  # us per call


for fill in (16, 128, 512, 1024):
    lens = jnp.full((B,), fill, jnp.int32)
    cap = min(-(-(fill + 32) // 128) * 128, S)
    RBLK = max(128, min(512, cap // 2))
    NBp = cap // RBLK
    k2 = ck[:, :cap].reshape(B * NBp, RBLK, KV * Dh)
    v2 = cv[:, :cap].reshape(B * NBp, RBLK, KV * Dh)
    kv = jnp.stack([k2, v2], axis=1)
    ks2 = cks[:, :cap].reshape(B * NBp, RBLK, KV).transpose(0, 2, 1)
    vs2 = cvs[:, :cap].reshape(B * NBp, RBLK, KV).transpose(0, 2, 1)
    sc = jnp.stack([ks2, vs2], axis=1)
    tbl = identity_block_tables(B, cap, RBLK)

    def f_fused(qq, kv, sc, tbl, lens, RBLK=RBLK):
        return paged_attention_decode_fused(qq, kv, sc, tbl, lens,
                                            block_size=RBLK)
    t_fused = timeit(f_fused, (kv, sc, tbl, lens))

    G = grouped_group_size(B, RBLK)
    kv_bm, sc_bm = blockmajor_window(ck, cv, cks, cvs, cap, RBLK)

    def f_grp(qq, kv_bm, sc_bm, lens, RBLK=RBLK, G=G):
        return paged_attention_decode_grouped(qq, kv_bm, sc_bm, lens,
                                              block_size=RBLK, group=G)
    t_grp = timeit(f_grp, (kv_bm, sc_bm, lens))

    a0, m0, l0 = paged_attention_decode_fused(q, kv, sc, tbl, lens,
                                              block_size=RBLK)
    a1, m1, l1 = paged_attention_decode_grouped(q, kv_bm, sc_bm, lens,
                                                block_size=RBLK, group=G)
    d = float(jnp.max(jnp.abs(a0 / jnp.maximum(l0, 1e-30)[..., None]
                              - a1 / jnp.maximum(l1, 1e-30)[..., None])))
    bytes_read = B * NBp * RBLK * KV * Dh * 2  # int8 K+V
    print(f'fill={fill:5d} cap={cap:5d} RBLK={RBLK} G={G} | '
          f'fused {t_fused:8.1f}us  grouped {t_grp:8.1f}us  '
          f'({t_fused / max(t_grp, 1e-9):4.2f}x)  maxdiff {d:.2e}  '
          f'floor {bytes_read / 819e9 * 1e6:6.1f}us', flush=True)
