"""Per-dispatch host cost through the axon tunnel: is per-STEP decode
dispatch (no burst scan) affordable?

Chains N donated-buffer jit calls (a realistic arg tree: ~70 param
leaves + a 4-leaf cache dict) without intermediate syncs, fetches at the
end. Reports wall per call for (a) a trivial body (pure dispatch floor),
(b) a body doing a cache DUS + small matmul (decode-step skeleton).

If the floor is >= ~0.5 ms/call, the burst scan stays; if it's ~0.1 ms,
a stepwise decode with donated in-place cache writes beats the scan's
full-leaf carry copies (probes/bank_dus.py: ~14 us per carried DUS).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

L, B, S, KV, Dh = 16, 128, 1024, 8, 128
params = {f'w{i}': jnp.zeros((256, 256), jnp.bfloat16) for i in range(70)}
cache = {
    'k': jnp.zeros((L, B, S, KV, Dh), jnp.int8),
    'v': jnp.zeros((L, B, S, KV, Dh), jnp.int8),
    'ks': jnp.zeros((L, B, S, KV), jnp.float32),
    'vs': jnp.zeros((L, B, S, KV), jnp.float32),
}
tokens = jnp.zeros((B,), jnp.int32)
seq_lens = jnp.full((B,), 16, jnp.int32)


@jax.jit
def trivial(params, tokens):
    return tokens + params['w0'][0, 0].astype(jnp.int32)


from functools import partial


@partial(jax.jit, donate_argnums=(1,))
def steplike(params, cache, tokens, seq_lens):
    new = jnp.ones((B, 1, KV, Dh), jnp.int8)
    k = cache['k']
    for li in range(L):
        slab = jax.vmap(
            lambda c, p: jax.lax.dynamic_update_slice(
                c, new[0], (p, 0, 0)))(k[li], seq_lens)
        k = jax.lax.dynamic_update_index_in_dim(k, slab, li, 0)
    x = tokens[:, None].astype(jnp.bfloat16) @ params['w0'][:1]
    out = dict(cache)
    out['k'] = k
    return tokens + x[:, 0].astype(jnp.int32), out


def bench(name, fn, donated_cache):
    global cache
    if donated_cache:
        t, c = fn(params, cache, tokens, seq_lens)
        cache = c
        np.asarray(t)
        for trial in range(3):
            t0 = time.perf_counter()
            tks = tokens
            for _ in range(64):
                tks, cache = fn(params, cache, tks, seq_lens)
            np.asarray(tks)
            dt = time.perf_counter() - t0
            print(f'{name}: {dt / 64 * 1e3:7.3f} ms/call', flush=True)
    else:
        t = fn(params, tokens)
        np.asarray(t)
        for trial in range(3):
            t0 = time.perf_counter()
            tks = tokens
            for _ in range(64):
                tks = fn(params, tks)
            np.asarray(tks)
            dt = time.perf_counter() - t0
            print(f'{name}: {dt / 64 * 1e3:7.3f} ms/call', flush=True)


bench('trivial (dispatch floor)', trivial, False)
bench('steplike (donated cache DUS x L)', steplike, True)
