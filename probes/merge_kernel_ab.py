"""A/B the end-of-burst cache merge: vmapped XLA window write (full-slab
fusion, measured 12.8 ms/burst) vs the Pallas in-place window writer.

Production shape: L=16, B=128, S=1024, KV*Dh=1024, n=32, int8 k+v plus
f32 (S, KV) scales.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from ppq_tpu.kernels.window_write import window_write_inplace
from ppq_tpu.serving.model import _window_write

L, B, S, KV, Dh, n = 16, 128, 1024, 8, 128, 32
rng = np.random.default_rng(0)
cache = {
    'k': jnp.asarray(rng.integers(-100, 100, (L, B, S, KV, Dh)), jnp.int8),
    'v': jnp.asarray(rng.integers(-100, 100, (L, B, S, KV, Dh)), jnp.int8),
    'ks': jnp.asarray(rng.random((L, B, S, KV)), jnp.float32),
    'vs': jnp.asarray(rng.random((L, B, S, KV)), jnp.float32),
}
newk = jnp.asarray(rng.integers(-100, 100, (L, B, n, KV, Dh)), jnp.int8)
newv = jnp.asarray(rng.integers(-100, 100, (L, B, n, KV, Dh)), jnp.int8)
newks = jnp.asarray(rng.random((L, B, n, KV)), jnp.float32)
newvs = jnp.asarray(rng.random((L, B, n, KV)), jnp.float32)
pos = jnp.asarray(rng.integers(0, S - n, (B,)), jnp.int32)


@partial(jax.jit, donate_argnums=(0,))
def merge_xla(cache, newk, newv, newks, newvs, pos):
    def _merge(slabs, new):
        return jax.vmap(lambda s, nn: _window_write(s, nn, pos, None))(
            slabs, new)
    out = dict(cache)
    out['k'] = _merge(cache['k'], newk)
    out['v'] = _merge(cache['v'], newv)
    out['ks'] = _merge(cache['ks'], newks)
    out['vs'] = _merge(cache['vs'], newvs)
    return out


@partial(jax.jit, donate_argnums=(0,))
def merge_pallas(cache, newk, newv, newks, newvs, pos):
    k, v = window_write_inplace(
        (cache['k'], cache['v']), (newk, newv), pos)
    def _merge(slabs, new):
        return jax.vmap(lambda s, nn: _window_write(s, nn, pos, None))(
            slabs, new)
    return {'k': k, 'v': v,
            'ks': _merge(cache['ks'], newks),
            'vs': _merge(cache['vs'], newvs)}


def run(name, fn):
    global cache
    # correctness on a few (layer, slot) rows — fetch only slices (a full
    # 4.3 GB cache fetch through the tunnel stalls for minutes)
    p = np.asarray(pos)
    checks = [(0, 0), (7, 37), (L - 1, B - 1)]
    snaps = {(li, b): np.asarray(cache['k'][li, b]) for li, b in checks}
    cache = fn(cache, newk, newv, newks, newvs, pos)
    ok = True
    for li, b in checks:
        exp = snaps[(li, b)].copy()
        exp[p[b]:p[b] + n] = np.asarray(newk[li, b])
        ok &= np.array_equal(np.asarray(cache['k'][li, b]), exp)
    best = float('inf')
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(4):
            cache = fn(cache, newk, newv, newks, newvs, pos)
        jax.block_until_ready(cache['k'])
        np.asarray(cache['k'][0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f'{name}: {best * 1e3:8.3f} ms/merge  correct={ok}', flush=True)


run('xla_vmap_dus', merge_xla)
run('pallas_inplace', merge_pallas)
