"""A/B the dense burst-end cache merge strategies on chip.

The burst writes (L, B, n) new tokens into (L, B, S, KV, Dh) slabs at
per-slot offsets. Variants:
  rowscatter — current model._window_write double-vmap (lowers to a row
               scatter: L*B*n scattered rows per array, ~125 ns each)
  blockmerge — gather the 2 covering W-blocks per (l, b), one batched DUS
               merge, scatter the blocks back (L*B*(2+1+2) indices total)
Timing: chained dispatch, fetch-terminated, donated slabs.

MEASURED (v5e, 1B config L=16 B=64 S=1024 n=32, 2026-08-19):
  rowscatter   6.09 ms per merge  (0.19 ms/step amortized over burst 32)
  blockmerge  15.82 ms per merge  (gather+scatter lowering is worse)
A Pallas block-RMW writer (the paged pool_write design adapted to the
dense layout, layer axis folded into each DMA) measured 19.7 ms: the
dense (L, B, S, ...) layout makes ANY windowed write ~L*B*arrays DMA
transactions of small far-strided pieces (L outermost ⇒ a per-slot
window is 16 pieces 67 MB apart) at ~1 us each — the XLA row scatter is
effectively at that transaction floor already. CONCLUSION: keep the
rowscatter merge for the dense path; the production paged layout
(serving/paged.py) fuses K/V per block row precisely so its writer
escapes this (kernels/pool_write.py).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

L, B, S, KV, Dh, n = 16, 64, 1024, 8, 128, 32
W = 128
rng = np.random.default_rng(0)
ck = jnp.asarray(rng.integers(-127, 127, (L, B, S, KV, Dh)), jnp.int8)
cv = jnp.asarray(rng.integers(-127, 127, (L, B, S, KV, Dh)), jnp.int8)
cks = jnp.asarray(rng.random((L, B, S, KV)), jnp.float32)
cvs = jnp.asarray(rng.random((L, B, S, KV)), jnp.float32)
knew = jnp.asarray(rng.integers(-127, 127, (L, B, n, KV, Dh)), jnp.int8)
vnew = jnp.asarray(rng.integers(-127, 127, (L, B, n, KV, Dh)), jnp.int8)
ksnew = jnp.asarray(rng.random((L, B, n, KV)), jnp.float32)
vsnew = jnp.asarray(rng.random((L, B, n, KV)), jnp.float32)
seq_lens = jnp.asarray(rng.integers(0, S - n, B), jnp.int32)


def _window_write(cache_slab, new, write_pos):
    def upd(c, nn, p):
        return jax.lax.dynamic_update_slice(
            c, nn.astype(c.dtype), (p,) + (0,) * (c.ndim - 1))
    return jax.vmap(lambda c, nn, p: upd(c, nn, p))(cache_slab, new,
                                                    write_pos)


def merge_rowscatter(ck, cv, cks, cvs, knew, vnew, ksnew, vsnew, lens):
    def _merge(slabs, new):
        return jax.vmap(lambda s, nn: _window_write(s, nn, lens))(slabs, new)
    return (_merge(ck, knew), _merge(cv, vnew),
            _merge(cks, ksnew), _merge(cvs, vsnew))


def blockmerge_one(slab, new, lens):
    """slab (L, B, S, ...feat), new (L, B, n, ...feat): gather the two
    W-blocks covering [lens, lens+n), DUS-merge, scatter back."""
    Ld, Bd, Sd = slab.shape[:3]
    feat = slab.shape[3:]
    NBw = Sd // W
    x = slab.reshape(Ld, Bd, NBw, W, *feat)
    jA = jnp.clip(lens // W, 0, NBw - 2)                      # (B,)
    off2 = lens - jA * W                                      # [0, 2W)
    idx2 = jnp.stack([jA, jA + 1], axis=1)                    # (B, 2)
    ix = idx2.reshape(1, Bd, 2, *([1] * (len(feat) + 1)))
    g = jnp.take_along_axis(x, ix, axis=2)                    # (L,B,2,W,f)
    g2 = g.reshape(Ld, Bd, 2 * W, *feat)

    def per_b(gb, nb, ob):
        # gb (L, 2W, f), nb (L, n, f): same offset across L → one DUS
        start = (0, ob) + (0,) * len(feat)
        return jax.lax.dynamic_update_slice(gb, nb.astype(gb.dtype), start)
    merged = jax.vmap(per_b, in_axes=(1, 1, 0), out_axes=1)(g2, new, off2)
    m = merged.reshape(Ld, Bd, 2, W, *feat)
    bi = jnp.arange(Bd)[:, None]
    out = x.at[:, bi, idx2].set(m, mode='drop')
    return out.reshape(Ld, Bd, Sd, *feat)


def merge_block(ck, cv, cks, cvs, knew, vnew, ksnew, vsnew, lens):
    return (blockmerge_one(ck, knew, lens), blockmerge_one(cv, vnew, lens),
            blockmerge_one(cks, ksnew, lens),
            blockmerge_one(cvs, vsnew, lens))


def chain(fn, reps=8):
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def run(ck, cv, cks, cvs):
        def body(carry, _):
            a, b, c, d = carry
            a, b, c, d = fn(a, b, c, d, knew, vnew, ksnew, vsnew, seq_lens)
            return (a, b, c, d), ()
        (a, b, c, d), _ = jax.lax.scan(body, (ck, cv, cks, cvs), None,
                                       length=reps)
        return a, b, c, d
    return run, reps


def time_variant(name, fn):
    run, reps = chain(fn)
    slabs = (ck.copy(), cv.copy(), cks.copy(), cvs.copy())
    out = run(*slabs)
    np.asarray(out[0][0, 0, 0, 0])
    best = 1e9
    for _ in range(3):
        slabs = (ck.copy(), cv.copy(), cks.copy(), cvs.copy())
        t0 = time.perf_counter()
        out = run(*slabs)
        np.asarray(out[0][0, 0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f'{name:12s} {best / reps * 1e3:8.3f} ms per merge', flush=True)
    return out


# correctness first (tiny shapes would be better, but reuse the big ones)
a = merge_rowscatter(ck, cv, cks, cvs, knew, vnew, ksnew, vsnew, seq_lens)
b = merge_block(ck, cv, cks, cvs, knew, vnew, ksnew, vsnew, seq_lens)
for x, y in zip(a, b):
    assert np.array_equal(np.asarray(x), np.asarray(y)), 'MISMATCH'
print('parity OK', flush=True)

time_variant('rowscatter', merge_rowscatter)
time_variant('blockmerge', merge_block)
