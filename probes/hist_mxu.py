"""Histogram strategies for calibration on TPU (round-5 verdict #7).

The equality one-hot reduction (compile.py _device_histogram) is
O(N*bins) VPU compare-ops — 0.9 s/batch for resnet18/B=32 calibration
(~64M activation elements x 2048 bins). Factorizing bins = HI x LO and
computing hist = onehot(hi)^T @ onehot(lo) moves the O(N*bins) work
onto the MXU as bf16 MACs with exact f32 accumulation (counts < 2^24).

Measured (TPU v5e, N=25.7M, bins=2048, device time):
  eq-onehot scan   : 340.9 ms
  mxu 64x32 factor :   3.1 ms   (110x)
Correctness: bit-identical counts vs np.bincount.
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np


def hist_eq(idx, bins):
    CH = 8192
    n = idx.shape[0]
    pad = (-n) % CH
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, idx.dtype)])
    chunks = idx.reshape(-1, CH)
    bin_ids = jnp.arange(bins, dtype=idx.dtype)

    def body(acc, chunk):
        return acc + jnp.sum(
            (chunk[:, None] == bin_ids[None, :]).astype(jnp.int32),
            axis=0), None

    counts, _ = jax.lax.scan(body, jnp.zeros((bins,), jnp.int32), chunks)
    return counts


def hist_mxu(idx, bins, HI=64):
    LO = bins // HI
    CH = 1 << 16
    n = idx.shape[0]
    pad = (-n) % CH
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, idx.dtype)])
    chunks = idx.reshape(-1, CH)
    hi_ids = jnp.arange(HI, dtype=idx.dtype)
    lo_ids = jnp.arange(LO, dtype=idx.dtype)

    def body(acc, chunk):
        hi = chunk // LO          # pad (-1) // LO == -1 -> matches no bin
        lo = chunk - hi * LO
        A = (hi[:, None] == hi_ids[None, :]).astype(jnp.bfloat16)
        B = (lo[:, None] == lo_ids[None, :]).astype(jnp.bfloat16)
        return acc + jax.lax.dot(
            A.T, B, preferred_element_type=jnp.float32), None

    counts, _ = jax.lax.scan(body, jnp.zeros((HI, LO), jnp.float32), chunks)
    return counts.reshape(bins).astype(jnp.int32)


if __name__ == '__main__':
    N = 32 * 64 * 112 * 112
    bins = 2048
    rng = np.random.RandomState(0)
    idx_np = rng.randint(0, bins, size=N).astype(np.int32)
    idx = jnp.asarray(idx_np)
    gold = np.bincount(idx_np, minlength=bins)

    for name, f in [('eq-onehot', hist_eq), ('mxu64x32', hist_mxu)]:
        jf = jax.jit(f, static_argnums=1)
        out = np.asarray(jf(idx, bins))
        assert np.array_equal(out, gold), f'{name} wrong'
        t0 = time.perf_counter()
        for _ in range(5):
            jf(idx, bins).block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f'{name}: {dt*1e3:.1f} ms exact=True', flush=True)
