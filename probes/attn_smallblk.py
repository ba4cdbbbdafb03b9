"""Grouped decode-attention at read-block sizes below 128.

At shallow fills the kernel reads a full RBLK=128 rows per slot while
only `fill` (16-48 during the first bursts) are live — an up-to-8x DMA
over-read on the decode hot path (1.21 ms/step of attention at the
1B/B=128 config, ~41 us/call of it pure DMA at RBLK=128). If Mosaic
accepts BLK=32/64 (the kv pool keeps s8 sublane tiling at 32; the scale
pool puts BLK on the LANE dim, which is where sub-128 slices were
rejected before), a fill-bucketed repack cap cuts the read 2-4x.

Times paged_attention_decode_grouped at BLK in {32, 64, 128} with
cap=BLK (one block per slot), fill=16, layered pool, and checks the
result against BLK=128.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from ppq_tpu.kernels.paged_attention import (blockmajor_window,
                                             grouped_group_size,
                                             paged_attention_decode_grouped)

L, B, KV, rep, Dh = 4, 128, 8, 2, 128
S, fill = 1024, 16
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, KV, rep, Dh), jnp.bfloat16)
ck = jnp.asarray(rng.randint(-127, 127, (L, B, S, KV, Dh)), jnp.int8)
cv = jnp.asarray(rng.randint(-127, 127, (L, B, S, KV, Dh)), jnp.int8)
cks = jnp.asarray(rng.rand(L, B, S, KV) * 0.01 + 0.001, jnp.float32)
cvs = jnp.asarray(rng.rand(L, B, S, KV) * 0.01 + 0.001, jnp.float32)
seq_lens = jnp.full((B,), fill, jnp.int32)

ref = None
for BLK in (128, 64, 32):
    cap = BLK
    try:
        kv_bm, sc_bm = blockmajor_window(ck, cv, cks, cvs, cap, BLK)
        G = grouped_group_size(B, BLK, KV * Dh, 1)
        fn = lambda li: paged_attention_decode_grouped(
            q, kv_bm, sc_bm, seq_lens, layer=li,
            block_size=BLK, group=G)
        acc, m, l = fn(2)
        np.asarray(acc)
        t0 = time.perf_counter()
        reps = 200
        for i in range(reps):
            acc, m, l = fn(2)
        np.asarray(acc)
        dt = (time.perf_counter() - t0) / reps
        out = np.asarray(acc / l[..., None])
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref)))
        print(f'BLK={BLK:4d} G={G:3d}: {dt * 1e6:8.1f} us/call  '
              f'max|d|={err:.2e}', flush=True)
    except Exception as e:
        print(f'BLK={BLK:4d}: FAILED {type(e).__name__}: '
              f'{str(e)[:200]}', flush=True)
