"""A/B: lm_head qmm panel width. F=32000 only tiles at TF<=256 (32000 =
2^8 * 125), so the call runs 125 grid steps; padding the vocab to 32768
unlocks TF=1024/2048. Measures per-call time at decode batch sizes.
Chained, fetch-terminated, baseline-subtracted."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import ppq_tpu.kernels.qmm as qmm

B, D = 64, 2048
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)


def mk(F):
    w = jnp.asarray(rng.integers(-127, 127, (D, F)), jnp.int8)
    s = jnp.asarray(rng.random(F) * 0.01, jnp.float32)
    return w, s


def qmm_tf(x, w, s, TF):
    F = w.shape[1]
    return pl.pallas_call(
        qmm._qmm8_kernel, grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TF), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F, bytes_accessed=D * F + 2 * B * (D + F),
            transcendentals=0),
    )(x, w, s.reshape(1, F))


def chain(fn, iters=60):
    def body(c, _):
        y = fn(c)
        return c + (y[:, :1] * 1e-9).astype(c.dtype), ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
    np.asarray(f(x))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


base = chain(lambda c: c * 1.0 + 0)
for F, TF in ((32000, 128), (32000, 256), (32768, 1024), (32768, 2048),
              (32768, 4096)):
    if D * TF > 16 * 1024 * 1024:
        continue
    w, s = mk(F)
    t = chain(functools.partial(qmm_tf, w=w, s=s, TF=TF)) - base
    floor = D * F / 819e9
    print(f'F={F} TF={TF:5d} grid={F//TF:4d}: {t*1e6:7.1f}us '
          f'(floor {floor*1e6:.1f}us)', flush=True)
