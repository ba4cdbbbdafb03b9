"""Device-time A/B of int4 unpack variants (immune to axon-tunnel host
noise: per-variant cost = total TPU device time of a profiled 256-step
chain / 256, with the trivial carry-add measured the same way and
subtracted). See int4_unpack_r4.py for the variant definitions/algebra.

python probes/int4_prof.py [B] [D] [F]
"""
import glob
import gzip
import json
import shutil
import sys

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
import jax.numpy as jnp

sys.argv = sys.argv[:1] + sys.argv[1:4]
import probes.int4_unpack_r4 as V   # noqa: E402  (defines kernels + data)

ITERS = 256


def device_ms(fn):
    logdir = '/tmp/ppq_prof_int4'
    fn()                      # warm
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        fn()
    paths = glob.glob(logdir + '/**/*.trace.json.gz', recursive=True)
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        tr = json.load(f)
    events = tr['traceEvents']
    pids, tids = {}, {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pids[e['pid']] = e['args'].get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tids[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
    # the 'XLA Modules' row is device wall time for the whole executable;
    # per-op rows overlap (async DMA) and would overcount
    return sum(e.get('dur', 0) / 1e3 for e in events
               if e.get('ph') == 'X'
               and 'TPU' in pids.get(e.get('pid'), '')
               and tids.get((e.get('pid'), e.get('tid'))) == 'XLA Modules')


def chain(fn, w):
    def body(c, _):
        y = fn(c, w, V.scale)
        return c + (y[:, :1] * 1e-9).astype(c.dtype), ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
    return lambda: np.asarray(f(V.x))


def base_chain():
    def body(c, _):
        return c + (c[:, :1] * 1e-9).astype(c.dtype), ()
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=ITERS)[0])
    return lambda: np.asarray(f(V.x))


base = device_ms(base_chain()) / ITERS * 1e3
floor8 = V.D * V.F / 819e9 * 1e6
print(f'B={V.B} D={V.D} F={V.F}  base {base:.2f}us/it  '
      f'819GB/s floors int8/int4 {floor8:.1f}/{floor8/2:.1f}us')
for name, fn, w in [('int8', V.qmm_int8, V.w8j),
                    ('int4_i32', V.qmm_int4, V.w4),
                    ('bias5x', V.qmm4_bias5x, V.w4s),
                    ('fused3x', V.qmm4_fused3x, V.w4s),
                    ('exact3x', V.qmm4_exact3x, V.w4s)]:
    t = device_ms(chain(fn, w)) / ITERS * 1e3 - base
    print(f'{name:9s} {t:7.1f}us')
