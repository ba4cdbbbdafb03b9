"""A/B: ResNet-18 deploy throughput with stem-s2d and chained dispatch."""
import sys
import time

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.ir.morph import stem_space_to_depth
from ppq_tpu.utils.flops import graph_flops, mfu
from ppq_tpu.zoo.vision import resnet18

calib_batch = 32
graph = resnet18(input_shape=[calib_batch, 3, 224, 224])
rng = np.random.RandomState(0)
loader = [rng.randn(calib_batch, 3, 224, 224).astype(np.float32)
          for _ in range(4)]
quantize_graph(graph, loader, calib_steps=4,
               platform=TargetPlatform.TPU_INT8, verbose=False)
flops_per_img = graph_flops(graph) / calib_batch

batch = 256
x = jax.device_put(rng.randn(batch, 3, 224, 224).astype(np.float32))
K = 8
xs = jax.device_put(np.broadcast_to(
    np.asarray(x), (K,) + x.shape).copy())


def measure(run, inp, imgs, iters=10):
    out = run(inp)[0]
    np.asarray(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(inp)[0]
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return imgs * iters / best


for tag in ('base', 's2d'):
    if tag == 's2d':
        n = stem_space_to_depth(graph)
        print('rewrote', n, 'stem convs', file=sys.stderr)
    cg = compile_graph(graph, precision='bf16')
    r1 = cg.make_runner()
    rc = cg.make_runner(chain=K)
    ips1 = measure(r1, x, batch)
    ipsc = measure(rc, xs, batch * K)
    print(f'{tag}: chain1 {ips1:.0f} img/s (mfu {mfu(flops_per_img, ips1):.3f})'
          f'  chain{K} {ipsc:.0f} img/s (mfu {mfu(flops_per_img, ipsc):.3f})',
          flush=True)
