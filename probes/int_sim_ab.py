"""A/B: ResNet-18 INT8 simulation throughput — fp32 'highest' vs the
integer-exact 'int' lowering (bf16 MXU codes, fp32 accumulation)."""
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
stem_space_to_depth(graph)

K = 4


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


sel = sys.argv[1:] or ['highest', 'int']
for batch in (128, 256):
    x1 = rng.randn(batch, 3, 224, 224).astype(np.float32)
    xs = jax.device_put(np.broadcast_to(x1, (K,) + x1.shape).copy())
    for prec in sel:
        cg = compile_graph(graph, precision=prec)
        rc = cg.make_runner(chain=K)
        ips = measure(rc, xs, batch * K)
        print(f'{prec} b{batch} chain{K}: {ips:.0f} img/s '
              f'(mfu {mfu(flops_per_img, ips):.3f}) '
              f'lowered={len(cg.int_lowered)}', flush=True)
