"""Profile ResNet-18 deploy-mode (bf16) compiled path; per-op time budget."""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.executor import compile_graph
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
run = compile_graph(graph, precision='bf16').make_runner()

batch = 256
x = jax.device_put(rng.randn(batch, 3, 224, 224).astype(np.float32))
np.asarray(run(x)[0])
import time
t0 = time.perf_counter()
for _ in range(20):
    out = run(x)[0]
np.asarray(out)
ips = batch * 20 / (time.perf_counter() - t0)
print(f'warm: {ips:.0f} img/s mfu={mfu(flops_per_img, ips):.3f}',
      file=sys.stderr)

logdir = '/tmp/ppq_prof_resnet'
import shutil
shutil.rmtree(logdir, ignore_errors=True)
with jax.profiler.trace(logdir):
    for _ in range(10):
        out = run(x)[0]
    np.asarray(out)

paths = glob.glob(logdir + '/**/*.trace.json.gz', recursive=True)
with gzip.open(sorted(paths)[-1], 'rt') as f:
    tr = json.load(f)
events = tr['traceEvents']
pids = {}
for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
        pids[e['pid']] = e['args'].get('name', '')
tpu_pids = [p for p, n in pids.items() if 'TPU' in n]
budget = defaultdict(float)
count = defaultdict(int)
for e in events:
    if e.get('ph') == 'X' and e.get('pid') in tpu_pids:
        base = e['name'].split('.')[0].rstrip('0123456789-_')
        budget[base] += e.get('dur', 0) / 1e3
        count[base] += 1
tot = sum(budget.values())
for k in sorted(budget, key=budget.get, reverse=True)[:22]:
    print(f'{budget[k]:9.2f} ms  x{count[k]:5d}  {k}')
print(f'{tot:9.2f} ms total (10 iters of batch {batch})')
