"""Profile one decode burst on chip; dump per-op-name time budget."""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params

paged = len(sys.argv) > 1 and sys.argv[1] == 'paged'
c = LlamaConfig(d_model=2048, n_layers=16, n_heads=16, n_kv_heads=8,
                d_ff=5632, vocab_size=32000, max_seq_len=1024, max_batch=128,
                weight_bits=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
c.prefill_buckets = (128,)
c.paged_kv = paged
eng = ServingEngine(c, init_llama_params(c, seed=0))
# warm up exactly like benchmark_decode does
d0 = eng.benchmark_decode(steps=32, burst=32)
print('warm decode:', d0, file=sys.stderr)

logdir = '/tmp/ppq_prof_decode'
import shutil
shutil.rmtree(logdir, ignore_errors=True)
with jax.profiler.trace(logdir):
    d1 = eng.benchmark_decode(steps=96, burst=32)
print('profiled decode:', d1, file=sys.stderr)

# parse the perfetto trace
paths = glob.glob(logdir + '/**/*.trace.json.gz', recursive=True)
assert paths, 'no trace written'
with gzip.open(sorted(paths)[-1], 'rt') as f:
    tr = json.load(f)
events = tr['traceEvents']
# find TPU device pid
pids = {}
for e in events:
    if e.get('ph') == 'M' and e.get('name') == 'process_name':
        pids[e['pid']] = e['args'].get('name', '')
tpu_pids = [p for p, n in pids.items() if 'TPU' in n and 'pid' not in n]
print('device pids:', {p: pids[p] for p in tpu_pids}, file=sys.stderr)
budget = defaultdict(float)
count = defaultdict(int)
total = 0.0
for e in events:
    if e.get('ph') == 'X' and e.get('pid') in tpu_pids:
        name = e['name']
        # strip trailing digits / dots for grouping
        base = name.split('.')[0].rstrip('0123456789-_')
        budget[base] += e.get('dur', 0) / 1e3
        count[base] += 1
        total += e.get('dur', 0) / 1e3
for k in sorted(budget, key=budget.get, reverse=True)[:25]:
    print(f'{budget[k]:10.2f} ms  x{count[k]:6d}  {k}')
print(f'{total:10.2f} ms  TOTAL device time')
