"""Device-time A/B for the stem: trace 10 iters each, compare the stem fusion."""
import glob, gzip, json, shutil, sys
from collections import defaultdict
import jax
import numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.ir.morph import stem_space_to_depth
from ppq_tpu.zoo.vision import resnet18

graph = resnet18(input_shape=[32, 3, 224, 224])
rng = np.random.RandomState(0)
loader = [rng.randn(32, 3, 224, 224).astype(np.float32) for _ in range(4)]
quantize_graph(graph, loader, calib_steps=4,
               platform=TargetPlatform.TPU_INT8, verbose=False)
x = jax.device_put(rng.randn(256, 3, 224, 224).astype(np.float32))

def device_ms(run):
    np.asarray(run(x)[0])
    logdir = '/tmp/ppq_prof_s2d'
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(10):
            out = run(x)[0]
        np.asarray(out)
    paths = glob.glob(logdir + '/**/*.trace.json.gz', recursive=True)
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        tr = json.load(f)
    ev = tr['traceEvents']
    pids = {e['pid']: e['args'].get('name','') for e in ev
            if e.get('ph')=='M' and e.get('name')=='process_name'}
    tpu = [p for p,n in pids.items() if 'TPU' in n]
    tot = sum(e.get('dur',0)/1e3 for e in ev
              if e.get('ph')=='X' and e.get('pid') in tpu
              and e['name'].startswith('jit_'))
    return tot/10

r = compile_graph(graph, precision='bf16').make_runner()
print('base device ms/iter:', device_ms(r), flush=True)
stem_space_to_depth(graph)
r = compile_graph(graph, precision='bf16').make_runner()
print('s2d  device ms/iter:', device_ms(r), flush=True)
