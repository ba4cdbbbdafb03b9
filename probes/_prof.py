"""Shared probe helper: run a callable under jax.profiler and print the
per-op-name device-time budget (the technique from profile_decode)."""
import glob
import gzip
import json
import shutil
from collections import defaultdict

import jax
import numpy as np


def device_budget(fn, iters=8, top=20, logdir='/tmp/ppq_probe_prof'):
    np.asarray(fn())
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        r = None
        for _ in range(iters):
            r = fn()
        np.asarray(r)
    paths = glob.glob(logdir + '/**/*.trace.json.gz', recursive=True)
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        tr = json.load(f)
    ev = tr['traceEvents']
    pids = {}
    for e in ev:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pids[e['pid']] = e['args'].get('name', '')
    tpu = [p for p, n in pids.items() if 'TPU' in n]
    bud = defaultdict(float)
    cnt = defaultdict(int)
    long = {}
    for e in ev:
        if e.get('ph') == 'X' and e.get('pid') in tpu:
            base = e['name'].split('.')[0].rstrip('0123456789-_')
            bud[base] += e.get('dur', 0) / 1e3
            cnt[base] += 1
            ln = (e.get('args') or {}).get('long_name')
            if ln and base not in long:
                long[base] = ln[:140]
    for k in sorted(bud, key=bud.get, reverse=True)[:top]:
        print(f'{bud[k] / iters:9.3f} ms x{cnt[k] // iters:6d}  {k}')
        if k in long:
            print(f'           {long[k]}')
    return bud, cnt
