"""Tutorial 2 — Executors (reference: ppq/samples/Tutorial/execute.py).

Two execution modes: the eager per-op interpreter (debuggable, handles
data-dependent ops) and the whole-graph compiled executor (one XLA program —
the fast path for calibration sweeps and serving).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import time

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.zoo import tiny_cnn

graph = tiny_cnn(input_shape=(8, 3, 32, 32))
loader = [np.random.randn(8, 3, 32, 32).astype(np.float32) for _ in range(8)]
quantize_graph(graph, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)

# eager interpreter — per-op dispatch, hooks, partial execution
executor = TPUExecutor(graph)
eager_out = executor.forward(loader[0])[0]

# compiled — whole graph traced into one jitted XLA program
run = compile_graph(graph).make_runner()
compiled_out = run(loader[0])[0]

print('max |eager - compiled| =',
      float(np.abs(np.asarray(eager_out) - np.asarray(compiled_out)).max()))

for name, fn in [('eager', lambda: executor.forward(loader[0])),
                 ('compiled', lambda: run(loader[0]))]:
    fn()
    t0 = time.perf_counter()
    for _ in range(10):
        fn()
    print(f'{name:>9s}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms/batch')
