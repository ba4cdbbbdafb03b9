"""Tutorial 14 — Dynamic (batch-agnostic) shapes (reference:
ppq/samples/dynamic_shape.py).

ONNX graphs built with 0-copy Reshape dims (0 = "copy from input",
-1 = "infer") stay batch-agnostic through quantization: calibrate at one
batch size, run at any other. The compiled executor re-jits per shape
(XLA programs are static-shape) and caches each program — so serve a
small set of bucketed shapes, exactly like the serving engine's prefill
buckets.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.zoo import bert_encoder

# bert_encoder is built batch-agnostic (Reshape dims use 0-copy)
graph = bert_encoder(seq_len=16, d_model=64, n_heads=2, n_layers=2,
                     d_ff=128)
calib = [np.random.randn(4, 16, 64).astype(np.float32) for _ in range(8)]
quantize_graph(graph, calib, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)

executor = TPUExecutor(graph)
for batch in (1, 4, 7):
    x = np.random.randn(batch, 16, 64).astype(np.float32)
    out = np.asarray(executor.forward(x)[0])
    print(f'eager   batch={batch}: out {out.shape}')

cg = compile_graph(graph)
run = cg.make_runner()
for batch in (1, 4, 7):
    x = np.random.randn(batch, 16, 64).astype(np.float32)
    out = np.asarray(run(x)[0])
    print(f'compiled batch={batch}: out {out.shape}')
