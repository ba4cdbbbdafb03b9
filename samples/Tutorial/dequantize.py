"""Tutorial 9 — Dequantize / requantize
(reference: ppq/samples/Tutorial/dequantize.py).

Any quantized graph can be temporarily disabled (per-op or graph-wide) —
the mechanism behind error analysis and finetuning reference outputs.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.ir import dequantize_graph, restore_graph_quantization
from ppq_tpu.zoo import tiny_cnn

graph = tiny_cnn(input_shape=(1, 3, 32, 32))
loader = [np.random.randn(1, 3, 32, 32).astype(np.float32) for _ in range(8)]
quantize_graph(graph, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)
ex = TPUExecutor(graph)
x = loader[0]

q_out = np.asarray(ex.forward(x)[0])

dequantize_graph(graph)                 # graph now runs pure fp32
fp_out = np.asarray(ex.forward(x)[0])

restore_graph_quantization(graph)       # quantization back on
q_out2 = np.asarray(ex.forward(x)[0])

print('quant vs fp32 max diff:', float(np.abs(q_out - fp_out).max()))
print('restore is exact      :', bool(np.array_equal(q_out, q_out2)))
