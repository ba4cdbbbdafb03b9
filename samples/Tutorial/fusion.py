"""Tutorial 7 — Graph fusion and quantization fusion
(reference: ppq/samples/Tutorial/fusion.py).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.core import QuantizationStates
from ppq_tpu.ir import QuantableOperation, format_graph, fuse_selfattention
from ppq_tpu.zoo import bert_encoder, tiny_cnn

# --- structural fusions (run during format_graph): BN folding etc. --------
graph = tiny_cnn(input_shape=(1, 3, 32, 32))
print('before format:', sorted({op.type for op in graph.operations.values()}))
format_graph(graph)      # folds BN into Conv, splices Identity, ...
print('after format: ', sorted({op.type for op in graph.operations.values()}))

# --- attention fusion on a transformer ------------------------------------
bert = bert_encoder(seq_len=16, d_model=64, n_heads=2, n_layers=1, d_ff=128)
n = fuse_selfattention(bert)
print(f'fused {n} self-attention blocks into Attention ops')

# --- quantization fusion: conv+relu share one quant site ------------------
graph = tiny_cnn(input_shape=(1, 3, 32, 32))
loader = [np.random.randn(1, 3, 32, 32).astype(np.float32)
          for _ in range(8)]
quantize_graph(graph, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)
for op in graph.operations.values():
    if isinstance(op, QuantableOperation) and op.type == 'Conv':
        state = op.config.output_quantization_config[0].state
        if state == QuantizationStates.OVERLAPPED:
            print(f'{op.name}: output quant OVERLAPPED '
                  f'(fused into the following activation)')
