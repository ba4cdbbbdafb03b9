"""Tutorial 8 — Target platforms and export flavors
(reference: ppq/samples/Tutorial/targetPlatform.py).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, export_ppq_graph, quantize_graph
from ppq_tpu.quantization.quantizer import QUANTIZER_COLLECTION
from ppq_tpu.zoo import tiny_cnn

print('registered platforms:')
for platform, quantizer in QUANTIZER_COLLECTION.items():
    print(f'  {platform.name:<24s} → {quantizer.__name__}')

loader = [np.random.randn(1, 3, 32, 32).astype(np.float32) for _ in range(8)]

for platform in (TargetPlatform.TPU_INT8, TargetPlatform.TPU_FP8,
                 TargetPlatform.NCNN_INT8):
    graph = tiny_cnn(input_shape=(1, 3, 32, 32))
    quantize_graph(graph, loader, calib_steps=8, platform=platform,
                   verbose=False)
    out = f'/tmp/model_{platform.name.lower()}'
    export_ppq_graph(graph, platform, out + '.onnx', out + '_cfg.json')
    print(f'{platform.name}: exported {out}.onnx')
