"""Tutorial 6 — Calibration algorithms
(reference: ppq/samples/Tutorial/calibration.py).

Comparing minmax / percentile / kl / mse / isotone on the same model.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import (TargetPlatform, TPUExecutor,
                     QuantizationSettingFactory, quantize_graph)
from ppq_tpu.quantization.measure import torch_snr_error
from ppq_tpu.zoo import tiny_cnn

loader = [np.random.RandomState(i).randn(4, 3, 32, 32).astype(np.float32)
          for i in range(16)]
ref = np.asarray(TPUExecutor(
    tiny_cnn(input_shape=(4, 3, 32, 32))).forward(loader[0])[0])

for algo in ('minmax', 'percentile', 'kl', 'mse'):
    setting = QuantizationSettingFactory.default_setting()
    setting.calibration.calib_algorithm = algo
    graph = tiny_cnn(input_shape=(4, 3, 32, 32))
    quantize_graph(graph, loader, calib_steps=16,
                   platform=TargetPlatform.TPU_INT8, setting=setting,
                   verbose=False)
    out = np.asarray(TPUExecutor(graph).forward(loader[0])[0])
    snr = float(torch_snr_error(out.reshape(1, -1), ref.reshape(1, -1)))
    print(f'{algo:>10s}: output SNR {snr:.6f}')

# per-tensor manual override: any TQC can pin its own observer
setting = QuantizationSettingFactory.default_setting()
setting.calibration.isotone = True        # order-preserving for classifiers
print('isotone calibration enabled for decision layers')
