"""Tutorial 11 — Best practice recipe
(reference: ppq/samples/Tutorial/bestPractice.py).

The accuracy ladder, cheapest first. Climb only while the error analysis
says you need to.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import (TargetPlatform, TPUExecutor,
                     QuantizationSettingFactory, quantize_graph)
from ppq_tpu.quantization.analyse import graphwise_error_analyse
from ppq_tpu.quantization.measure import torch_snr_error
from ppq_tpu.zoo import tiny_cnn

loader = [np.random.RandomState(i).randn(2, 3, 32, 32).astype(np.float32)
          for i in range(16)]
ref = np.asarray(TPUExecutor(
    tiny_cnn(input_shape=(2, 3, 32, 32))).forward(loader[0])[0])


def run(label, setting):
    graph = tiny_cnn(input_shape=(2, 3, 32, 32))
    quantize_graph(graph, loader, calib_steps=16,
                   platform=TargetPlatform.TPU_INT8, setting=setting,
                   verbose=False)
    out = np.asarray(TPUExecutor(graph).forward(loader[0])[0])
    snr = float(torch_snr_error(out.reshape(1, -1), ref.reshape(1, -1)))
    print(f'{label:<40s} SNR {snr:.6f}')
    return graph


# rung 1: plain PTQ, percentile calibration (the default)
s = QuantizationSettingFactory.default_setting()
graph = run('1. plain PTQ', s)

# rung 2: better calibration (kl/mse) when rung 1 disappoints
s = QuantizationSettingFactory.default_setting()
s.calibration.calib_algorithm = 'mse'
run('2. + mse calibration', s)

# rung 3: structural help — equalization + bias correction
s = QuantizationSettingFactory.default_setting()
s.equalization = True
s.bias_correct = True
run('3. + equalization + bias correction', s)

# rung 4: training-based recovery (LSQ) — most accurate, most compute
s = QuantizationSettingFactory.default_setting()
s.lsq_optimization = True
s.lsq_optimization_setting.steps = 60
run('4. + LSQ finetune', s)

# diagnose where the error lives before climbing further
graphwise_error_analyse(graph, loader, steps=4)
