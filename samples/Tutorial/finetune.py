"""Tutorial 4 — Training-based optimization
(reference: ppq/samples/Tutorial/finetune.py).

LSQ / AdaRound / bias correction recover accuracy lost to quantization by
training against the fp32 reference, blockwise.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, QuantizationSettingFactory, quantize_graph
from ppq_tpu.api import manop
from ppq_tpu.quantization.optim import (AdaroundPass, BiasCorrectionPass,
                                        LearnedStepSizePass)
from ppq_tpu.zoo import tiny_cnn

graph = tiny_cnn(input_shape=(4, 3, 32, 32))
loader = [np.random.randn(4, 3, 32, 32).astype(np.float32) for _ in range(8)]

# Option A — via setting flags (passes run inside quantize()):
setting = QuantizationSettingFactory.default_setting()
setting.lsq_optimization = True
setting.lsq_optimization_setting.steps = 100
setting.lsq_optimization_setting.lr = 1e-5
setting.bias_correct = True
quantize_graph(graph, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, setting=setting)

# Option B — manual pass application on an already-quantized graph:
graph2 = tiny_cnn(input_shape=(4, 3, 32, 32))
quantize_graph(graph2, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)
manop(graph2, [
    BiasCorrectionPass(steps=8),
    LearnedStepSizePass(block_size=4, steps=100, lr=1e-5),
    AdaroundPass(block_size=4, steps=200),
], calib_dataloader=loader)
