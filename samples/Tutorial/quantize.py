"""Tutorial 1 — Quantize a model (reference: ppq/samples/Tutorial/quantize.py).

The one-call PTQ flow: graph in, INT8-simulating graph out.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import (TargetPlatform, TPUExecutor, export_ppq_graph,
                     QuantizationSettingFactory, quantize_graph)
from ppq_tpu.zoo import resnet18

# 1. a model — normally: graph = ppq_tpu.load_onnx_graph('model.onnx')
graph = resnet18(input_shape=[1, 3, 224, 224])

# 2. a calibration dataloader: any iterable of batches
loader = [np.random.randn(1, 3, 224, 224).astype(np.float32)
          for _ in range(32)]

# 3. a setting — presets per target, every knob overridable
setting = QuantizationSettingFactory.tpu_setting()
setting.dispatcher = 'conservative'

# 4. quantize
quantize_graph(graph, loader, calib_steps=32,
               platform=TargetPlatform.TPU_INT8, setting=setting)

# 5. simulate int8 inference & export a deployable QDQ onnx
executor = TPUExecutor(graph)
out = executor.forward(loader[0])[0]
print('int8-simulated output:', np.asarray(out).shape)

import tempfile
outdir = tempfile.mkdtemp(prefix='ppq_tpu_tutorial_')
export_ppq_graph(graph, TargetPlatform.TPU_INT8,
                 _os.path.join(outdir, 'quantized.onnx'),
                 _os.path.join(outdir, 'quantized_cfg.json'))
print('exported to', outdir)
