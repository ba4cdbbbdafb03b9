"""ProgramEntrance 2 — the manual PFL API (reference: ProgramEntrance_2.py).

Full control: dispatch, per-op quantizer config, hand-built pass pipeline.
"""

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, dispatch_graph
from ppq_tpu import lib as PFL
from ppq_tpu.ir import format_graph
from ppq_tpu.quantization.optim import (ParameterBakingPass,
                                        ParameterQuantizePass,
                                        PassiveParameterQuantizePass,
                                        QuantAlignmentPass,
                                        QuantizeFusionPass,
                                        QuantizeSimplifyPass,
                                        RuntimeCalibrationPass)
from ppq_tpu.zoo import resnet18

BATCHES = 16
graph = resnet18(input_shape=[1, 3, 224, 224])
loader = [np.random.randn(1, 3, 224, 224).astype(np.float32)
          for _ in range(BATCHES)]

# 1. normalize + dispatch
format_graph(graph)
dispatch_graph(graph, TargetPlatform.TPU_INT8, dispatcher='conservative')

# 2. wrap ops with quantization configs via the platform quantizer
quantizer = PFL.Quantizer(TargetPlatform.TPU_INT8, graph)
executor = TPUExecutor(graph)
executor.tracing_operation_meta(loader[0])
for name, op in list(graph.operations.items()):
    if op.platform == quantizer.target_platform and \
            op.type in quantizer.quant_operation_types:
        quantizer.quantize_operation(name)
executor.load_graph(graph)

# 3. hand-built pipeline (the canonical PTQ order)
pipeline = PFL.Pipeline([
    QuantizeFusionPass(activation_type=quantizer.activation_fusion_types),
    QuantizeSimplifyPass(),
    ParameterQuantizePass(),
    RuntimeCalibrationPass(method='percentile', calib_steps=BATCHES),
    QuantAlignmentPass(),
    PassiveParameterQuantizePass(),
    ParameterBakingPass(),
])
pipeline.optimize(graph, dataloader=loader, executor=executor)

print('quantized. simulated output:',
      np.asarray(executor.forward(loader[0])[0]).shape)
