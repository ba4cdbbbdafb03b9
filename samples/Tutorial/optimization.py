"""Tutorial 10 — The optimization pipeline
(reference: ppq/samples/Tutorial/optimization.py).

What the pipeline does pass by pass, and how to compose your own.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, dispatch_graph
from ppq_tpu import lib as PFL
from ppq_tpu.ir import format_graph
from ppq_tpu.quantization.optim import (LayerwiseEqualizationPass,
                                        ParameterBakingPass,
                                        ParameterQuantizePass,
                                        PassiveParameterQuantizePass,
                                        QuantAlignmentPass,
                                        QuantizationOptimizationPass,
                                        QuantizeFusionPass,
                                        QuantizeSimplifyPass,
                                        RuntimeCalibrationPass)
from ppq_tpu.zoo import tiny_cnn

graph = format_graph(tiny_cnn(input_shape=(2, 3, 32, 32)))
loader = [np.random.randn(2, 3, 32, 32).astype(np.float32) for _ in range(8)]

# prequant structural optimization operates on the fp32 graph
LayerwiseEqualizationPass(iterations=4).optimize(graph)

dispatch_graph(graph, TargetPlatform.TPU_INT8)
quantizer = PFL.Quantizer(TargetPlatform.TPU_INT8, graph)
executor = TPUExecutor(graph)
executor.tracing_operation_meta(loader[0])
for name, op in list(graph.operations.items()):
    if op.platform == quantizer.target_platform and \
            op.type in quantizer.quant_operation_types:
        quantizer.quantize_operation(name)
executor.load_graph(graph)


class PrintStatesPass(QuantizationOptimizationPass):
    """Custom pass: anything callable on (graph, dataloader, executor)."""

    def __init__(self):
        super().__init__('Print States Pass')

    def optimize(self, graph, dataloader=None, executor=None, **kwargs):
        from collections import Counter
        from ppq_tpu.ir import QuantableOperation
        states = Counter(c.state.name for op in graph.operations.values()
                         if isinstance(op, QuantableOperation)
                         for c in op.config)
        print('   TQC states:', dict(states))


PFL.Pipeline([
    QuantizeFusionPass(activation_type=quantizer.activation_fusion_types),
    QuantizeSimplifyPass(),
    ParameterQuantizePass(),
    RuntimeCalibrationPass(calib_steps=8),
    QuantAlignmentPass(),
    PassiveParameterQuantizePass(),
    PrintStatesPass(),
    ParameterBakingPass(),
    PrintStatesPass(),
]).optimize(graph, dataloader=loader, executor=executor)
