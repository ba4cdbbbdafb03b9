"""ppq_tpu — a TPU-native neural network quantization framework.

Capability-equivalent, ground-up redesign of OpenPPL/ppq for JAX/XLA/Pallas:
ONNX graphs in, scheduled/calibrated/optimized quantized graphs out —
simulated bit-accurately on TPU and exportable to deployment backends.
"""

__version__ = '0.1.0'

from .core import (DataType, QuantizationPolicy, QuantizationProperty,
                   QuantizationStates, QuantizationVisibility, RoundingPolicy,
                   TargetPlatform, TensorQuantizationConfig)
from .ir import BaseGraph, Operation, QuantableOperation, Variable
from .executor import TPUExecutor
from .api import (QuantizationSetting, QuantizationSettingFactory,
                  dispatch_graph, export, export_ppq_graph, load_graph,
                  load_native_graph, load_onnx_graph, manop, quantize,
                  quantize_graph, quantize_native_model, quantize_onnx_model)

__all__ = [
    '__version__',
    'DataType', 'QuantizationPolicy', 'QuantizationProperty',
    'QuantizationStates', 'QuantizationVisibility', 'RoundingPolicy',
    'TargetPlatform', 'TensorQuantizationConfig',
    'BaseGraph', 'Operation', 'QuantableOperation', 'Variable', 'TPUExecutor',
    'QuantizationSetting', 'QuantizationSettingFactory', 'dispatch_graph',
    'export_ppq_graph', 'load_graph', 'load_native_graph', 'load_onnx_graph',
    'manop', 'quantize', 'export', 'quantize_graph',
    'quantize_native_model', 'quantize_onnx_model',
]
