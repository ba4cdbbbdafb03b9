"""Tutorial 5 — Scheduling / dispatching
(reference: ppq/samples/Tutorial/dispatch.py).

The scheduler decides per op: quantize, keep fp32, or mark as shape-or-index
(SOI, host domain). Manual overrides via the dispatching table.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

from ppq_tpu import TargetPlatform, dispatch_graph
from ppq_tpu import lib as PFL
from ppq_tpu.api import QuantizationSettingFactory
from ppq_tpu.ir import format_graph
from ppq_tpu.zoo import yolo_lite

graph = format_graph(yolo_lite(num_classes=20, in_size=64))

# automatic: conservative / aggressive / perseus / allin / pointwise
dispatch_graph(graph, TargetPlatform.TPU_INT8, dispatcher='conservative')
for name, op in list(graph.operations.items())[:10]:
    print(f'{name:30s} {op.type:16s} → {op.platform.name}')

# manual override: force one op to stay fp32
setting = QuantizationSettingFactory.default_setting()
some_conv = next(n for n, op in graph.operations.items()
                 if op.type == 'Conv')
setting.dispatching_table.append(some_conv, int(TargetPlatform.FP32))
dispatch_graph(graph, TargetPlatform.TPU_INT8, setting=setting)
assert graph.operations[some_conv].platform == TargetPlatform.FP32

# expert route: raw dispatcher object
table = PFL.Dispatcher(graph, 'perseus').dispatch(
    quant_platform=TargetPlatform.TPU_INT8)
print('perseus quantized',
      sum(1 for p in table.values() if p == TargetPlatform.TPU_INT8), 'ops')
