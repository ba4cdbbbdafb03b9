"""Tutorial 3 — Error analysis (reference: ppq/samples/Tutorial/analyse.py).

Find which layers hurt: cumulative (graphwise) and isolated (layerwise)
quantization error reports.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.quantization.analyse import (graphwise_error_analyse,
                                          layerwise_error_analyse,
                                          statistical_analyse)
from ppq_tpu.zoo import resnet18

# 64x64 keeps the per-op isolation loop snappy (layerwise analysis
# re-runs the network once per quantable op); use your real input size
# for real reports
graph = resnet18(input_shape=[1, 3, 64, 64])
loader = [np.random.randn(1, 3, 64, 64).astype(np.float32)
          for _ in range(8)]
quantize_graph(graph, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)

# cumulative error — how much each op's output deviates in the full
# quantized network (errors accumulate downstream)
graphwise = graphwise_error_analyse(graph, loader, steps=4, method='snr')

# isolated error — quantize one op at a time; large values = problem
# layers. Scope it to the most-suspect ops from the cumulative report:
# every isolated configuration compiles its own program, so analysing
# all ~30 ops of a resnet takes minutes on a remote accelerator
# graphwise keys are output VARIABLE names; map them to their ops
suspects = [graph.variables[name].source_op.name
            for name, _ in
            sorted(graphwise.items(), key=lambda kv: -kv[1])[:6]]
layerwise = layerwise_error_analyse(graph, loader, steps=4, method='snr',
                                    interested_ops=suspects)
worst = sorted(layerwise.items(), key=lambda kv: -kv[1])[:5]
print('worst layers:', worst)

# raw statistics records (pandas-ready)
records = statistical_analyse(graph, loader, steps=4)
print(f'{len(records)} statistics records collected')
