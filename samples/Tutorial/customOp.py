"""Tutorial 12 — Custom operators (reference: ppq/samples/bypass_nms.py,
custimized_quant.py).

Two situations:
  1. Your graph ends in an op the executor doesn't know (say a vendor NMS
     decoder). Register a forward for it with register_operation_handler
     and the quantization pipeline runs through unchanged — if the op
     sits past every quantable tensor, even a shape-correct FAKE forward
     is enough (PPQ's bypass_nms trick).
  2. The custom op participates in real dataflow: then the handler must
     compute real values (it gets (op, input_values, ctx) and returns
     the outputs).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.executor import register_operation_handler
from ppq_tpu.zoo import NetBuilder

# --- a net that ends in a made-up vendor op -------------------------------
b = NetBuilder('with_custom_tail', seed=0)
x = b.input('input', (1, 3, 32, 32))
y = b.relu(b.bn(b.conv(x, 3, 16, 3), 16))
y = b.flatten(b.gap(y))
y = b.gemm(y, 16, 10)
y = b.op('MyVendorDecode', [y], top_k=5)      # unknown to the executor
b.output(y)
graph = b.g


# --- 1. register a forward ------------------------------------------------
def my_vendor_decode(op, values, ctx=None):
    """Real semantics: take the top_k class scores, descending."""
    import jax.numpy as jnp
    logits = jnp.asarray(values[0])
    k = int(op.attributes.get('top_k', 5))
    return jnp.sort(logits, axis=-1)[..., ::-1][..., :k]


register_operation_handler(my_vendor_decode, 'MyVendorDecode',
                           TargetPlatform.FP32)
register_operation_handler(my_vendor_decode, 'MyVendorDecode',
                           TargetPlatform.UNSPECIFIED)

# --- 2. quantize as usual ---------------------------------------------------
loader = [np.random.randn(1, 3, 32, 32).astype(np.float32)
          for _ in range(8)]
quantize_graph(graph, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)

out = np.asarray(TPUExecutor(graph).forward(loader[0])[0])
print('custom-tail output shape:', out.shape)
assert out.shape == (1, 5)
# the custom op stayed un-quantized (dispatched off the quant region)
op = graph.operations[[n for n in graph.operations
                       if 'myvendordecode' in n.lower()][0]]
print('custom op platform:', op.platform.name)
