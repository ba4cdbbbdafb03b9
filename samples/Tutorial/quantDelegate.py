"""Tutorial 13 — Custom quantization functions (reference:
ppq/samples/custimize_quant_func.py).

The eager executor routes every fake-quant through per-TQC DELEGATES:
register one against a TensorQuantizationConfig and your function runs
instead of the built-in `ppq_fake_quant` for exactly that tensor. This is
the hook the LSQ pass uses to train scales — here we use it to (a) watch
a tensor quantize, (b) swap in a deliberately coarser quantizer and see
the error move.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.quantization.qfunction import ppq_fake_quant
from ppq_tpu.zoo import tiny_cnn

graph = tiny_cnn(input_shape=(1, 3, 32, 32))
loader = [np.random.randn(1, 3, 32, 32).astype(np.float32)
          for _ in range(8)]
quantize_graph(graph, loader, calib_steps=8,
               platform=TargetPlatform.TPU_INT8, verbose=False)

executor = TPUExecutor(graph)
ref = np.asarray(executor.forward(loader[0])[0])

# pick the first conv's input activation TQC
conv = next(op for op in graph.topological_sort() if op.type == 'Conv')
cfg = conv.config.input_quantization_config[0]


class WatchingDelegate:
    """Pass-through that counts invocations (a debugging probe)."""

    def __init__(self):
        self.calls = 0

    def __call__(self, tensor, config):
        self.calls += 1
        return ppq_fake_quant(tensor, config)


class Coarse4BitDelegate:
    """Re-quantize with 4-bit range on the same scale grid."""

    def __call__(self, tensor, config):
        import jax.numpy as jnp
        s = jnp.asarray(config.scale)
        q = jnp.clip(jnp.round(tensor / s), -8, 7)
        return q * s


watcher = WatchingDelegate()
executor.register_quantize_delegate(cfg, watcher)
out = np.asarray(executor.forward(loader[0])[0])
print(f'watcher called {watcher.calls}x; output unchanged:',
      bool(np.allclose(out, ref)))

executor.register_quantize_delegate(cfg, Coarse4BitDelegate())
coarse = np.asarray(executor.forward(loader[0])[0])
print('4-bit delegate max |Δ| vs INT8:',
      float(np.abs(coarse - ref).max()))

executor.remove_quantize_delegate(cfg)
back = np.asarray(executor.forward(loader[0])[0])
print('delegate removed, restored:', bool(np.allclose(back, ref)))
