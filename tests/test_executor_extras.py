"""Executor extras: dummy_forward, forward_with_gradient, partial forward,
quantize delegates, hooks, platform-override registry."""

import jax
import jax.numpy as jnp
import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.core import TargetPlatform as TP
from ppq_tpu.executor import (OPERATION_FORWARD_TABLE, QuantizeDelegator,
                              RuntimeHook, register_operation_handler,
                              resolve_forward)
from ppq_tpu.zoo import tiny_cnn


def quantized():
    g = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(21)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(3)]
    quantize_graph(g, loader, calib_steps=3,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return g, loader


def test_dummy_forward_runs():
    g, _ = quantized()
    TPUExecutor(g).dummy_forward()     # zero-input parameter-only pass


def test_partial_graph_forward():
    g, loader = quantized()
    ex = TPUExecutor(g)
    order = g.topological_sort()
    block = order[:3]
    feed = {list(g.inputs)[0]: loader[0]}
    outs = [v.name for op in block for v in op.outputs
            if any(d not in block for d in v.dest_ops)]
    res = ex.partial_graph_forward(block, feed, outs[:1])
    assert np.isfinite(np.asarray(res[0])).all()


def test_forward_with_gradient():
    g, loader = quantized()
    ex = TPUExecutor(g)
    outputs, vjp_fn = ex.forward_with_gradient(loader[0])
    cotangents = [jnp.ones_like(o) for o in outputs]
    param_grads, qparam_grads = vjp_fn(cotangents)
    total = sum(float(jnp.sum(jnp.abs(v))) for v in param_grads.values())
    assert np.isfinite(total) and total > 0
    assert qparam_grads, 'quant scales must receive gradients too'


def test_quantize_delegate_overrides():
    g, loader = quantized()
    ex = TPUExecutor(g)
    base = np.asarray(ex.forward(loader[0])[0])

    class Identity(QuantizeDelegator):
        def __call__(self, tensor, config):
            return tensor

    from ppq_tpu.ir import QuantableOperation
    n = 0
    for op in g.operations.values():
        if isinstance(op, QuantableOperation):
            for cfg in op.config:
                ex.register_quantize_delegate(cfg, Identity())
                n += 1
    dequantized = np.asarray(ex.forward(loader[0])[0])
    assert n > 0
    assert not np.array_equal(base, dequantized), \
        'identity delegates must disable quantization'


def test_runtime_hook_sees_values():
    g, loader = quantized()
    seen = []

    class Spy(RuntimeHook):
        def pre_forward_hook(self, inputs, **kw):
            seen.append(len(inputs))
            return inputs

    conv = next(op for op in g.operations.values() if op.type == 'Conv')
    TPUExecutor(g).forward(loader[0], hooks={conv.name: Spy(conv)})
    assert seen and seen[0] >= 1


def test_platform_override_registry():
    calls = []

    def fake_relu(op, values, ctx=None):
        calls.append(op.name)
        return jnp.maximum(jnp.asarray(values[0]), 0)

    register_operation_handler(fake_relu, 'Relu', TP.NXP_INT8)
    try:
        assert resolve_forward(TP.NXP_INT8, 'Relu') is fake_relu
        assert resolve_forward(TP.TPU_INT8, 'Relu') is not fake_relu
    finally:
        OPERATION_FORWARD_TABLE[TP.NXP_INT8].pop('Relu', None)
