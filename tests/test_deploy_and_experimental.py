"""IR deploy helpers, device switcher, experimental passes."""

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.api import manop
from ppq_tpu.ir import (GraphDeviceSwitcher, RunnableGraph, TrainableGraph)
from ppq_tpu.quantization.measure import torch_snr_error
from ppq_tpu.quantization.optim import (LearningToCalibPass,
                                        MatrixFactorizationPass)
from ppq_tpu.zoo import tiny_cnn, yolo_lite
from ppq_tpu.zoo.builder import NetBuilder


def test_runnable_graph_roundtrip():
    g = tiny_cnn(input_shape=(1, 3, 16, 16))
    before = {k: v.copy() for k, v in g.parameters().items()}
    rg = RunnableGraph(g).deploy()
    assert rg.device_value(next(iter(before))) is not None
    rg.retrieve()
    for k, v in g.parameters().items():
        np.testing.assert_array_equal(v, before[k])


def test_trainable_graph_state_dict():
    g = tiny_cnn(input_shape=(1, 3, 16, 16))
    tg = TrainableGraph(g)
    state = tg.state_dict()
    assert state
    name = next(iter(state))
    g.variables[name].value = np.zeros_like(state[name])
    tg.load_state_dict(state)
    np.testing.assert_array_equal(g.variables[name].value, state[name])


def test_device_switcher_insert_remove():
    from ppq_tpu import dispatch_graph
    from ppq_tpu.ir import format_graph
    g = format_graph(yolo_lite(num_classes=10, in_size=32))
    dispatch_graph(g, TargetPlatform.TPU_INT8)
    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(x)[0])

    sw = GraphDeviceSwitcher(g)
    n = sw.insert_switcher()
    assert n > 0, 'yolo has SOI boundaries; switcher must insert ops'
    g.topological_sort()
    out = np.asarray(TPUExecutor(g).forward(x)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    removed = sw.remove_switcher()
    assert removed == n
    out2 = np.asarray(TPUExecutor(g).forward(x)[0])
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-6)


def test_learning_to_calib_improves_or_keeps():
    g = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(1)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    ref_g = tiny_cnn(input_shape=(2, 3, 16, 16))
    ref = np.asarray(TPUExecutor(ref_g).forward(loader[0])[0])
    quantize_graph(g, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    pre = float(torch_snr_error(
        np.asarray(TPUExecutor(g).forward(loader[0])[0]).reshape(1, -1),
        ref.reshape(1, -1)))
    manop(g, LearningToCalibPass(calib_steps=4), calib_dataloader=loader,
          verbose=False)
    post = float(torch_snr_error(
        np.asarray(TPUExecutor(g).forward(loader[0])[0]).reshape(1, -1),
        ref.reshape(1, -1)))
    assert post < pre * 2.0, (pre, post)


def test_matrix_factorization_function_shape():
    b = NetBuilder('mm', seed=2)
    x = b.input('x', [4, 32])
    w = b.param(b.rng.randn(32, 16) * 0.1)
    y = b.op('MatMul', [x, w])
    b.output(y)
    g = b.g
    xin = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xin)[0])

    MatrixFactorizationPass(rank_ratio=1.0).optimize(g)
    types = sorted(op.type for op in g.operations.values())
    assert types == ['MatMul', 'MatMul']
    out = np.asarray(TPUExecutor(g).forward(xin)[0])
    # full-rank SVD is exact
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
