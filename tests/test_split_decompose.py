"""Horizontal layer split + Gemm decomposition (reference models:
tests/test_gemm_split.py, test_gemm_fusion.py)."""

import numpy as np

from ppq_tpu import TPUExecutor
from ppq_tpu.ir import decompose_gemm
from ppq_tpu.quantization.optim import HorizontalLayerSplitPass
from ppq_tpu.zoo.builder import NetBuilder


def conv_net(weight_scale=5.0):
    b = NetBuilder('split_net', seed=4)
    x = b.input('x', [1, 3, 12, 12])
    y = b.relu(b.conv(x, 3, 8, 3, bias=True))
    # amplify weights so the split threshold triggers
    first_conv = next(op for op in b.g.operations.values()
                      if op.type == 'Conv')
    w = first_conv.inputs[1]
    w.value = np.asarray(w.value) * weight_scale
    y = b.conv(y, 8, 4, 3, bias=True)
    b.output(y)
    return b.g


def test_horizontal_split_preserves_function():
    g = conv_net()
    x = np.random.RandomState(0).randn(1, 3, 12, 12).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(x)[0])
    n_conv_before = sum(1 for op in g.operations.values()
                        if op.type == 'Conv')

    HorizontalLayerSplitPass(value_threshold=1.0).optimize(g)
    n_conv_after = sum(1 for op in g.operations.values()
                       if op.type == 'Conv')
    assert n_conv_after > n_conv_before, 'no layer was split'
    assert any(op.type == 'Add' for op in g.operations.values())

    out = np.asarray(TPUExecutor(g).forward(x)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # split halves the per-layer weight range
    split_w = [np.abs(np.asarray(op.inputs[1].value)).max()
               for op in g.operations.values()
               if op.type == 'Conv' and len(op.inputs) > 1]
    assert max(split_w) < 1.0 * 5.0  # below the original amplified range


def test_decompose_gemm_preserves_function():
    b = NetBuilder('gemm_net', seed=5)
    x = b.input('x', [4, 16])
    y = b.gemm(x, 16, 8)
    b.output(y)
    g = b.g
    xin = np.random.RandomState(1).randn(4, 16).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xin)[0])

    decompose_gemm(g)
    types = sorted(op.type for op in g.operations.values())
    assert types == ['Add', 'MatMul'], types
    out = np.asarray(TPUExecutor(g).forward(xin)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_decompose_gemm_transb():
    b = NetBuilder('gemm_tb', seed=6)
    x = b.input('x', [2, 8])
    w = b.param(b.rng.randn(4, 8) * 0.3)    # (out, in) with transB
    y = b.op('Gemm', [x, w], alpha=1.0, beta=1.0, transA=0, transB=1)
    b.output(y)
    g = b.g
    xin = np.random.RandomState(2).randn(2, 8).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xin)[0])
    decompose_gemm(g)
    out = np.asarray(TPUExecutor(g).forward(xin)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
