"""New fusion morphs, vendor passes, eval harness tests."""

import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.ir import fuse_scale, fuse_selfattention, fuse_skiplayernorm
from ppq_tpu.zoo import bert_encoder, tiny_cnn
from ppq_tpu.zoo.builder import NetBuilder


def test_fuse_selfattention_preserves_function():
    g = bert_encoder(seq_len=8, d_model=32, n_heads=2, n_layers=1, d_ff=64)
    x = np.random.RandomState(0).randn(1, 8, 32).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(x)[0])
    n = fuse_selfattention(g)
    assert n == 1, f'expected 1 attention fused, got {n}'
    assert any(op.type == 'Attention' for op in g.operations.values())
    assert not any(op.type == 'Softmax' for op in g.operations.values())
    out = np.asarray(TPUExecutor(g).forward(x)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fuse_skiplayernorm_preserves_function():
    b = NetBuilder('skipln', 4)
    x = b.input('x', [1, 6, 16])
    y = b.matmul(x, b.param(b.rng.randn(16, 16) * 0.2))
    s = b.add(y, x)
    out = b.op('LayerNormalization', [
        s, b.param(np.ones(16)), b.param(np.zeros(16))],
        axis=-1, epsilon=1e-5)
    b.output(out)
    g = b.g
    xin = np.random.RandomState(1).randn(1, 6, 16).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xin)[0])
    fuse_skiplayernorm(g)
    assert any(op.type == 'skipLayerNormPlugin'
               for op in g.operations.values())
    out = np.asarray(TPUExecutor(g).forward(xin)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fuse_scale():
    b = NetBuilder('scale', 5)
    x = b.input('x', [1, 8, 4, 4])
    y = b.op('Mul', [x, b.param(b.rng.rand(1, 8, 1, 1) + 0.5)])
    y = b.op('Add', [y, b.param(b.rng.randn(1, 8, 1, 1) * 0.1)])
    b.output(y)
    g = b.g
    xin = np.random.RandomState(2).randn(1, 8, 4, 4).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xin)[0])
    fuse_scale(g)
    assert any(op.type == 'Scale' for op in g.operations.values())
    assert not any(op.type == 'Add' for op in g.operations.values())
    out = np.asarray(TPUExecutor(g).forward(xin)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_vendor_passes_run():
    from ppq_tpu.api import manop
    from ppq_tpu.quantization.optim import (NxpInputRoundingRefinePass,
                                            NxpQuantizeFusionPass,
                                            PPLCudaAddConvReluMerge,
                                            PPLDSPTIReCalibrationPass)
    g = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(3)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(g, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    manop(g, [NxpInputRoundingRefinePass(), PPLCudaAddConvReluMerge(),
              PPLDSPTIReCalibrationPass(calib_steps=4)],
          calib_dataloader=loader, verbose=False)
    out = TPUExecutor(g).forward(loader[0])[0]
    assert np.isfinite(np.asarray(out)).all()


def test_evaluate_classification():
    from ppq_tpu.zoo.evaluate import evaluate_classification
    g = tiny_cnn(num_classes=10, input_shape=(4, 3, 16, 16))
    rng = np.random.RandomState(4)
    loader = [(rng.randn(4, 3, 16, 16).astype(np.float32),
               rng.randint(0, 10, 4)) for _ in range(3)]
    res = evaluate_classification(g, loader)
    assert 0.0 <= res['top1'] <= res['top5'] <= 1.0
    assert res['images_per_sec'] > 0


def test_quantzoo_benchmark_matrix():
    from ppq_tpu.zoo.evaluate import quantzoo_benchmark
    rng = np.random.RandomState(5)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(2)]
    records = quantzoo_benchmark(
        {'tiny_cnn': lambda: tiny_cnn(input_shape=(2, 3, 16, 16))},
        {'tiny_cnn': loader},
        schemes=['INT8_per_channel', 'FP8_E4M3'],
        calib_steps=2, error_steps=2, verbose=False)
    assert len(records) == 2
    for rec in records:
        assert 0 <= rec['AQE'] <= rec['MQE']
        assert np.isfinite(rec['OQE'])
