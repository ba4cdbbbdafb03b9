"""QDQ exporter hygiene (reference onnxruntime_exporter.py:213,307,366):
fused-activation removal, back-to-back Q/DQ dedup, opset-13 conversion, and
a golden structural check of the emitted proto."""

import numpy as np
import pytest

from ppq_tpu import (TargetPlatform, TPUExecutor, export_ppq_graph,
                     load_onnx_graph, quantize_graph)
from ppq_tpu.zoo.builder import NetBuilder


def _conv_relu_conv(seed=0):
    b = NetBuilder('crc', seed)
    x = b.input('x', [1, 4, 8, 8])
    t = b.relu(b.conv(x, 4, 8, 3))
    y = b.conv(t, 8, 4, 3)
    b.output(y)
    return b.g


@pytest.fixture(scope='module')
def ort_quantized():
    g = _conv_relu_conv()
    rng = np.random.RandomState(3)
    loader = [np.abs(rng.randn(1, 4, 8, 8)).astype(np.float32)
              for _ in range(4)]
    quantize_graph(g, loader, calib_steps=4,
                   platform=TargetPlatform.ORT_INT8, verbose=False)
    return g, loader


def test_fused_relu_removed_from_qdq_export(ort_quantized, tmp_path):
    g, loader = ort_quantized
    path = str(tmp_path / 'qdq.onnx')
    export_ppq_graph(g, TargetPlatform.ORT_INT8, path)
    re = load_onnx_graph(path)
    types = [op.type for op in re.operations.values()]
    # asymmetric activation range starts at 0 → Relu folds into the Q/DQ
    # clamp and must NOT be exported (double-clamp + broken conv fusion)
    assert 'Relu' not in types, types
    assert types.count('QuantizeLinear') >= 1
    assert types.count('DequantizeLinear') >= types.count('QuantizeLinear')


def test_no_back_to_back_duplicate_qdq(ort_quantized, tmp_path):
    g, loader = ort_quantized
    path = str(tmp_path / 'qdq2.onnx')
    export_ppq_graph(g, TargetPlatform.ORT_INT8, path)
    re = load_onnx_graph(path)
    for op in re.operations.values():
        if op.type != 'QuantizeLinear':
            continue
        src = op.inputs[0].source_op
        if src is None or src.type != 'DequantizeLinear':
            continue
        s1 = np.asarray(src.inputs[1].value)
        s2 = np.asarray(op.inputs[1].value)
        if s1.shape != s2.shape:
            continue
        assert float(np.max(np.abs(s1 - s2))) > 1e-5, \
            f'duplicate Q/DQ pair with identical scale at {op.name}'


def test_qdq_export_numerically_faithful(ort_quantized, tmp_path):
    """Relu removal must not change the simulated function: the Q clamp
    reproduces the clip."""
    g, loader = ort_quantized
    path = str(tmp_path / 'qdq3.onnx')
    export_ppq_graph(g, TargetPlatform.ORT_INT8, path)
    re = load_onnx_graph(path)
    sim = np.asarray(TPUExecutor(g).forward(loader[0])[0])
    dep = np.asarray(TPUExecutor(re).forward(loader[0])[0])
    err = float(np.abs(sim - dep).max() / (np.abs(sim).max() + 1e-9))
    assert err < 5e-2, f'deployed vs simulated rel err {err}'


def test_opset13_attribute_conversion(tmp_path):
    """Squeeze/Unsqueeze axes attributes must be converted to inputs for
    the opset-13 proto (reference onnxruntime_exporter.py:366)."""
    b = NetBuilder('sq', 1)
    x = b.input('x', [1, 4, 8, 8])
    t = b.conv(x, 4, 4, 3)
    # attribute-style Unsqueeze (opset < 13 spelling)
    u = b.op('Unsqueeze', [t], axes=[0])
    b.output(u)
    g = b.g
    rng = np.random.RandomState(0)
    loader = [rng.randn(1, 4, 8, 8).astype(np.float32) for _ in range(2)]
    quantize_graph(g, loader, calib_steps=2,
                   platform=TargetPlatform.ORT_INT8, verbose=False)
    path = str(tmp_path / 'sq.onnx')
    export_ppq_graph(g, TargetPlatform.ORT_INT8, path)
    re = load_onnx_graph(path)
    for op in re.operations.values():
        if op.type in ('Squeeze', 'Unsqueeze', 'Split', 'ReduceSum'):
            assert 'axes' not in op.attributes and \
                'split' not in op.attributes, \
                f'{op.type} still carries opset<13 attributes'


def test_fp8_floating_qdq_export_roundtrip(tmp_path):
    """FP8 configs export the floating QDQ dialect (reference
    onnxruntime_exporter.py:113 QuantizeFloating/DequantizeFloating with
    min/max/exponent/mantissa, float32 offsets, fp32 initializers kept)
    and the re-loaded model reproduces the FP8 simulation."""
    from ppq_tpu import QuantizationSettingFactory, TPUExecutor
    b = NetBuilder('fp8net', 2)
    x = b.input('x', [1, 4, 8, 8])
    y = b.relu(b.conv(x, 4, 8, 3))
    y = b.gemm(b.flatten(b.gap(y)), 8, 5)
    b.output(y)
    g = b.g
    rng = np.random.RandomState(1)
    loader = [rng.randn(1, 4, 8, 8).astype(np.float32) for _ in range(2)]
    quantize_graph(g, loader, calib_steps=2,
                   platform=TargetPlatform.TPU_FP8,
                   setting=QuantizationSettingFactory.fp8_setting(),
                   verbose=False)
    sim = np.asarray(TPUExecutor(g).forward(loader[0])[0])

    path = str(tmp_path / 'fp8.onnx')
    export_ppq_graph(g, TargetPlatform.TPU_FP8, path)
    re = load_onnx_graph(path)
    types = {op.type for op in re.operations.values()}
    assert 'QuantizeFloating' in types and 'DequantizeFloating' in types
    qf = next(op for op in re.operations.values()
              if op.type == 'QuantizeFloating')
    assert {'min', 'max', 'exponent', 'mantissa'} <= set(qf.attributes)
    got = np.asarray(TPUExecutor(re).forward(loader[0])[0])
    np.testing.assert_allclose(got, sim, rtol=1e-4, atol=1e-5)
