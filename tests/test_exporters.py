"""Exporter tests: QDQ ONNX round-trip (reference model:
tests/test_onnxruntime.py — export, re-run, compare with simulation) plus
quant-table backends and native checkpoint."""

import json
import os

import numpy as np
import pytest

from ppq_tpu import (TargetPlatform, TPUExecutor, export_ppq_graph,
                     load_native_graph, load_onnx_graph, quantize_graph)
from ppq_tpu.ir import QuantableOperation
from ppq_tpu.quantization.measure import torch_snr_error
from ppq_tpu.zoo.vision import tiny_cnn


@pytest.fixture(scope='module')
def quantized(tmp_path_factory):
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(11)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(graph, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return graph, loader, tmp_path_factory.mktemp('export')


def test_qdq_export_roundtrip(quantized):
    graph, loader, tmp = quantized
    path = str(tmp / 'model_qdq.onnx')
    export_ppq_graph(graph, TargetPlatform.TPU_INT8, path)
    assert os.path.exists(path)

    re = load_onnx_graph(path)
    types = {op.type for op in re.operations.values()}
    assert 'QuantizeLinear' in types and 'DequantizeLinear' in types
    # weights must be stored as real integers
    int_inits = [v for v in re.variables.values()
                 if v.is_parameter and v.has_value and
                 np.issubdtype(np.asarray(v.value).dtype, np.integer) and
                 np.asarray(v.value).ndim == 4]
    assert int_inits, 'no int8 weight initializers found in QDQ export'

    sim = np.asarray(TPUExecutor(graph).forward(loader[0])[0])
    deployed = np.asarray(TPUExecutor(re).forward(loader[0])[0])
    snr = float(torch_snr_error(deployed[None], sim[None]))
    assert snr < 1e-3, f'deployed-vs-sim SNR {snr}'


def test_native_checkpoint_roundtrip(quantized):
    graph, loader, tmp = quantized
    path = str(tmp / 'ckpt.native')
    from ppq_tpu.frontends.native import NativeExporter
    NativeExporter().export(path, graph)
    re = load_native_graph(path)
    a = np.asarray(TPUExecutor(graph).forward(loader[0])[0])
    b = np.asarray(TPUExecutor(re).forward(loader[0])[0])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # quant state survives
    qops = [op for op in re.operations.values()
            if isinstance(op, QuantableOperation)]
    assert qops


def test_quant_table_exporters(quantized):
    graph, _, tmp = quantized
    from ppq_tpu.frontends.qtable import (MNNExporter, NCNNExporter,
                                          NXPExporter, PPLExporter,
                                          SNPEExporter, TengineExporter)
    cases = [(NCNNExporter, 'ncnn'), (TengineExporter, 'tengine'),
             (SNPEExporter, 'snpe'), (MNNExporter, 'mnn'),
             (NXPExporter, 'nxp'), (PPLExporter, 'ppl')]
    for cls, name in cases:
        onnx_path = str(tmp / f'{name}.onnx')
        cls().export(onnx_path, graph)
        assert os.path.exists(onnx_path)
        others = [p for p in os.listdir(tmp)
                  if p.startswith(name) and not p.endswith('.onnx')]
        assert others, f'{name} exporter wrote no quant table'


def test_snpe_encodings_content(quantized):
    graph, _, tmp = quantized
    from ppq_tpu.frontends.qtable import SNPEExporter
    path = str(tmp / 's.onnx')
    SNPEExporter().export(path, graph)
    enc = json.load(open(str(tmp / 's_encodings.json')))
    assert enc['activation_encodings'], 'no activation encodings'
    rec = next(iter(enc['activation_encodings'].values()))[0]
    assert rec['max'] > rec['min']
    assert rec['bitwidth'] == 8
