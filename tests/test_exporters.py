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
    # tengine rejects per-channel configs — use a per-tensor quantization
    tg = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(11)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(tg, loader, calib_steps=4,
                   platform=TargetPlatform.TENGINE_INT8, verbose=False)
    for cls, name in cases:
        onnx_path = str(tmp / f'{name}.onnx')
        cls().export(onnx_path, tg if name == 'tengine' else graph)
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


def test_ncnn_table_golden_format(quantized):
    """Reference ncnn table layout (ncnn_exporter.py:14-48): all
    `<op>_param_0` weight lines first (inverse per-channel scales, '%f '
    formatting), then one `<op>` line per computing op with a single
    inverse input scale."""
    graph, _, tmp = quantized
    from ppq_tpu.frontends.qtable import NCNNExporter
    path = str(tmp / 'golden_ncnn.onnx')
    NCNNExporter().export(path, graph)
    lines = open(str(tmp / 'golden_ncnn.table')).read().strip().split('\n')
    n_comp = sum(1 for op in graph.operations.values()
                 if op.is_computing_op)
    param_lines = [l for l in lines if l.split(' ')[0].endswith('_param_0')]
    act_lines = [l for l in lines if not l.split(' ')[0].endswith('_param_0')]
    assert len(param_lines) == n_comp, (len(param_lines), n_comp)
    assert len(act_lines) == n_comp
    # ordering: every param line precedes every activation line
    assert lines[:len(param_lines)] == param_lines
    for l in act_lines:
        vals = [v for v in l.split(' ')[1:] if v]
        assert len(vals) == 1, f'activation line must hold ONE scale: {l}'
        float(vals[0])
    for l in param_lines:
        vals = [float(v) for v in l.split(' ')[1:] if v]
        assert all(v > 0 for v in vals)


def test_ncnn_depthwise_group_collapse(tmp_path):
    """Depthwise conv weight scales collapse to one per group
    (reference ncnn_exporter.py:26-32)."""
    from ppq_tpu.zoo.builder import NetBuilder
    from ppq_tpu.frontends.qtable import NCNNExporter
    b = NetBuilder('dw', 0)
    x = b.input('x', [1, 8, 8, 8])
    w = b.param(b.rng.randn(8, 1, 3, 3) * 0.3)
    y = b.op('Conv', [x, w], kernel_shape=[3, 3], pads=[1, 1, 1, 1],
             group=8)
    b.output(y)
    g = b.g
    rng = np.random.RandomState(5)
    loader = [rng.randn(1, 8, 8, 8).astype(np.float32) for _ in range(2)]
    quantize_graph(g, loader, calib_steps=2,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    NCNNExporter().export(str(tmp_path / 'dw.onnx'), g)
    lines = open(str(tmp_path / 'dw.table')).read().strip().split('\n')
    pline = next(l for l in lines if '_param_0' in l)
    vals = [v for v in pline.split(' ')[1:] if v]
    assert len(vals) == 8, f'8 groups → 8 scales, got {len(vals)}'


def test_tengine_json_golden_format(tmp_path):
    """Reference tengine config layout (tengine_exporter.py:91-125):
    {configs, dispatchings, values} with hash/dominator links."""
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(11)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(graph, loader, calib_steps=4,
                   platform=TargetPlatform.TENGINE_INT8, verbose=False)
    from ppq_tpu.frontends.qtable import TengineExporter
    TengineExporter().export(str(tmp_path / 't.onnx'), graph)
    buf = json.load(open(str(tmp_path / 't.json')))
    assert set(buf) == {'configs', 'dispatchings', 'values'}
    assert buf['configs'] and buf['values']
    some_op = next(iter(buf['configs'].values()))
    rec = next(iter(some_op.values()))
    assert {'bit_width', 'policy', 'state', 'quant_min', 'quant_max',
            'hash', 'dominator'} <= set(rec)
    # every ACTIVATED root hash resolves in values
    for op_dict in buf['configs'].values():
        for rec in op_dict.values():
            if rec['state'] == 'ACTIVATED' and \
                    rec['hash'] == rec['dominator']:
                assert str(rec['hash']) in {str(k) for k in buf['values']}


def test_caffe_dsp_exporters_embed_ranges(tmp_path):
    """PPLDSP/TI caffe exporters embed quantize_param ranges in the
    prototxt (reference caffe_exporter.py:248,403); TI carries per-channel
    filter entries."""
    from ppq_tpu.frontends.caffe import (PPLDSPCaffeExporter,
                                         PPLDSPTICaffeExporter,
                                         SNPECaffeExporter, caffe_pb2 as pb)
    from google.protobuf import text_format
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(11)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(graph, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_DSP_INT8, verbose=False)

    PPLDSPCaffeExporter().export(str(tmp_path / 'dsp.prototxt'), graph)
    net = pb.NetParameter()
    text_format.Merge(open(str(tmp_path / 'dsp.prototxt')).read(), net)
    conv = next(l for l in net.layer if l.type == 'Convolution')
    assert len(conv.quantize_param) >= 1, 'no activation ranges embedded'
    assert conv.convolution_param.quantize_param.type == 'filter'

    PPLDSPTICaffeExporter().export(str(tmp_path / 'ti.prototxt'), graph)
    net = pb.NetParameter()
    text_format.Merge(open(str(tmp_path / 'ti.prototxt')).read(), net)
    conv = next(l for l in net.layer if l.type == 'Convolution')
    # DSP platform weights are per-tensor; TI still writes via the
    # per-channel path when >1 scales, else single entry — must not crash
    assert (len(conv.convolution_param.perchannel_quantize_param) >= 1 or
            conv.convolution_param.quantize_param.type == 'filter')

    SNPECaffeExporter().export(str(tmp_path / 'snpe.prototxt'), graph)
    enc = json.load(open(str(tmp_path / 'snpe_encodings.json')))
    assert enc['activation_encodings']


def test_extension_exporter(quantized):
    """TargetPlatform.EXTENSION ships a working sample exporter
    (reference parser/extension.py): quant params of every exportable
    TQC land in a txt sidecar; subclasses override write_table."""
    graph, _, tmp = quantized
    from ppq_tpu.core import TargetPlatform
    from ppq_tpu.frontends import EXPORTER_COLLECTION
    from ppq_tpu.frontends.qtable import ExtensionExporter
    assert EXPORTER_COLLECTION[TargetPlatform.EXTENSION] is \
        ExtensionExporter
    path = str(tmp / 'ext.onnx')
    ExtensionExporter().export(path, graph)
    sidecar = str(tmp / 'ext_quant_params.txt')
    assert os.path.exists(sidecar)
    body = open(sidecar).read()
    assert 'bits=8' in body and 'scale=' in body and 'offset=' in body

    class MyExporter(ExtensionExporter):
        def write_table(self, graph, path):
            with open(path, 'w') as f:
                f.write('custom')

    MyExporter().export(str(tmp / 'ext2.onnx'), graph)
    assert open(str(tmp / 'ext2_quant_params.txt')).read() == 'custom'
