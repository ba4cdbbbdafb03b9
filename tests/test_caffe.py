"""Caffe frontend round-trip tests (reference: ppq/parser/caffe_parser.py
coverage via system tests)."""

import os

import numpy as np
import pytest

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.frontends.caffe import (CaffeExporter, CaffeParser,
                                     load_caffe_graph)
from ppq_tpu.quantization.measure import torch_snr_error

PROTOTXT = """
name: "lenet_like"
input: "data"
input_shape { dim: 1 dim: 1 dim: 16 dim: 16 }
layer {
  name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 stride: 1 }
}
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer {
  name: "pool1" type: "Pooling" bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 }
}
layer {
  name: "conv2" type: "Convolution" bottom: "pool1" top: "conv2"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 }
}
layer { name: "relu2" type: "ReLU" bottom: "conv2" top: "conv2" }
layer {
  name: "sum" type: "Eltwise" bottom: "conv2" bottom: "pool1" top: "sum"
  eltwise_param { operation: SUM }
}
layer {
  name: "gpool" type: "Pooling" bottom: "sum" top: "gpool"
  pooling_param { pool: AVE global_pooling: true }
}
layer { name: "flat" type: "Flatten" bottom: "gpool" top: "flat" }
layer {
  name: "fc" type: "InnerProduct" bottom: "flat" top: "fc"
  inner_product_param { num_output: 10 }
}
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""


@pytest.fixture(scope='module')
def caffe_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('caffe')
    proto = tmp / 'net.prototxt'
    proto.write_text(PROTOTXT)
    # build a weight net with random blobs via the pb2 schema
    from ppq_tpu.frontends.caffe import caffe_pb2 as pb
    from google.protobuf import text_format
    net = pb.NetParameter()
    text_format.Merge(PROTOTXT, net)
    rng = np.random.RandomState(0)
    for layer in net.layer:
        if layer.type == 'Convolution':
            co = layer.convolution_param.num_output
            ci = 1 if layer.name == 'conv1' else 8
            k = layer.convolution_param.kernel_size[0]
            w = layer.blobs.add()
            val = rng.randn(co, ci, k, k).astype(np.float32) * 0.3
            w.shape.dim.extend(val.shape)
            w.data.extend(val.reshape(-1))
            b = layer.blobs.add()
            bv = rng.randn(co).astype(np.float32) * 0.05
            b.shape.dim.extend(bv.shape)
            b.data.extend(bv)
        elif layer.type == 'InnerProduct':
            w = layer.blobs.add()
            val = rng.randn(10, 8).astype(np.float32) * 0.3
            w.shape.dim.extend(val.shape)
            w.data.extend(val.reshape(-1))
            b = layer.blobs.add()
            bv = rng.randn(10).astype(np.float32) * 0.05
            b.shape.dim.extend(bv.shape)
            b.data.extend(bv)
    model = tmp / 'net.caffemodel'
    model.write_bytes(net.SerializeToString())
    return str(proto), str(model), tmp


def test_parse_and_execute(caffe_files):
    proto, model, _ = caffe_files
    g = load_caffe_graph(proto, model)
    assert 'data' in g.inputs and len(g.outputs) == 1
    types = {op.type for op in g.operations.values()}
    assert {'Conv', 'Relu', 'MaxPool', 'Gemm', 'Softmax'} <= types
    x = np.random.RandomState(1).randn(1, 1, 16, 16).astype(np.float32)
    out = np.asarray(TPUExecutor(g).forward(x)[0])
    assert out.shape == (1, 10)
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-4)  # softmax


def test_caffe_quantize_e2e(caffe_files):
    proto, model, _ = caffe_files
    g = load_caffe_graph(proto, model)
    rng = np.random.RandomState(2)
    loader = [rng.randn(1, 1, 16, 16).astype(np.float32) for _ in range(4)]
    ref = np.asarray(TPUExecutor(load_caffe_graph(proto, model))
                     .forward(loader[0])[0])
    quantize_graph(g, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    q = np.asarray(TPUExecutor(g).forward(loader[0])[0])
    snr = float(torch_snr_error(q.reshape(1, -1), ref.reshape(1, -1)))
    assert snr < 0.05, snr


def test_caffe_export_roundtrip(caffe_files):
    proto, model, tmp = caffe_files
    g = load_caffe_graph(proto, model)
    x = np.random.RandomState(3).randn(1, 1, 16, 16).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(x)[0])

    out_proto = str(tmp / 'exported.prototxt')
    CaffeExporter().export(out_proto, g)
    assert os.path.exists(out_proto)
    assert os.path.exists(str(tmp / 'exported.caffemodel'))

    re = load_caffe_graph(out_proto, str(tmp / 'exported.caffemodel'))
    out = np.asarray(TPUExecutor(re).forward(x)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


EXTENDED_PROTOTXT = """
name: "extended_layers"
input: "data"
input_shape { dim: 1 dim: 4 dim: 8 dim: 8 }
layer {
  name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 8 kernel_size: 3 pad: 1 }
}
layer { name: "prelu1" type: "PReLU" bottom: "conv1" top: "prelu1" }
layer { name: "r6" type: "ReLU6" bottom: "prelu1" top: "r6" }
layer { name: "hsw" type: "HSwish" bottom: "r6" top: "hsw" }
layer { name: "hsg" type: "HSigmoid" bottom: "r6" top: "hsg" }
layer { name: "mix" type: "Mul" bottom: "hsw" bottom: "hsg" top: "mix" }
layer {
  name: "shuf" type: "ChannelShuffle" bottom: "mix" top: "shuf"
  channel_shuffle_param { group: 2 }
}
layer {
  name: "inorm" type: "InstanceNorm" bottom: "shuf" top: "inorm"
  instance_norm_param { num_features: 8 eps: 1e-5 }
}
layer {
  name: "down" type: "SubpixelDown" bottom: "inorm" top: "down"
  subpixel_down_param { downsample: 2 }
}
layer {
  name: "up" type: "SubpixelUp" bottom: "down" top: "up"
  subpixel_up_param { upsample: 2 }
}
layer {
  name: "clip" type: "Clip" bottom: "up" top: "clip"
  clip_param { min: -1.0 max: 1.0 }
}
layer {
  name: "tanh" type: "TanH" bottom: "clip" top: "tanh"
}
layer {
  name: "pad" type: "ReflectionPad" bottom: "tanh" top: "pad"
  pad_param { pad: 1 }
}
layer {
  name: "nnu" type: "NNUpsample" bottom: "pad" top: "nnu"
  nn_upsample_param { resize: 2 }
}
layer {
  name: "red" type: "Reduce" bottom: "nnu" top: "red"
  reduce_param { axis: 3 }
}
layer {
  name: "amax" type: "ArgMax" bottom: "red" top: "amax"
  argmax_param { axis: 1 }
}
"""


def test_extended_caffe_layers_parse_and_run(tmp_path):
    """Every extended layer type parses and executes (reference
    caffe_import_utils.py layer registry breadth)."""
    proto = tmp_path / 'ext.prototxt'
    proto.write_text(EXTENDED_PROTOTXT)
    # weights for conv1 + prelu1
    from ppq_tpu.frontends.caffe import caffe_pb2 as pb
    from google.protobuf import text_format
    net = pb.NetParameter()
    text_format.Merge(EXTENDED_PROTOTXT, net)
    rng = np.random.RandomState(0)
    for layer in net.layer:
        if layer.type == 'Convolution':
            w = layer.blobs.add()
            val = rng.randn(8, 4, 3, 3).astype(np.float32) * 0.3
            w.shape.dim.extend(val.shape)
            w.data.extend(val.reshape(-1))
        elif layer.type == 'PReLU':
            w = layer.blobs.add()
            val = np.full((8,), 0.1, np.float32)
            w.shape.dim.extend(val.shape)
            w.data.extend(val)
    model = tmp_path / 'ext.caffemodel'
    model.write_bytes(net.SerializeToString())
    g = load_caffe_graph(str(proto), str(model))
    types = {op.type for op in g.operations.values()}
    for expect in ('PRelu', 'Clip', 'HardSwish', 'HardSigmoid', 'Mul',
                   'ChannelShuffle', 'InstanceNormalization',
                   'SpaceToDepth', 'DepthToSpace', 'Tanh', 'Pad',
                   'Resize', 'ReduceMean', 'ArgMax'):
        assert expect in types, f'{expect} missing from parse: {types}'
    x = np.random.RandomState(0).randn(1, 4, 8, 8).astype(np.float32)
    out = np.asarray(TPUExecutor(g).forward(x)[0])
    assert np.isfinite(np.asarray(out, np.float64)).all()


def test_extended_caffe_tile_matmul(tmp_path):
    proto = tmp_path / 'tile.prototxt'
    proto.write_text("""
name: "tm"
input: "a"
input_shape { dim: 2 dim: 4 }
input: "b"
input_shape { dim: 4 dim: 3 }
layer { name: "mm" type: "MatMul" bottom: "a" bottom: "b" top: "mm" }
layer {
  name: "tile" type: "Tile" bottom: "mm" top: "tile"
  tile_param { axis: 0 tiles: 2 }
}
""")
    g = load_caffe_graph(str(proto))
    a = np.random.RandomState(1).randn(2, 4).astype(np.float32)
    b = np.random.RandomState(2).randn(4, 3).astype(np.float32)
    out = np.asarray(TPUExecutor(g).forward({'a': a, 'b': b})[0])
    np.testing.assert_allclose(out, np.tile(a @ b, (2, 1)), rtol=1e-5)


def test_caffe_export_extended_layers_roundtrip(tmp_path):
    """Exporter coverage for the reference's wider layer set
    (caffe_export_utils.py:22+): PRelu/ReLU6/Pad/Split/Pow/HardSwish/
    Tile/ChannelShuffle/SpaceToDepth/DepthToSpace/ArgMax export to their
    caffe layer types and parse back to an EXECUTABLE graph whose output
    matches the original."""
    from ppq_tpu.zoo import NetBuilder
    b = NetBuilder('wide', seed=7)
    x = b.input('data', (1, 8, 8, 8))
    y = b.op('PRelu', [x, b.param(np.full((1, 8, 1, 1), 0.1, np.float32))])
    y = b.relu6(y)
    y = b.op('Pad', [y, b.iparam(np.asarray([0, 0, 1, 1, 0, 0, 1, 1]))],
             mode='reflect')
    y = b.op('SpaceToDepth', [y], blocksize=2)     # (1, 32, 5, 5)
    y = b.op('DepthToSpace', [y], blocksize=2)     # back to (1, 8, 10, 10)
    y = b.op('ChannelShuffle', [y], group=2)
    y = b.op('HardSwish', [y])
    lo, hi = b.op('Split', [y], n_out=2, axis=1)
    y = b.concat([lo, hi], axis=1)
    y = b.op('Pow', [y, b.param(np.asarray(2.0, np.float32))])
    y = b.op('Mul', [y, b.param(np.full((1, 8, 1, 1), 0.5, np.float32))])
    out = b.op('ArgMax', [y], axis=1, keepdims=1)
    b.output(out)
    g = b.g

    xv = np.random.RandomState(11).randn(1, 8, 8, 8).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xv)[0])

    path = str(tmp_path / 'wide.prototxt')
    CaffeExporter().export(path, g)
    text = open(path).read()
    for lt in ('PReLU', 'ReLU6', 'ReflectionPad', 'SubpixelDown',
               'SubpixelUp', 'ChannelShuffle', 'HSwish', 'Slice',
               'Power', 'Scale', 'ArgMax'):
        assert f'type: "{lt}"' in text, f'missing caffe layer type {lt}'

    g2 = load_caffe_graph(path, str(tmp_path / 'wide.caffemodel'))
    got = np.asarray(TPUExecutor(g2).forward(xv)[0])
    np.testing.assert_array_equal(got.reshape(-1), ref.reshape(-1))


def test_caffe_uneven_split_roundtrip(tmp_path):
    """Uneven ONNX Split exports slice_point and parses back to the SAME
    sizes (regression: the parser computed sizes then discarded them,
    silently producing an equal split)."""
    from ppq_tpu.zoo import NetBuilder
    b = NetBuilder('uneven', seed=0)
    x = b.input('data', (1, 8, 4, 4))
    lo, hi = b.op('Split', [x, b.iparam(np.asarray([3, 5]))], n_out=2,
                  axis=1)
    b.output(b.concat([hi, lo], axis=1))
    g = b.g
    xv = np.random.RandomState(0).randn(1, 8, 4, 4).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xv)[0])
    path = str(tmp_path / 'uneven.prototxt')
    CaffeExporter().export(path, g)
    assert 'slice_point: 3' in open(path).read()
    g2 = load_caffe_graph(path, str(tmp_path / 'uneven.caffemodel'))
    got = np.asarray(TPUExecutor(g2).forward(xv)[0])
    np.testing.assert_array_equal(got, ref)


def test_caffe_sizes_resize_roundtrip(tmp_path):
    """Linear Resize driven by a SIZES input exports Interp
    height/width (regression: zoom_factor defaulted to 1 → identity)."""
    from ppq_tpu.zoo import NetBuilder
    b = NetBuilder('interp', seed=0)
    x = b.input('data', (1, 2, 4, 4))
    roi = b.param(np.zeros(0, np.float32))
    scales = b.param(np.zeros(0, np.float32))
    sizes = b.iparam(np.asarray([1, 2, 8, 8]))
    y = b.op('Resize', [x, roi, scales, sizes], mode='linear',
             coordinate_transformation_mode='align_corners')
    b.output(y)
    g = b.g
    xv = np.random.RandomState(1).randn(1, 2, 4, 4).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xv)[0])
    assert ref.shape == (1, 2, 8, 8)
    path = str(tmp_path / 'interp.prototxt')
    CaffeExporter().export(path, g)
    txt = open(path).read()
    assert 'height: 8' in txt and 'width: 8' in txt
    g2 = load_caffe_graph(path, str(tmp_path / 'interp.caffemodel'))
    got = np.asarray(TPUExecutor(g2).forward(xv)[0])
    assert got.shape == (1, 2, 8, 8)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_caffe_identity_clip_not_relu6(tmp_path):
    """Clip with no bounds (opset-11 identity) must NOT export ReLU6
    (regression: missing optional inputs defaulted to [0, 6])."""
    from ppq_tpu.zoo import NetBuilder
    b = NetBuilder('clip_id', seed=0)
    x = b.input('data', (1, 4))
    y = b.op('Clip', [x])
    b.output(y)
    path = str(tmp_path / 'clip.prototxt')
    CaffeExporter().export(path, b.g)
    txt = open(path).read()
    assert 'ReLU6' not in txt and 'type: "Clip"' in txt
