"""Torch interop: a real torch model exported through torch.onnx must parse,
quantize, and simulate bit-consistently with torch's own forward —
the `quantize_torch_model` flow (reference api/interface.py:279)."""

import io
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph  # noqa: E402
from ppq_tpu.api import load_onnx_graph  # noqa: E402
from ppq_tpu.quantization.measure import torch_snr_error  # noqa: E402


class SmallNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 8, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(8)
        self.conv2 = nn.Conv2d(8, 16, 3, stride=2, padding=1)
        self.fc = nn.Linear(16, 10)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.conv2(x))
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        x = torch.flatten(x, 1)
        return self.fc(x)


@pytest.fixture(scope='module')
def onnx_model(tmp_path_factory):
    # torch.onnx's serializer imports `onnx` only to splice onnxscript
    # functions; the environment has no onnx package (our frontend carries
    # its own protobuf bindings), so shim the two symbols it touches.
    import sys
    import types
    from ppq_tpu.frontends.onnx import onnx_pb2 as pb
    if 'onnx' not in sys.modules:
        shim = types.ModuleType('onnx')
        shim.ModelProto = pb.ModelProto
        shim.load_model_from_string = pb.ModelProto.FromString
        sys.modules['onnx'] = shim

    tmp = tmp_path_factory.mktemp('torch_onnx')
    model = SmallNet().eval()
    torch.manual_seed(0)
    for p in model.parameters():
        with torch.no_grad():
            p.mul_(1.0)
    path = str(tmp / 'net.onnx')
    dummy = torch.randn(1, 3, 16, 16)
    torch.onnx.export(model, (dummy,), path, opset_version=13,
                      input_names=['input'], output_names=['logits'],
                      dynamo=False)
    return model, path


def test_parse_torch_onnx_and_match(onnx_model):
    model, path = onnx_model
    graph = load_onnx_graph(path)
    x = np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(TPUExecutor(graph).forward(x)[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_quantize_torch_onnx(onnx_model):
    model, path = onnx_model
    rng = np.random.RandomState(1)
    loader = [rng.randn(1, 3, 16, 16).astype(np.float32) for _ in range(4)]
    with torch.no_grad():
        ref = model(torch.from_numpy(loader[0])).numpy()
    graph = load_onnx_graph(path)
    quantize_graph(graph, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    q = np.asarray(TPUExecutor(graph).forward(loader[0])[0])
    snr = float(torch_snr_error(q.reshape(1, -1), ref.reshape(1, -1)))
    assert snr < 0.05, snr
