"""Beginner working-directory flow (reference api/interface.py:805,852 +
api/fsys.py): quantize(<dir with model.onnx + data/*.npy>) -> export(<dir>),
plus the fsys helpers on their own."""

import json
import os

import numpy as np
import pytest

from ppq_tpu import TargetPlatform, TPUExecutor
from ppq_tpu.api import QuantizationSettingFactory, export, fsys, quantize
from ppq_tpu.frontends.onnx import OnnxExporter
from ppq_tpu.ir import QuantableOperation
from ppq_tpu.zoo.vision import tiny_cnn


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp('beginner')
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    OnnxExporter().export(str(wd / 'model.onnx'), graph)
    rng = np.random.RandomState(3)
    os.makedirs(wd / 'data')
    for i in range(8):
        np.save(wd / 'data' / f'sample_{i}.npy',
                rng.randn(3, 16, 16).astype(np.float32))
    return wd


def test_load_calibration_dataset(workdir):
    batches = fsys.load_calibration_dataset(
        str(workdir), input_shape=[2, 3, 16, 16], batchsize=2)
    assert len(batches) == 4
    assert all(b.shape == (2, 3, 16, 16) for b in batches)


def test_quantize_and_export_working_directory(workdir):
    setting = QuantizationSettingFactory.default_setting()
    graph = quantize(str(workdir), setting,
                     input_shape=[2, 3, 16, 16],
                     target_platform=TargetPlatform.TPU_INT8,
                     calib_steps=4, verbose=False)
    assert any(isinstance(op, QuantableOperation)
               for op in graph.operations.values())
    export(str(workdir), graph, TargetPlatform.TPU_INT8)
    exported = [f for f in os.listdir(workdir) if f.startswith('quantized')]
    assert any(f.endswith('.json') for f in exported)
    assert any(not f.endswith('.json') for f in exported)


def test_dump_and_compare_internal_results(workdir, tmp_path):
    setting = QuantizationSettingFactory.default_setting()
    graph = quantize(str(workdir), setting,
                     input_shape=[2, 3, 16, 16],
                     target_platform=TargetPlatform.TPU_INT8,
                     calib_steps=4, verbose=False)
    x = np.random.RandomState(5).randn(2, 3, 16, 16).astype(np.float32)
    d1, d2 = str(tmp_path / 'a'), str(tmp_path / 'b')
    fsys.dump_internal_results(graph, x, d1)
    fsys.dump_internal_results(graph, x, d2)
    assert os.path.exists(os.path.join(d1, 'meta.json'))
    report = fsys.compare_cosine_similarity_between_results(d1, d2)
    sims = [v for k, v in report.items() if v is not None]
    assert sims and all(v > 0.999999 for v in sims)


def test_fsys_file_roundtrip(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / 'x.bin')
    fsys.dump_to_file(path, arr)
    back = fsys.load_from_file(path, shape=(3, 4))
    np.testing.assert_array_equal(arr, back)
    jpath = str(tmp_path / 'x.json')
    fsys.dump_to_file(jpath, {'a': 1}, binary=False)
    assert fsys.load_from_file(jpath, binary=False) == {'a': 1}
