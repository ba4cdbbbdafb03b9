"""Deployment utilities (reference utils/TensorRTUtil.py equivalents):
StableHLO artifact round-trip, benchmark sweep, profiler trace."""

import os

import numpy as np
import pytest

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.utils.deploy import (benchmark_graph, export_compiled_artifact,
                                  load_compiled_artifact, profile_graph)
from ppq_tpu.zoo.vision import tiny_cnn


@pytest.fixture(scope='module')
def quantized():
    g = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(0)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(2)]
    quantize_graph(g, loader, calib_steps=2,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return g, loader


def test_artifact_roundtrip_bit_exact(quantized, tmp_path):
    """Serialized StableHLO artifact reproduces the live compiled forward
    exactly (the deploy==sim guarantee extends to the shipped artifact)."""
    g, loader = quantized
    path = str(tmp_path / 'model.stablehlo')
    export_compiled_artifact(g, path, precision='highest')
    assert os.path.getsize(path) > 1000
    run = load_compiled_artifact(path)
    out = np.asarray(run({list(g.inputs)[0]: loader[0]})[0])
    ref = np.asarray(compile_graph(g).make_runner()(loader[0])[0])
    np.testing.assert_array_equal(out, ref)


def test_benchmark_graph_rows(quantized):
    g, _ = quantized
    rows = benchmark_graph(g, batch_sizes=(2, 4), iters=3, warmup=1)
    assert [r['batch'] for r in rows] == [2, 4]
    for r in rows:
        assert r['items_per_sec'] > 0 and r['latency_ms'] > 0


def test_profile_graph_writes_trace(quantized, tmp_path):
    g, _ = quantized
    logdir = str(tmp_path / 'prof')
    profile_graph(g, logdir, iters=2)
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, 'profiler wrote no trace files'
