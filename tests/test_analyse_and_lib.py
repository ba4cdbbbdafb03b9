"""Analysis tools + PFL lib tests."""

import numpy as np

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu import lib as PFL
from ppq_tpu.quantization.analyse import (graphwise_error_analyse,
                                          layerwise_error_analyse,
                                          parameter_analyse,
                                          statistical_analyse,
                                          variable_analyse)
from ppq_tpu.zoo.vision import tiny_cnn


def build():
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(9)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(graph, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return graph, loader


def test_graphwise_error_analyse():
    graph, loader = build()
    report = graphwise_error_analyse(graph, loader, steps=2, verbose=False)
    assert report
    assert all(np.isfinite(v) for v in report.values())
    assert all(0 <= v < 0.5 for v in report.values()), report


def test_layerwise_error_analyse():
    graph, loader = build()
    report = layerwise_error_analyse(graph, loader, steps=2, verbose=False)
    assert report
    assert all(v < 0.5 for v in report.values()), report
    # after analysis, graph must still be quantized (restored)
    from ppq_tpu.core import QuantizationStates
    from ppq_tpu.ir import QuantableOperation
    states = [c.state for op in graph.operations.values()
              if isinstance(op, QuantableOperation) for c in op.config]
    assert any(s in {QuantizationStates.ACTIVATED, QuantizationStates.BAKED,
                     QuantizationStates.OVERLAPPED} for s in states)


def test_statistical_and_parameter_analyse():
    graph, loader = build()
    recs = statistical_analyse(graph, loader, steps=2)
    assert recs and all('std' in r for r in recs)
    params = parameter_analyse(graph)
    assert params and all('shape' in p for p in params)
    name = next(iter(graph.outputs))
    hist = variable_analyse(graph, name, loader, steps=2)
    assert hist.sum() > 0


def test_pfl_factories():
    graph, _ = build()
    q = PFL.Quantizer(TargetPlatform.TPU_INT8, graph)
    assert q.target_platform == TargetPlatform.TPU_INT8
    d = PFL.Dispatcher(graph, 'conservative')
    table = d.dispatch()
    assert table
    e = PFL.Exporter(TargetPlatform.TPU_INT8)
    assert e is not None
    cfg = PFL.LinearQuantizationConfig(channel_axis=0)
    assert cfg.policy.per_channel
    fcfg = PFL.FloatingQuantizationConfig()
    assert fcfg.exponent_bits == 4
    obs = PFL.Observer(cfg)
    assert obs is not None


def test_pfl_quant_function():
    import jax.numpy as jnp
    cfg = PFL.LinearQuantizationConfig()
    cfg.scale = np.float32(0.1)
    cfg.offset = np.float32(0.0)
    from ppq_tpu.core import QuantizationStates
    cfg.state = QuantizationStates.ACTIVATED
    x = jnp.asarray(np.random.randn(64).astype(np.float32))
    y = np.asarray(PFL.QuantFunction(x, cfg))
    np.testing.assert_allclose(y, np.clip(np.round(np.asarray(x) / 0.1),
                                          -128, 127) * 0.1, atol=1e-6)


def test_quantzoo_error_analyse():
    """OnnxQuant protocol: AQE <= MQE, relative errors small on a
    calibrated graph, graph restored to quantized state afterwards."""
    from ppq_tpu.quantization.analyse import quantzoo_error_analyse
    graph, loader = build()
    r = quantzoo_error_analyse(graph, loader, steps=2, verbose=False)
    assert set(r) == {'AQE', 'MQE', 'OQE', 'per_layer'}
    assert r['per_layer'], 'no computing layers found'
    assert 0 <= r['AQE'] <= r['MQE'] < 0.5, r
    assert 0 <= r['OQE'] < 0.5, r
    # relative error of each layer matches its per-layer entry count
    from ppq_tpu.ir import QuantableOperation
    n_computing = sum(1 for op in graph.operations.values()
                      if isinstance(op, QuantableOperation)
                      and op.type in ('Conv', 'Gemm', 'MatMul'))
    assert len(r['per_layer']) == n_computing
    # graph must still be quantized (restored after the fp32 twin ran)
    from ppq_tpu.core import QuantizationStates
    states = [c.state for op in graph.operations.values()
              if isinstance(op, QuantableOperation) for c in op.config]
    assert any(s == QuantizationStates.ACTIVATED for s in states)
