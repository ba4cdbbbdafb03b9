"""Data-parallel calibration over the 8-device CPU mesh: sharded stats must
match the unsharded result exactly (minmax is associative)."""

import jax
import numpy as np
import pytest

from ppq_tpu import TargetPlatform, dispatch_graph
from ppq_tpu.ir import format_graph
from ppq_tpu.quantization.optim import (CompiledCalibrationPass,
                                        ParameterQuantizePass)
from ppq_tpu.quantization.quantizer import TPUInt8Quantizer
from ppq_tpu.zoo import tiny_cnn


def _prepare(method='minmax'):
    g = format_graph(tiny_cnn(input_shape=(8, 3, 16, 16)))
    dispatch_graph(g, TargetPlatform.TPU_INT8)
    q = TPUInt8Quantizer(g)
    for name, op in list(g.operations.items()):
        if op.platform == q.target_platform and \
                op.type in q.quant_operation_types:
            q.quantize_operation(name)
    ParameterQuantizePass().optimize(g)
    for op in g.operations.values():
        from ppq_tpu.ir import QuantableOperation
        if isinstance(op, QuantableOperation):
            for var, cfg in op.config_pairs():
                if not var.is_parameter:
                    cfg.observer_algorithm = method
    return g


def _scales(g):
    from ppq_tpu.core import QuantizationStates
    from ppq_tpu.ir import QuantableOperation
    out = {}
    for op in g.operations.values():
        if not isinstance(op, QuantableOperation):
            continue
        for var, cfg in op.config_pairs():
            if var.is_parameter or not cfg.is_root:
                continue
            if cfg.state == QuantizationStates.ACTIVATED:
                out[var.name] = np.asarray(cfg.scale)
    return out


@pytest.mark.parametrize('method', ['minmax', 'kl'])
def test_dp_sharded_calibration_matches(method):
    if len(jax.devices()) < 2:
        pytest.skip('needs multiple devices')
    from ppq_tpu.parallel import make_mesh
    rng = np.random.RandomState(0)
    loader = [rng.randn(8, 3, 16, 16).astype(np.float32) for _ in range(3)]

    g1 = _prepare(method)
    CompiledCalibrationPass(calib_steps=3).optimize(g1, dataloader=loader)
    s1 = _scales(g1)

    mesh = make_mesh(dp=min(4, len(jax.devices())), tp=1)
    g2 = _prepare(method)
    CompiledCalibrationPass(calib_steps=3, mesh=mesh).optimize(
        g2, dataloader=loader)
    s2 = _scales(g2)

    assert set(s1) == set(s2) and len(s1) > 0
    for name in s1:
        np.testing.assert_allclose(s2[name], s1[name], rtol=1e-6,
                                   err_msg=name)
