"""fuse_gelu / fuse_layernorm numerics + dynamic quantization."""

import numpy as np

from ppq_tpu import TPUExecutor
from ppq_tpu import lib as PFL
from ppq_tpu.core import QuantizationStates
from ppq_tpu.ir import fuse_gelu, fuse_layernorm
from ppq_tpu.zoo.builder import NetBuilder


def test_fuse_layernorm_numerics():
    """Decomposed mean/var normalize chain → one LayerNormalization op."""
    b = NetBuilder('ln', 0)
    x = b.input('x', [2, 6, 16])
    mean = b.op('ReduceMean', [x], axes=[-1], keepdims=1)
    centered = b.op('Sub', [x, mean])
    sq = b.op('Pow', [centered, b.param(np.asarray(2.0))])
    var = b.op('ReduceMean', [sq], axes=[-1], keepdims=1)
    denom = b.op('Sqrt', [b.op('Add', [var, b.param(np.asarray(1e-5))])])
    normed = b.op('Div', [centered, denom])
    scaled = b.op('Mul', [normed, b.param(b.rng.rand(16) + 0.5)])
    out = b.op('Add', [scaled, b.param(b.rng.randn(16) * 0.1)])
    b.output(out)
    g = b.g
    xin = np.random.RandomState(1).randn(2, 6, 16).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xin)[0])

    fuse_layernorm(g)
    types = {op.type for op in g.operations.values()}
    assert 'LayerNormalization' in types, types
    assert 'ReduceMean' not in types
    out2 = np.asarray(TPUExecutor(g).forward(xin)[0])
    np.testing.assert_allclose(out2, ref, rtol=1e-4, atol=1e-5)


def test_fuse_gelu_numerics():
    """x * 0.5 * (1 + erf(x/sqrt(2))) chain → Gelu op."""
    b = NetBuilder('gelu', 2)
    x = b.input('x', [4, 16])
    div = b.op('Div', [x, b.param(np.asarray(np.sqrt(2.0)))])
    erf = b.op('Erf', [div])
    add = b.op('Add', [erf, b.param(np.asarray(1.0))])
    mul = b.op('Mul', [x, add])
    out = b.op('Mul', [mul, b.param(np.asarray(0.5))])
    b.output(out)
    g = b.g
    xin = np.random.RandomState(2).randn(4, 16).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(xin)[0])

    fuse_gelu(g)
    types = {op.type for op in g.operations.values()}
    assert 'Gelu' in types, types
    assert 'Erf' not in types
    out2 = np.asarray(TPUExecutor(g).forward(xin)[0])
    np.testing.assert_allclose(out2, ref, rtol=1e-4, atol=1e-5)


def test_dynamic_quantization_policy():
    """DYNAMIC policy computes scales from the tensor at runtime — no
    calibration needed, quant error still bounded."""
    import jax.numpy as jnp
    from ppq_tpu.quantization.qfunction import ppq_fake_quant
    cfg = PFL.LinearQuantizationConfig(dynamic=True)
    cfg.state = QuantizationStates.ACTIVATED
    x = np.random.RandomState(3).randn(256).astype(np.float32) * 3
    y = np.asarray(ppq_fake_quant(jnp.asarray(x), cfg))
    err = np.abs(y - x).max()
    step = np.abs(x).max() / 127
    assert err <= step * 0.51 + 1e-6, (err, step)
