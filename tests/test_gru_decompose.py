"""GRU decomposition parity: decompose_gru must yield a GRU-free graph whose
outputs match the native GRU op (reference ppq/IR/morph.py:1157)."""

import numpy as np
import pytest

from ppq_tpu import TPUExecutor
from ppq_tpu.ir import decompose_gru
from ppq_tpu.zoo.builder import NetBuilder


def _build_gru(T=4, N=2, I=5, H=3, lbr=0, with_bias=True, with_h0=True,
               seed=0):
    rng = np.random.RandomState(seed)
    b = NetBuilder('gru', seed)
    x = b.input('x', [T, N, I])
    inputs = [x,
              b.param(rng.randn(1, 3 * H, I) * 0.4),
              b.param(rng.randn(1, 3 * H, H) * 0.4)]
    if with_bias:
        inputs.append(b.param(rng.randn(1, 6 * H) * 0.2))
    if with_h0:
        if not with_bias:
            inputs.append(b.param(np.zeros((1, 6 * H), np.float32)))
        # skip sequence_lens slot with an empty placeholder (the parser's
        # convention for '' optional inputs: valueless parameter variable)
        empty = b.g.create_variable(name='seq_lens_empty', is_parameter=True)
        inputs.append(empty)
        inputs.append(b.param(rng.randn(1, N, H) * 0.5))
    y, yh = b.op('GRU', inputs, n_out=2, hidden_size=H,
                 linear_before_reset=lbr)
    b.output(y)
    b.output(yh)
    return b.g


@pytest.mark.parametrize('lbr', [0, 1])
@pytest.mark.parametrize('with_h0', [False, True])
def test_gru_decompose_parity(lbr, with_h0):
    g = _build_gru(lbr=lbr, with_h0=with_h0, seed=lbr * 10 + with_h0)
    x = np.random.RandomState(7).randn(4, 2, 5).astype(np.float32)
    y_ref, yh_ref = (np.asarray(v) for v in TPUExecutor(g).forward(x))
    decompose_gru(g)
    assert not any(op.type == 'GRU' for op in g.operations.values()), \
        'GRU op must be gone after decomposition'
    assert any(op.type == 'Gemm' for op in g.operations.values())
    y, yh = (np.asarray(v) for v in TPUExecutor(g).forward(x))
    assert y.shape == y_ref.shape and yh.shape == yh_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh, yh_ref, rtol=1e-4, atol=1e-5)


def test_gru_split_pass_end_to_end():
    """GRUSplitPass produces a GRU-free graph; result still quantizes and
    exports through the QDQ path."""
    from ppq_tpu.quantization.optim import GRUSplitPass
    g = _build_gru(T=3, N=1, I=4, H=4, lbr=1, seed=3)
    x = np.random.RandomState(1).randn(3, 1, 4).astype(np.float32)
    ref = np.asarray(TPUExecutor(g).forward(x)[0])
    GRUSplitPass().optimize(g)
    assert not any(op.type == 'GRU' for op in g.operations.values())
    out = np.asarray(TPUExecutor(g).forward(x)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_gru_decompose_skips_bidirectional():
    rng = np.random.RandomState(0)
    b = NetBuilder('bigru', 0)
    x = b.input('x', [4, 2, 5])
    H = 3
    y, yh = b.op('GRU', [x, b.param(rng.randn(2, 3 * H, 5) * 0.3),
                         b.param(rng.randn(2, 3 * H, H) * 0.3)],
                 n_out=2, hidden_size=H, direction='bidirectional')
    b.output(y)
    g = b.g
    decompose_gru(g)
    assert any(op.type == 'GRU' for op in g.operations.values()), \
        'bidirectional GRU must be left intact'
