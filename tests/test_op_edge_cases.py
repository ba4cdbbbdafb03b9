"""Op-table edge cases flagged in round-1 review: LSTM sequence_lens /
activations / clip, ONNX-standard Expand broadcasting, GatherND
batch_dims."""

import numpy as np
import pytest

from ppq_tpu import TPUExecutor
from ppq_tpu.zoo.builder import NetBuilder


# --------------------------------------------------------------- helpers ---
def run_op(op_type, inputs, n_out=1, input_shapes=None, **attrs):
    b = NetBuilder(op_type.lower(), 0)
    feed = {}
    graph_inputs = []
    for i, v in enumerate(inputs):
        if isinstance(v, np.ndarray) and v.dtype in (np.float32, np.float64):
            name = f'in{i}'
            graph_inputs.append(b.input(name, list(v.shape)))
            feed[name] = v.astype(np.float32)
        else:
            graph_inputs.append(b.param(np.asarray(v)))
    outs = b.op(op_type, graph_inputs, n_out=n_out, **attrs)
    if n_out == 1:
        outs = [outs]
    for o in outs:
        b.output(o)
    res = TPUExecutor(b.g).forward(feed)
    return [np.asarray(r) for r in res]


# ------------------------------------------------------------------ Expand -
def test_expand_standard_broadcast():
    x = np.random.RandomState(0).randn(3, 1).astype(np.float32)
    out, = run_op('Expand', [x, np.asarray([2, 1, 4], np.int64)])
    assert out.shape == (2, 3, 4)
    np.testing.assert_allclose(out, np.broadcast_to(x, (2, 3, 4)))


def test_expand_shape_one_keeps_dim():
    x = np.random.RandomState(1).randn(2, 5).astype(np.float32)
    out, = run_op('Expand', [x, np.asarray([1, 1], np.int64)])
    np.testing.assert_allclose(out, x)


# ----------------------------------------------------------------- GatherND -
def test_gathernd_batch_dims_1():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 5).astype(np.float32)
    idx = np.asarray([[[1], [3]], [[0], [2]]], np.int64)   # (2, 2, 1)
    out, = run_op('GatherND', [x, idx], batch_dims=1)
    expect = np.stack([x[0][[1, 3]], x[1][[0, 2]]])
    assert out.shape == (2, 2, 5)
    np.testing.assert_allclose(out, expect)


def test_gathernd_batch_dims_2():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 4, 6).astype(np.float32)
    idx = rng.randint(0, 4, (2, 3, 1)).astype(np.int64)    # (2, 3, 1)
    out, = run_op('GatherND', [x, idx], batch_dims=2)
    expect = np.empty((2, 3, 6), np.float32)
    for i in range(2):
        for j in range(3):
            expect[i, j] = x[i, j, idx[i, j, 0]]
    np.testing.assert_allclose(out, expect)


# -------------------------------------------------------------------- LSTM --
def _np_lstm(x, w, r, b, seq_lens, h0, c0, acts=('sigmoid', 'tanh', 'tanh'),
             clip=None):
    """Plain-numpy ONNX LSTM (forward dir) for ground truth."""
    fmap = {'sigmoid': lambda v: 1 / (1 + np.exp(-v)),
            'tanh': np.tanh, 'relu': lambda v: np.maximum(v, 0)}
    f_a, g_a, h_a = (fmap[a] for a in acts)
    T, N, _ = x.shape
    H = r.shape[-1]
    wb, rb = b[:4 * H], b[4 * H:]
    h, c = h0.copy(), c0.copy()
    ys = np.zeros((T, N, H), np.float32)
    for t in range(T):
        gates = x[t] @ w.T + wb + h @ r.T + rb
        if clip is not None:
            gates = np.clip(gates, -clip, clip)
        i, o, f, g = np.split(gates, 4, axis=-1)
        i, o, f, g = f_a(i), f_a(o), f_a(f), g_a(g)
        c_new = f * c + i * g
        h_new = o * h_a(c_new)
        for n in range(N):
            if seq_lens is None or t < seq_lens[n]:
                h[n], c[n] = h_new[n], c_new[n]
                ys[t, n] = h_new[n]
    return ys, h, c


def _lstm_case(T=5, N=3, I=4, H=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(T, N, I).astype(np.float32)
    w = (rng.randn(1, 4 * H, I) * 0.4).astype(np.float32)
    r = (rng.randn(1, 4 * H, H) * 0.4).astype(np.float32)
    b = (rng.randn(1, 8 * H) * 0.2).astype(np.float32)
    return x, w, r, b


def test_lstm_sequence_lens_masks_states_and_outputs():
    x, w, r, b = _lstm_case()
    seq = np.asarray([5, 3, 1], np.int32)
    y, yh, yc = run_op('LSTM', [x, w, r, b, seq], n_out=3, hidden_size=3)
    ys_ref, h_ref, c_ref = _np_lstm(x, w[0], r[0], b[0], seq,
                                    np.zeros((3, 3), np.float32),
                                    np.zeros((3, 3), np.float32))
    np.testing.assert_allclose(y[:, 0], ys_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh[0], h_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yc[0], c_ref, rtol=1e-4, atol=1e-5)
    # outputs past each sample's length are exactly zero
    assert np.all(y[3:, 0, 1] == 0) and np.all(y[1:, 0, 2] == 0)


def test_lstm_reverse_direction_with_sequence_lens():
    """Reverse direction reverses only the valid prefix of each sample."""
    x, w, r, b = _lstm_case(seed=4)
    w2 = np.concatenate([w, w * 0.5])
    r2 = np.concatenate([r, r * 0.5])
    b2 = np.concatenate([b, b * 0.5])
    seq = np.asarray([5, 3, 1], np.int32)
    y, yh, yc = run_op('LSTM', [x, w2, r2, b2, seq], n_out=3, hidden_size=3,
                       direction='bidirectional')
    # reverse channel ground truth: run forward-numpy on the reversed
    # valid prefix, then un-reverse
    T, N = 5, 3
    xrev = x.copy()
    for n in range(N):
        L = seq[n]
        xrev[:L, n] = x[:L, n][::-1]
    ys_r, h_r, _ = _np_lstm(xrev, w2[1], r2[1], b2[1], seq,
                            np.zeros((3, 3), np.float32),
                            np.zeros((3, 3), np.float32))
    ys_back = ys_r.copy()
    for n in range(N):
        L = seq[n]
        ys_back[:L, n] = ys_r[:L, n][::-1]
    np.testing.assert_allclose(y[:, 1], ys_back, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh[1], h_r, rtol=1e-4, atol=1e-5)


def test_lstm_custom_activations_and_clip():
    x, w, r, b = _lstm_case(seed=7)
    y, yh, yc = run_op('LSTM', [x, w, r, b], n_out=3, hidden_size=3,
                       activations=['Sigmoid', 'Relu', 'Relu'], clip=0.8)
    ys_ref, h_ref, c_ref = _np_lstm(
        x, w[0], r[0], b[0], None, np.zeros((3, 3), np.float32),
        np.zeros((3, 3), np.float32), acts=('sigmoid', 'relu', 'relu'),
        clip=0.8)
    np.testing.assert_allclose(y[:, 0], ys_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh[0], h_ref, rtol=1e-4, atol=1e-5)


def test_lstm_no_seq_lens_unchanged():
    """Full-length seq_lens must equal the unmasked path."""
    x, w, r, b = _lstm_case(seed=9)
    y1, _, _ = run_op('LSTM', [x, w, r, b], n_out=3, hidden_size=3)
    seq = np.full(3, 5, np.int32)
    y2, _, _ = run_op('LSTM', [x, w, r, b, seq], n_out=3, hidden_size=3)
    np.testing.assert_allclose(y1, y2, rtol=1e-6)


def test_nxp_platform_resize_forced_nearest():
    """NXP platform table overrides Resize to nearest regardless of the
    onnx mode (reference op/torch/nxp.py)."""
    from ppq_tpu.core import TargetPlatform
    from ppq_tpu.executor.base import resolve_forward
    from ppq_tpu.executor.ops.default import Resize_forward
    fn = resolve_forward(TargetPlatform.NXP_INT8, 'Resize')
    assert fn is not Resize_forward

    b = NetBuilder('nxpresize', 0)
    x = b.input('x', [1, 1, 2, 2])
    y = b.op('Resize', [x, b.param(np.zeros(0, np.float32)),
                        b.param(np.asarray([1, 1, 2, 2], np.float32))],
             mode='linear')
    b.output(y)
    for op in b.g.operations.values():
        op.platform = TargetPlatform.NXP_INT8
    xin = np.asarray([[[[0.0, 1.0], [2.0, 3.0]]]], np.float32)
    out = np.asarray(TPUExecutor(b.g).forward(xin)[0])
    # nearest upsample duplicates values — no interpolated fractions
    assert set(np.unique(out)) <= {0.0, 1.0, 2.0, 3.0}, out
