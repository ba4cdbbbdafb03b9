"""Op-semantics parity vs torch ground truth.

The reference executor IS torch (ppq/executor/op/torch/default.py); our ops
are jnp redesigns. This battery checks the numerically-subtle ops against
torch's implementations with randomized shapes/attributes — deviations here
would silently corrupt every simulation above.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

from ppq_tpu.ir import Operation  # noqa: E402
from ppq_tpu.executor.ops.default import DEFAULT_BACKEND_TABLE  # noqa: E402

RNG = np.random.RandomState(0)


def run_op(op_type, inputs, **attrs):
    op = Operation(f't_{op_type}', op_type, attributes=attrs)

    class _V:
        def __init__(s):
            s.is_parameter = False
    op.inputs = [_V() for _ in inputs]
    op.outputs = []
    out = DEFAULT_BACKEND_TABLE[op_type](op, [np.asarray(v) for v in inputs],
                                         None)
    if isinstance(out, (tuple, list)):
        return [np.asarray(o) for o in out]
    return np.asarray(out)


@pytest.mark.parametrize('stride,pad,dil,group', [
    (1, 1, 1, 1), (2, 0, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4)])
def test_conv2d_vs_torch(stride, pad, dil, group):
    x = RNG.randn(2, 8, 13, 11).astype(np.float32)
    w = RNG.randn(12, 8 // group, 3, 3).astype(np.float32)
    b = RNG.randn(12).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride=stride, padding=pad,
                    dilation=dil, groups=group).numpy()
    got = run_op('Conv', [x, w, b], kernel_shape=[3, 3],
                 strides=[stride, stride], pads=[pad] * 4,
                 dilations=[dil, dil], group=group)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('stride,pad,outpad', [(2, 0, 0), (2, 1, 1),
                                               (3, 1, 0)])
def test_convtranspose_vs_torch(stride, pad, outpad):
    x = RNG.randn(1, 6, 7, 9).astype(np.float32)
    w = RNG.randn(6, 4, 3, 3).astype(np.float32)
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              stride=stride, padding=pad,
                              output_padding=outpad).numpy()
    got = run_op('ConvTranspose', [x, w], kernel_shape=[3, 3],
                 strides=[stride, stride], pads=[pad] * 4,
                 output_padding=[outpad, outpad], dilations=[1, 1], group=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_convtranspose_grouped_vs_torch():
    x = RNG.randn(1, 8, 6, 6).astype(np.float32)
    w = RNG.randn(8, 2, 2, 2).astype(np.float32)
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              stride=2, groups=2).numpy()
    got = run_op('ConvTranspose', [x, w], kernel_shape=[2, 2],
                 strides=[2, 2], pads=[0] * 4, dilations=[1, 1], group=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('ceil_mode', [0, 1])
def test_maxpool_vs_torch(ceil_mode):
    x = RNG.randn(2, 4, 11, 13).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x), 3, stride=2, padding=1,
                        ceil_mode=bool(ceil_mode)).numpy()
    got = run_op('MaxPool', [x], kernel_shape=[3, 3], strides=[2, 2],
                 pads=[1, 1, 1, 1], ceil_mode=ceil_mode)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('include_pad', [0, 1])
def test_avgpool_vs_torch(include_pad):
    x = RNG.randn(2, 4, 10, 10).astype(np.float32)
    want = F.avg_pool2d(torch.from_numpy(x), 3, stride=2, padding=1,
                        count_include_pad=bool(include_pad)).numpy()
    got = run_op('AveragePool', [x], kernel_shape=[3, 3], strides=[2, 2],
                 pads=[1, 1, 1, 1], count_include_pad=include_pad)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_nearest_vs_torch():
    x = RNG.randn(1, 3, 8, 8).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode='nearest').numpy()
    got = run_op('Resize', [x, np.zeros(0, np.float32),
                            np.array([1, 1, 2, 2], np.float32)],
                 mode='nearest', coordinate_transformation_mode='asymmetric')
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_vs_torch():
    x = RNG.randn(1, 3, 8, 8).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode='bilinear',
                         align_corners=False).numpy()
    got = run_op('Resize', [x, np.zeros(0, np.float32),
                            np.array([1, 1, 2, 2], np.float32)],
                 mode='linear',
                 coordinate_transformation_mode='half_pixel')
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lstm_vs_torch():
    T, B, I, H = 5, 2, 4, 6
    x = RNG.randn(T, B, I).astype(np.float32)
    lstm = torch.nn.LSTM(I, H)
    with torch.no_grad():
        want, (hn, cn) = lstm(torch.from_numpy(x))
    w_ih = lstm.weight_ih_l0.detach().numpy()     # (4H, I) torch gate order
    w_hh = lstm.weight_hh_l0.detach().numpy()
    b_ih = lstm.bias_ih_l0.detach().numpy()
    b_hh = lstm.bias_hh_l0.detach().numpy()

    def torch_to_onnx_gates(w):
        i, f, g, o = np.split(w, 4, axis=0)       # torch: i f g o
        return np.concatenate([i, o, f, g], axis=0)  # onnx: i o f c

    W = torch_to_onnx_gates(w_ih)[None]
    R = torch_to_onnx_gates(w_hh)[None]
    Bb = np.concatenate([torch_to_onnx_gates(b_ih),
                         torch_to_onnx_gates(b_hh)])[None]
    got = run_op('LSTM', [x, W, R, Bb], hidden_size=H, direction='forward')
    y = got[0].reshape(T, B, H)
    np.testing.assert_allclose(y, want.numpy(), rtol=1e-4, atol=1e-4)


def test_gru_vs_torch():
    T, B, I, H = 4, 2, 3, 5
    x = RNG.randn(T, B, I).astype(np.float32)
    gru = torch.nn.GRU(I, H)
    with torch.no_grad():
        want, hn = gru(torch.from_numpy(x))
    w_ih = gru.weight_ih_l0.detach().numpy()      # torch: r z n
    w_hh = gru.weight_hh_l0.detach().numpy()
    b_ih = gru.bias_ih_l0.detach().numpy()
    b_hh = gru.bias_hh_l0.detach().numpy()

    def to_onnx(w):
        r, z, n = np.split(w, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)  # onnx: z r h

    W = to_onnx(w_ih)[None]
    R = to_onnx(w_hh)[None]
    Bb = np.concatenate([to_onnx(b_ih), to_onnx(b_hh)])[None]
    got = run_op('GRU', [x, W, R, Bb], hidden_size=H, direction='forward',
                 linear_before_reset=1)
    y = got[0].reshape(T, B, H)
    np.testing.assert_allclose(y, want.numpy(), rtol=1e-4, atol=1e-4)


def test_layernorm_vs_torch():
    x = RNG.randn(2, 5, 16).astype(np.float32)
    g = RNG.rand(16).astype(np.float32) + 0.5
    b = RNG.randn(16).astype(np.float32)
    want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(g),
                        torch.from_numpy(b)).numpy()
    got = run_op('LayerNormalization', [x, g, b], axis=-1, epsilon=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gelu_vs_torch():
    x = RNG.randn(128).astype(np.float32)
    want = F.gelu(torch.from_numpy(x)).numpy()
    got = run_op('Gelu', [x])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_softmax_grid_sample_roialign_exist():
    x = RNG.randn(2, 8).astype(np.float32)
    want = F.softmax(torch.from_numpy(x), dim=-1).numpy()
    got = run_op('Softmax', [x], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_prelu_vs_torch():
    x = RNG.randn(2, 6, 5, 5).astype(np.float32)
    slope = (RNG.rand(1, 6, 1, 1).astype(np.float32) * 0.5)
    got = run_op('PRelu', [x, slope])
    ref = F.prelu(torch.from_numpy(x),
                  torch.from_numpy(slope.reshape(-1))).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_hardswish_hardsigmoid_vs_torch():
    x = (RNG.randn(3, 17).astype(np.float32) * 4)
    np.testing.assert_allclose(
        run_op('HardSwish', [x]),
        F.hardswish(torch.from_numpy(x)).numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        run_op('HardSigmoid', [x], alpha=1 / 6, beta=0.5),
        F.hardsigmoid(torch.from_numpy(x)).numpy(), rtol=1e-5, atol=1e-6)


def test_instancenorm_vs_torch():
    x = RNG.randn(2, 4, 9, 7).astype(np.float32)
    w = RNG.rand(4).astype(np.float32) + 0.5
    b = RNG.randn(4).astype(np.float32)
    got = run_op('InstanceNormalization', [x, w, b], epsilon=1e-5)
    ref = F.instance_norm(torch.from_numpy(x), weight=torch.from_numpy(w),
                          bias=torch.from_numpy(b), eps=1e-5).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_space_depth_roundtrip_vs_torch():
    x = RNG.randn(2, 4, 6, 6).astype(np.float32)
    s2d = run_op('SpaceToDepth', [x], blocksize=2)
    ref = F.pixel_unshuffle(torch.from_numpy(x), 2).numpy()
    # ONNX SpaceToDepth uses DCR-style ordering; torch pixel_unshuffle is
    # CRD — both must invert through their own inverse exactly
    d2s = run_op('DepthToSpace', [s2d], blocksize=2, mode='DCR')
    np.testing.assert_allclose(d2s, x, atol=0)
    assert s2d.shape == ref.shape


def test_channel_shuffle_vs_torch():
    x = RNG.randn(2, 8, 4, 4).astype(np.float32)
    got = run_op('ChannelShuffle', [x], group=4)
    ref = torch.channel_shuffle(torch.from_numpy(x), 4).numpy()
    np.testing.assert_allclose(got, ref, atol=0)
