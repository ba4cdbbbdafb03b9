"""Pallas-vs-jnp kernel parity tests (reference pattern:
tests/test_cuda_kernel.py — randomized reference-vs-kernel equality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppq_tpu.core import RoundingPolicy
from ppq_tpu.kernels import (pallas_histogram, pallas_linear_quant,
                             pallas_linear_quant_bwd)
from ppq_tpu.quantization.rounding import round_tensor

RNG = np.random.RandomState(42)


def ref_quant(x, s, o, qmin, qmax, rounding, axis=None):
    x = jnp.asarray(x)
    s = jnp.asarray(s, jnp.float32)
    o = jnp.round(jnp.asarray(o, jnp.float32))
    if axis is not None:
        shape = [1] * x.ndim
        shape[axis] = -1
        s = s.reshape(shape)
        o = o.reshape(shape)
    q = jnp.clip(round_tensor(x / s, rounding) + o, qmin, qmax)
    return (q - o) * s


@pytest.mark.parametrize('shape', [(37,), (4, 61), (2, 8, 9, 11), (4096,)])
@pytest.mark.parametrize('rounding', [RoundingPolicy.ROUND_HALF_EVEN,
                                      RoundingPolicy.ROUND_HALF_UP])
def test_tensorwise_fwd_parity(shape, rounding):
    x = RNG.randn(*shape).astype(np.float32) * 3
    s, o = 0.05, 0.0
    got = pallas_linear_quant(x, s, o, -128, 127, rounding)
    want = ref_quant(x, s, o, -128, 127, rounding)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize('axis,shape', [(0, (16, 3, 5, 5)), (1, (2, 12, 7)),
                                        (3, (2, 3, 4, 9))])
def test_channelwise_fwd_parity(axis, shape):
    x = RNG.randn(*shape).astype(np.float32) * 2
    c = shape[axis]
    s = (RNG.rand(c) * 0.1 + 0.01).astype(np.float32)
    o = np.zeros(c, np.float32)
    got = pallas_linear_quant(x, s, o, -128, 127,
                              RoundingPolicy.ROUND_HALF_EVEN, axis)
    want = ref_quant(x, s, o, -128, 127, RoundingPolicy.ROUND_HALF_EVEN, axis)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_asymmetric_fwd_parity():
    x = np.abs(RNG.randn(333).astype(np.float32))
    s, o = 0.02, -128.0
    got = pallas_linear_quant(x, s, o, -128, 127,
                              RoundingPolicy.ROUND_HALF_EVEN)
    want = ref_quant(x, s, o, -128, 127, RoundingPolicy.ROUND_HALF_EVEN)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _ref_bwd(x, g, s, o, qmin, qmax, axis=None):
    """Autodiff through the jnp custom-vjp reference path."""
    from ppq_tpu.quantization.qfunction import linear_fake_quant

    def f(x_, s_, o_):
        return jnp.sum(linear_fake_quant(
            x_, s_, o_, qmin, qmax, RoundingPolicy.ROUND_HALF_EVEN,
            channel_axis=axis) * g)

    return jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(s, jnp.float32),
        jnp.asarray(o, jnp.float32))


def test_tensorwise_bwd_parity():
    x = RNG.randn(1000).astype(np.float32) * 4
    g = RNG.randn(1000).astype(np.float32)
    s, o = np.float32(0.05), np.float32(0.0)
    dx, ds, do = pallas_linear_quant_bwd(
        x, g, s, o, -128, 127, RoundingPolicy.ROUND_HALF_EVEN)
    rdx, rds, rdo = _ref_bwd(x, g, s, o, -128, 127)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), atol=1e-6)
    np.testing.assert_allclose(float(ds), float(rds), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(do), float(rdo), rtol=1e-4, atol=1e-3)


def test_channelwise_bwd_parity():
    x = RNG.randn(6, 3, 5, 5).astype(np.float32) * 2
    g = RNG.randn(6, 3, 5, 5).astype(np.float32)
    s = (RNG.rand(6) * 0.1 + 0.02).astype(np.float32)
    o = np.zeros(6, np.float32)
    dx, ds, do = pallas_linear_quant_bwd(
        x, g, s, o, -128, 127, RoundingPolicy.ROUND_HALF_EVEN,
        channel_axis=0)
    rdx, rds, rdo = _ref_bwd(x, g, s, o, -128, 127, axis=0)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(rds),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(do), np.asarray(rdo),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize('bins', [256, 2048, 4096])
def test_histogram_parity(bins):
    x = RNG.randn(10000).astype(np.float32)
    scale = float(np.abs(x).max()) / bins
    got = np.asarray(pallas_histogram(x, scale, bins))
    idx = np.clip((np.abs(x) / scale).astype(np.int64), 0, bins - 1)
    want = np.bincount(idx, minlength=bins).astype(np.float64)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == x.size


def test_flag_switches_qfunction():
    from ppq_tpu.core.config import PPQ_TPU_CONFIG
    from ppq_tpu.quantization.qfunction import linear_fake_quant
    x = RNG.randn(300).astype(np.float32)
    base = np.asarray(linear_fake_quant(x, 0.1, 0.0, -128, 127))
    PPQ_TPU_CONFIG.USING_PALLAS_KERNEL = True
    try:
        via_pallas = np.asarray(linear_fake_quant(x, 0.1, 0.0, -128, 127))
    finally:
        PPQ_TPU_CONFIG.USING_PALLAS_KERNEL = False
    np.testing.assert_array_equal(base, via_pallas)


class TestFloatingKernel:
    """FP8 Pallas kernel parity vs the jnp bit-math reference
    (reference csrc/cuda/floating.cu QuantizeTensor_FT/FC)."""

    def _ref(self, x, scale, e, m, qmin, qmax, axis=None):
        from ppq_tpu.quantization.qfunction import (_broadcast_shape,
                                                    _generic_float_round)
        import jax.numpy as jnp
        x = jnp.asarray(x, jnp.float32)
        s = _broadcast_shape(jnp.asarray(scale, jnp.float32), x.ndim, axis)
        scaled = jnp.clip(x / s, qmin, qmax)
        return np.asarray(_generic_float_round(scaled, e, m) * s)

    @pytest.mark.parametrize('e,m,qmin,qmax', [(4, 3, -448.0, 448.0),
                                               (5, 2, -57344.0, 57344.0),
                                               (3, 4, -15.5, 15.5)])
    def test_tensorwise_parity(self, e, m, qmin, qmax):
        from ppq_tpu.kernels import pallas_floating_quant
        rng = np.random.RandomState(e * 10 + m)
        x = (rng.randn(1000) * 30).astype(np.float32)
        got = np.asarray(pallas_floating_quant(x, 0.5, e, m, qmin, qmax))
        ref = self._ref(x, 0.5, e, m, qmin, qmax)
        np.testing.assert_array_equal(got, ref)

    def test_channelwise_parity(self):
        from ppq_tpu.kernels import pallas_floating_quant
        rng = np.random.RandomState(0)
        x = (rng.randn(6, 50) * 20).astype(np.float32)
        scale = (rng.rand(6) + 0.2).astype(np.float32)
        got = np.asarray(pallas_floating_quant(
            x, scale, 4, 3, -448.0, 448.0, channel_axis=0))
        ref = self._ref(x, scale, 4, 3, -448.0, 448.0, axis=0)
        np.testing.assert_array_equal(got, ref)

    def test_subnormals_snap_to_grid(self):
        from ppq_tpu.kernels import pallas_floating_quant
        # e4m3: min normal 2^-6, min subnormal 2^-9
        xs = np.asarray([2.0**-9, 1.4 * 2.0**-9, 2.0**-10, 2.0**-20, 0.0],
                        np.float32)
        got = np.asarray(pallas_floating_quant(xs, 1.0, 4, 3, -448., 448.))
        grid = 2.0**-9
        np.testing.assert_allclose(got, np.round(xs / grid) * grid,
                                   atol=1e-12)

    def test_bwd_ste_clip_mask(self):
        from ppq_tpu.kernels import pallas_floating_quant_bwd
        x = np.asarray([-1000.0, -10.0, 0.0, 10.0, 1000.0], np.float32)
        g = np.ones_like(x)
        dx = np.asarray(pallas_floating_quant_bwd(x, g, 1.0, -448., 448.))
        np.testing.assert_array_equal(dx, [0.0, 1.0, 1.0, 1.0, 0.0])

    def test_qfunction_routes_through_pallas_flag(self):
        from ppq_tpu.api import ENABLE_PALLAS_KERNEL
        from ppq_tpu.quantization.qfunction import floating_fake_quant
        rng = np.random.RandomState(3)
        x = (rng.randn(64) * 10).astype(np.float32)
        base = np.asarray(floating_fake_quant(x, 1.0, 3, 4, -15.5, 15.5))
        with ENABLE_PALLAS_KERNEL():
            pk = np.asarray(floating_fake_quant(x, 1.0, 3, 4, -15.5, 15.5))
        np.testing.assert_array_equal(base, pk)
