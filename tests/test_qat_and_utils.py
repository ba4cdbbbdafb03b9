"""QAT module and utils tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppq_tpu.utils import (EMARecorder, batch_random_fetch,
                           channel_random_fetch, tensor_random_fetch)


class TestFetch:
    def test_tensor_random_fetch_deterministic(self):
        x = np.random.RandomState(0).randn(4, 16, 8)
        a = tensor_random_fetch(x, 128)
        b = tensor_random_fetch(x, 128)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (128,)

    def test_channel_random_fetch(self):
        x = np.random.RandomState(0).randn(6, 50)
        out = channel_random_fetch(x, 32, channel_axis=0)
        assert out.shape == (6, 32)

    def test_batch_random_fetch(self):
        x = np.random.RandomState(0).randn(3, 4, 4)
        out = batch_random_fetch(x, 8)
        assert out.shape == (3, 8)


def test_ema():
    r = EMARecorder(beta=0.9)
    r.push(1.0)
    assert r.value == 1.0
    r.push(0.0)
    assert abs(r.value - 0.9) < 1e-9


class TestQAT:
    def test_qdense_calibrate_then_train(self):
        flax = pytest.importorskip('flax')
        from ppq_tpu.qat import CALIBRATE, TRAIN, QATController, QDense

        x = jnp.asarray(np.random.RandomState(0).randn(8, 16)
                        .astype(np.float32))
        model_cal = QDense(features=4, mode=CALIBRATE)
        variables = model_cal.init(jax.random.PRNGKey(0), x)

        ctrl = QATController()
        variables = ctrl.calibrate(model_cal.apply, variables, [x])
        scale = variables['params']['act_scale']
        assert float(scale) > 0 and float(scale) != 1.0

        model_tr = QDense(features=4, mode=TRAIN)
        y = model_tr.apply(variables, x)
        assert y.shape == (8, 4)
        assert np.isfinite(np.asarray(y)).all()

        # gradient flows through fake-quant (STE)
        def loss(v):
            return jnp.mean(model_tr.apply(v, x) ** 2)
        g = jax.grad(lambda p: loss({**variables, 'params': p}))(
            variables['params'])
        knorm = float(jnp.sum(jnp.abs(g['kernel'])))
        assert knorm > 0

    def test_qconv_runs(self):
        flax = pytest.importorskip('flax')
        from ppq_tpu.qat import TRAIN, QConv
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3)
                        .astype(np.float32))
        model = QConv(features=4, kernel_size=(3, 3), mode=TRAIN)
        variables = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(variables, x)
        assert y.shape == (2, 8, 8, 4)
