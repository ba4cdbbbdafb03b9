"""Quantization math tests: rounding policies (golden decimal reference, cf.
reference tests/test_rounding.py), linear/floating fake quant numerics, STE &
LSQ gradients, observers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppq_tpu.core import (QP, QuantizationPolicy, QuantizationStates,
                          RoundingPolicy, TensorQuantizationConfig)
from ppq_tpu.quantization import (build_observer, dynamic_linear_fake_quant,
                                  floating_fake_quant, linear_fake_quant,
                                  minmax_to_scale_offset, ppq_fake_quant,
                                  ppq_quant_toint, round_scalar, round_tensor,
                                  snr_error)

SYM_PT = QuantizationPolicy(QP.PER_TENSOR | QP.LINEAR | QP.SYMMETRICAL)
ASYM_PT = QuantizationPolicy(QP.PER_TENSOR | QP.LINEAR | QP.ASYMMETRICAL)
SYM_PC = QuantizationPolicy(QP.PER_CHANNEL | QP.LINEAR | QP.SYMMETRICAL)


class TestRounding:
    def test_all_policies_match_decimal_golden(self):
        values = [0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999, -0.49999,
                  3.2, -3.2, 7.5, -7.5, 0.0, 100.5]
        for policy in RoundingPolicy:
            got = np.asarray(round_tensor(jnp.asarray(values, jnp.float32), policy))
            want = [round_scalar(v, policy) for v in values]
            np.testing.assert_array_equal(
                got, np.asarray(want, np.float32),
                err_msg=f'policy {policy.name}')

    def test_half_even_ties(self):
        x = jnp.asarray([0.5, 1.5, 2.5, 3.5], jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(round_tensor(x, RoundingPolicy.ROUND_HALF_EVEN)),
            [0.0, 2.0, 2.0, 4.0])


class TestLinearFakeQuant:
    def test_identity_on_grid(self):
        # values exactly on the quant grid must be unchanged
        scale = 0.5
        x = jnp.asarray([-64.0, -0.5, 0.0, 0.5, 63.5], jnp.float32)
        y = linear_fake_quant(x, scale, 0.0, -128, 127)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))

    def test_clipping(self):
        y = linear_fake_quant(jnp.asarray([1000.0, -1000.0]), 1.0, 0.0, -128, 127)
        np.testing.assert_allclose(np.asarray(y), [127.0, -128.0])

    def test_manual_example(self):
        # x=0.3, s=0.1 -> q=3 -> y=0.3 ; x=0.34 -> q=3 -> 0.3
        y = linear_fake_quant(jnp.asarray([0.3, 0.34, 0.36]), 0.1, 0.0, -128, 127)
        np.testing.assert_allclose(np.asarray(y), [0.3, 0.3, 0.4], atol=1e-6)

    def test_asymmetric_offset(self):
        # uint8-style: range [0, 255], offset shifts zero point
        y = linear_fake_quant(jnp.asarray([-0.5, 0.0, 1.0]), 1.0, 128.0, 0, 255)
        # q = round(x) + 128 clip [0,255]; y = (q-128)*1
        np.testing.assert_allclose(np.asarray(y), [-0.5 + 0.5, 0.0, 1.0])

    def test_per_channel(self):
        x = jnp.ones((2, 3), jnp.float32)
        scale = jnp.asarray([1.0, 0.5, 0.25])
        y = linear_fake_quant(x, scale, jnp.zeros(3), -128, 127, channel_axis=1)
        np.testing.assert_allclose(np.asarray(y), np.ones((2, 3)))
        # sub-grid value rounds per channel
        x2 = jnp.full((1, 3), 0.3, jnp.float32)
        y2 = linear_fake_quant(x2, scale, jnp.zeros(3), -128, 127, channel_axis=1)
        np.testing.assert_allclose(np.asarray(y2), [[0.0, 0.5, 0.25]], atol=1e-6)

    def test_ste_gradient_masks_clipped(self):
        def loss(x):
            return jnp.sum(linear_fake_quant(x, 1.0, 0.0, -128, 127))
        g = jax.grad(loss)(jnp.asarray([0.2, 500.0, -500.0, 100.0]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 0.0, 0.0, 1.0])

    def test_lsq_scale_gradient(self):
        # LSQ: d/ds of (q - x/s) inside range; at x on-grid the grad is 0,
        # off-grid it equals (q - x/s)
        def loss(s):
            return jnp.sum(linear_fake_quant(
                jnp.asarray([0.34]), s, jnp.asarray(0.0), -128, 127))
        g = jax.grad(loss)(jnp.asarray(0.1))
        # q = 3, x/s = 3.4 -> ds = 3 - 3.4 = -0.4
        np.testing.assert_allclose(float(g), -0.4, atol=1e-5)

    def test_lsq_scale_gradient_clipped(self):
        def loss(s):
            return jnp.sum(linear_fake_quant(
                jnp.asarray([1000.0]), s, jnp.asarray(0.0), -128, 127))
        g = jax.grad(loss)(jnp.asarray(1.0))
        np.testing.assert_allclose(float(g), 127.0)  # qmax - offset

    def test_dynamic_quant(self):
        x = jnp.asarray(np.random.RandomState(0).randn(64).astype(np.float32))
        y = dynamic_linear_fake_quant(x, -128, 127)
        err = float(snr_error(y[None], x[None]))
        assert err < 1e-3


class TestFloatingQuant:
    def test_e4m3_exact_values(self):
        # 448 is the e4m3 max; values snap to fp8 grid
        x = jnp.asarray([448.0, 1.0, 0.5, -448.0, 1000.0])
        y = floating_fake_quant(x, 1.0, 4, 3, -448.0, 448.0)
        np.testing.assert_allclose(np.asarray(y), [448.0, 1.0, 0.5, -448.0, 448.0])

    def test_e5m2(self):
        x = jnp.asarray([57344.0, 100000.0, 1.25])
        y = floating_fake_quant(x, 1.0, 5, 2, -57344.0, 57344.0)
        np.testing.assert_allclose(np.asarray(y), [57344.0, 57344.0, 1.25])

    def test_e4m3_rounding(self):
        # between 16 and 17 (step=2 at that magnitude for e4m3: mantissa 3
        # bits, 16=2^4, step = 2^4 * 2^-3 = 2)
        y = floating_fake_quant(jnp.asarray([16.9]), 1.0, 4, 3, -448.0, 448.0)
        assert float(y[0]) in (16.0, 18.0)

    def test_generic_matches_e4m3(self):
        from ppq_tpu.quantization.qfunction import _generic_float_round
        x = jnp.asarray(np.random.RandomState(1).randn(256).astype(np.float32) * 10)
        ref = jnp.clip(x, -448, 448).astype(jnp.float8_e4m3fn).astype(jnp.float32)
        got = _generic_float_round(jnp.clip(x, -448, 448), 4, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0)


class TestToInt:
    def test_int8_symmetric(self):
        cfg = TensorQuantizationConfig(SYM_PT)
        cfg.scale = 0.1
        cfg.offset = 0.0
        cfg.state = QuantizationStates.ACTIVATED
        q = ppq_quant_toint(np.asarray([0.35, -0.35, 100.0]), cfg)
        assert q.dtype == np.int8
        np.testing.assert_array_equal(q, [4, -4, 127])

    def test_uint8_asymmetric(self):
        cfg = TensorQuantizationConfig(ASYM_PT, quant_min=0, quant_max=255)
        cfg.scale = 1.0
        cfg.offset = 128.0
        cfg.state = QuantizationStates.ACTIVATED
        q = ppq_quant_toint(np.asarray([0.0, -128.0, 127.0]), cfg)
        assert q.dtype == np.uint8
        np.testing.assert_array_equal(q, [128, 0, 255])


class TestObservers:
    def _cfg(self, policy=SYM_PT, algo='minmax', **kw):
        return TensorQuantizationConfig(policy, observer_algorithm=algo, **kw)

    def test_minmax_scale(self):
        cfg = self._cfg()
        obs = build_observer(cfg)
        obs.observe(jnp.asarray([-1.0, 2.0]))
        obs.observe(jnp.asarray([0.5, -3.0]))
        obs.render_quantization_config()
        assert cfg.state == QuantizationStates.ACTIVATED
        np.testing.assert_allclose(cfg.scale, 3.0 / 127.5, rtol=1e-5)

    def test_minmax_per_channel(self):
        cfg = self._cfg(SYM_PC, channel_axis=0)
        obs = build_observer(cfg)
        obs.observe(jnp.asarray([[1.0, -2.0], [4.0, 0.5]]))
        obs.render_quantization_config()
        np.testing.assert_allclose(cfg.scale, [2.0 / 127.5, 4.0 / 127.5], rtol=1e-5)

    def test_minmax_asymmetric(self):
        cfg = self._cfg(ASYM_PT, quant_min=0, quant_max=255)
        obs = build_observer(cfg)
        obs.observe(jnp.asarray([0.0, 2.55]))
        obs.render_quantization_config()
        np.testing.assert_allclose(cfg.scale, 0.01, rtol=1e-5)
        np.testing.assert_allclose(cfg.offset, 0.0, atol=1)

    def test_percentile_clips_outliers(self):
        cfg = self._cfg(algo='percentile')
        cfg.detail['OBSERVER_PERCENTILE_MANUL_OVERRIDE'] = 0.99
        obs = build_observer(cfg)
        data = np.concatenate([np.random.RandomState(0).uniform(-1, 1, 10000),
                               [100.0]]).astype(np.float32)
        obs.observe(jnp.asarray(data))
        obs.render_quantization_config()
        assert float(cfg.scale) < 0.05  # outlier was clipped away

    def test_kl_observer_two_phase(self):
        cfg = self._cfg(algo='kl')
        obs = build_observer(cfg)
        rng = np.random.RandomState(0)
        data = rng.randn(8192).astype(np.float32)
        obs.observe(jnp.asarray(data))         # phase 1: range
        obs.start_phase2()
        obs.observe(jnp.asarray(data))         # phase 2: histogram
        obs.render_quantization_config()
        # KL calibration on a gaussian clips well below the absolute max
        assert 0.001 < float(cfg.scale) < float(np.abs(data).max()) / 127.5

    def test_mse_observer(self):
        cfg = self._cfg(algo='mse')
        obs = build_observer(cfg)
        rng = np.random.RandomState(0)
        data = np.concatenate([rng.randn(65536), [30.0]]).astype(np.float32)
        obs.observe(jnp.asarray(data))
        obs.start_phase2()
        obs.observe(jnp.asarray(data))
        obs.render_quantization_config()
        # property: MSE-searched scale must beat the naive minmax scale
        cfg_mm = self._cfg()
        obs_mm = build_observer(cfg_mm)
        obs_mm.observe(jnp.asarray(data))
        obs_mm.render_quantization_config()
        x = jnp.asarray(data)

        def quant_mse(cfg):
            y = ppq_fake_quant(x, cfg)
            return float(jnp.mean((y - x) ** 2))

        assert quant_mse(cfg) <= quant_mse(cfg_mm) * 1.001
        assert float(cfg.scale) < float(cfg_mm.scale)  # it did clip

    def test_power_of_2(self):
        cfg = TensorQuantizationConfig(
            QuantizationPolicy(QP.PER_TENSOR | QP.LINEAR | QP.SYMMETRICAL | QP.POWER_OF_2))
        obs = build_observer(cfg)
        obs.observe(jnp.asarray([-3.0, 3.0]))
        obs.render_quantization_config()
        scale = float(cfg.scale)
        assert np.isclose(np.log2(scale), np.round(np.log2(scale)))

    def test_isotone_preserves_order(self):
        cfg = self._cfg(algo='isotone')
        obs = build_observer(cfg)
        probs = jnp.asarray([[0.50, 0.48, 0.02]])  # tight top-1/top-2 gap
        obs.observe(probs)
        obs.render_quantization_config()
        y = np.asarray(ppq_fake_quant(probs, cfg))
        assert y[0, 0] > y[0, 1]  # order preserved after quantization
