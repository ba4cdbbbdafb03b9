"""Core layer tests: policies, state machine, TQC sharing links.

Modeled on the reference's invariants (ppq/core/quant.py) — esp. the
dominator union-find semantics and setter guards."""

import numpy as np
import pytest

from ppq_tpu.core import (QP, DataType, QuantizationPolicy,
                          QuantizationStates, RoundingPolicy,
                          TensorQuantizationConfig, TargetPlatform)


def make_tqc(**kw):
    defaults = dict(
        policy=QuantizationPolicy(QP.PER_TENSOR | QP.LINEAR | QP.SYMMETRICAL),
        num_of_bits=8, quant_min=-128, quant_max=127)
    defaults.update(kw)
    return TensorQuantizationConfig(**defaults)


class TestQuantizationPolicy:
    def test_valid_combinations(self):
        QuantizationPolicy(QP.PER_TENSOR | QP.LINEAR | QP.SYMMETRICAL)
        QuantizationPolicy(QP.PER_CHANNEL | QP.LINEAR | QP.ASYMMETRICAL)
        QuantizationPolicy(QP.PER_TENSOR | QP.FLOATING | QP.SYMMETRICAL)
        QuantizationPolicy(QP.PER_CHANNEL | QP.LINEAR | QP.SYMMETRICAL | QP.POWER_OF_2)

    def test_invalid_combinations(self):
        with pytest.raises(ValueError):
            QuantizationPolicy(QP.LINEAR)  # missing granularity + symmetry
        with pytest.raises(ValueError):
            QuantizationPolicy(QP.PER_TENSOR | QP.PER_CHANNEL | QP.LINEAR | QP.SYMMETRICAL)

    def test_properties(self):
        p = QuantizationPolicy(QP.PER_CHANNEL | QP.LINEAR | QP.SYMMETRICAL)
        assert p.per_channel and p.linear and p.symmetric
        assert not p.asymmetric and not p.floating and not p.dynamic


class TestTQC:
    def test_scale_unset_raises(self):
        cfg = make_tqc()
        with pytest.raises(ValueError):
            _ = cfg.scale

    def test_scale_roundtrip(self):
        cfg = make_tqc()
        cfg.scale = 0.5
        assert cfg.scale == np.float32(0.5)

    def test_domination_redirects_scale(self):
        a, b = make_tqc(), make_tqc()
        a.scale = 1.0
        b.dominated_by = a
        assert b.state == QuantizationStates.OVERLAPPED
        assert b.scale == np.float32(1.0)
        with pytest.raises(PermissionError):
            b.scale = 2.0
        a.scale = 3.0
        assert b.scale == np.float32(3.0)

    def test_domination_chain(self):
        a, b, c = make_tqc(), make_tqc(), make_tqc()
        b.dominated_by = a
        c.dominated_by = b
        a.scale = 7.0
        assert c.dominated_by is a
        assert c.scale == np.float32(7.0)

    def test_master_slave(self):
        m, s = make_tqc(), make_tqc()
        m.scale = 2.0
        m.offset = 0.0
        m.state = QuantizationStates.ACTIVATED
        s.master_by = m
        assert s.state == QuantizationStates.PASSIVE
        assert s.scale == np.float32(2.0)
        assert s.is_active

    def test_detach(self):
        a, b = make_tqc(), make_tqc()
        b.dominated_by = a
        b.detach()
        assert b.is_root
        b.scale = 9.0  # no longer raises

    def test_copy_preserves_dominator(self):
        a, b = make_tqc(), make_tqc()
        b.dominated_by = a
        b2 = b.copy()
        assert b2.dominated_by is a

    def test_serialization_roundtrip(self):
        cfg = make_tqc(channel_axis=0)
        cfg.scale = np.array([0.5, 0.25], np.float32)
        cfg.offset = np.array([0.0, 0.0], np.float32)
        cfg.state = QuantizationStates.ACTIVATED
        d = cfg.to_dict()
        back = TensorQuantizationConfig.from_dict(d)
        assert back.num_of_bits == 8
        assert back.channel_axis == 0
        np.testing.assert_allclose(back.scale, cfg.scale)


class TestDataType:
    def test_numpy_roundtrip(self):
        for dt in (DataType.FP32, DataType.INT8, DataType.UINT8,
                   DataType.INT64, DataType.BOOL, DataType.BF16):
            assert DataType.from_numpy(dt.to_numpy()) == dt

    def test_onnx_alignment(self):
        # DataType values must equal onnx TensorProto.DataType codes
        assert DataType.FP32 == 1
        assert DataType.INT8 == 3
        assert DataType.INT64 == 7
        assert DataType.BF16 == 16


class TestPlatform:
    def test_quantable(self):
        assert TargetPlatform.is_quantable(TargetPlatform.TPU_INT8)
        assert not TargetPlatform.is_quantable(TargetPlatform.SOI)
        assert not TargetPlatform.is_quantable(TargetPlatform.FP32)
