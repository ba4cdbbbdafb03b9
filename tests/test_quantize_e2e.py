"""End-to-end PTQ tests: graph → dispatch → calibrate → INT8 simulate.

Mirrors the reference's system-test matrix (tests/test_system.py: models ×
schemes) at a smaller scale suitable for CI.
"""

import numpy as np
import pytest

from ppq_tpu import (QuantizationSettingFactory, TargetPlatform,
                     TPUExecutor, quantize_graph)
from ppq_tpu.ir import QuantableOperation
from ppq_tpu.core import QuantizationStates
from ppq_tpu.quantization.measure import torch_snr_error
from ppq_tpu.zoo.vision import tiny_cnn


def make_loader(shape, n=8, seed=7):
    rng = np.random.RandomState(seed)
    return [rng.randn(*shape).astype(np.float32) for _ in range(n)]


def quantize_tiny(platform=TargetPlatform.TPU_INT8, setting=None, **kwargs):
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    loader = make_loader((2, 3, 16, 16))
    graph = quantize_graph(graph, loader, calib_steps=8,
                           platform=platform, setting=setting,
                           verbose=False, **kwargs)
    return graph, loader


def fp32_reference(loader):
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    ex = TPUExecutor(graph)
    return [np.asarray(ex.forward(x)[0]) for x in loader]


class TestEndToEnd:
    def test_int8_quantize_and_simulate(self):
        graph, loader = quantize_tiny()
        qops = [op for op in graph.operations.values()
                if isinstance(op, QuantableOperation)]
        assert len(qops) > 0, 'no op was quantized'
        # every conv weight config must be calibrated or baked
        for op in qops:
            if op.type == 'Conv':
                w_cfg = op.config.input_quantization_config[1]
                assert w_cfg.state in {QuantizationStates.ACTIVATED,
                                       QuantizationStates.BAKED}
                assert w_cfg.has_scale

        ex = TPUExecutor(graph)
        ref = fp32_reference(loader)
        snrs = []
        for x, r in zip(loader, ref):
            q = np.asarray(ex.forward(x)[0])
            assert q.shape == r.shape
            snrs.append(float(torch_snr_error(q[None], r[None])))
        # INT8 on a tiny random net: simulated output must stay close
        assert np.mean(snrs) < 0.05, f'INT8 SNR too high: {snrs}'
        # and quantization must actually change the output
        assert np.mean(snrs) > 0, 'quantization had no effect at all'

    def test_fp8_quantize(self):
        setting = QuantizationSettingFactory.fp8_setting()
        graph, loader = quantize_tiny(TargetPlatform.TPU_FP8, setting)
        ex = TPUExecutor(graph)
        ref = fp32_reference(loader)
        q = np.asarray(ex.forward(loader[0])[0])
        snr = float(torch_snr_error(q[None], ref[0][None]))
        assert snr < 0.01, f'FP8 SNR too high: {snr}'

    def test_weight_only_int4(self):
        setting = QuantizationSettingFactory.weight_only_setting()
        graph, loader = quantize_tiny(
            TargetPlatform.TPU_INT4_WEIGHT_ONLY, setting)
        ex = TPUExecutor(graph)
        ref = fp32_reference(loader)
        q = np.asarray(ex.forward(loader[0])[0])
        snr = float(torch_snr_error(q[None], ref[0][None]))
        assert 0 < snr < 0.2, f'INT4 weight-only SNR out of range: {snr}'

    def test_dispatch_assigns_platforms(self):
        graph, _ = quantize_tiny()
        plats = {op.platform for op in graph.operations.values()}
        assert TargetPlatform.TPU_INT8 in plats

    def test_passive_bias_scale(self):
        graph, _ = quantize_tiny()
        for op in graph.operations.values():
            if isinstance(op, QuantableOperation) and op.type == 'Conv' \
                    and len(op.inputs) >= 3:
                b_cfg = op.config.input_quantization_config[2]
                assert b_cfg.state in {QuantizationStates.PASSIVE,
                                       QuantizationStates.PASSIVE_BAKED}
                in_s = op.config.input_quantization_config[0].scale
                w_s = op.config.input_quantization_config[1].scale
                np.testing.assert_allclose(
                    np.asarray(b_cfg.scale),
                    np.asarray(in_s).max() * np.asarray(w_s), rtol=1e-5)

    def test_setting_json_roundtrip(self):
        from ppq_tpu.api.setting import QuantizationSetting
        s = QuantizationSettingFactory.default_setting()
        s.equalization = True
        s.calibration.calib_steps = 11
        s2 = QuantizationSetting.from_json(s.to_json())
        assert s2.equalization is True
        assert s2.calibration.calib_steps == 11


class TestFusionEffects:
    def test_conv_relu_fusion_shares_scale(self):
        graph, _ = quantize_tiny()
        for op in graph.operations.values():
            if not (isinstance(op, QuantableOperation) and op.type == 'Conv'):
                continue
            outs = op.outputs[0].dest_ops
            if len(outs) == 1 and outs[0].type == 'Relu' and \
                    isinstance(outs[0], QuantableOperation):
                conv_out = op.config.output_quantization_config[0]
                relu_out = outs[0].config.output_quantization_config[0]
                assert conv_out.dominated_by is relu_out.dominated_by
                assert conv_out.state == QuantizationStates.OVERLAPPED
