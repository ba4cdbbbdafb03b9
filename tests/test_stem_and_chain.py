"""Stem space-to-depth rewrite (TPU MXU-lane optimization) and the
chained bulk runner. Reference has neither (CUDA doesn't need the stem
trick; PPQ has no bulk-inference API) — TPU-first additions."""

import numpy as np
import pytest

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.ir.morph import stem_space_to_depth
from ppq_tpu.quantization.optim import StemSpaceToDepthPass
from ppq_tpu.zoo.vision import resnet18


def _quantized_resnet(n=2, hw=64):
    g = resnet18(input_shape=[n, 3, hw, hw])
    rng = np.random.RandomState(0)
    loader = [rng.randn(n, 3, hw, hw).astype(np.float32) for _ in range(2)]
    quantize_graph(g, loader, calib_steps=2,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return g, loader


def _snr(p, r):
    return float(((p - r) ** 2).sum() / ((r ** 2).sum() + 1e-12))


class TestStemSpaceToDepth:
    def test_exact_rewrite_on_quantized_resnet(self):
        g, loader = _quantized_resnet()
        x = loader[0]
        before = np.asarray(compile_graph(g).make_runner()(x)[0])
        n = stem_space_to_depth(g)
        assert n == 1
        after = np.asarray(compile_graph(g).make_runner()(x)[0])
        rel = np.abs(before - after).max() / (np.abs(before).max() + 1e-9)
        assert rel < 1e-5, rel

    def test_stem_conv_rewritten_shape(self):
        g, _ = _quantized_resnet()
        stem_space_to_depth(g)
        convs = [op for op in g.operations.values() if op.type == 'Conv']
        stem = [c for c in convs if c.inputs[1].value.shape[1] == 12]
        assert len(stem) == 1
        c = stem[0]
        assert c.attributes['strides'] == [1, 1]
        assert c.inputs[1].value.shape[2:] == (4, 4)
        # the packing chain precedes the conv
        assert c.inputs[0].source_op.type == 'Reshape'

    def test_pass_wrapper(self):
        g, _ = _quantized_resnet()
        StemSpaceToDepthPass().optimize(g)
        assert any(op.type == 'Transpose' and '_s2d_' in op.name
                   for op in g.operations.values())

    def test_skips_large_cin_and_stride1(self):
        g, _ = _quantized_resnet()
        stem_space_to_depth(g)
        # second application finds nothing (stem now stride-1, C=12 > 4)
        assert stem_space_to_depth(g) == 0

    def test_exact_math_standalone(self):
        """Direct numerical check of the packing construction on a raw
        conv (no quantization): fp32-exact."""
        import jax
        from ppq_tpu.ir.graph import BaseGraph
        g = BaseGraph('stem')
        x = g.create_variable(name='x', shape=[1, 3, 32, 32])
        g.mark_as_input(x)
        w = g.create_variable(
            name='w', value=np.random.RandomState(1).randn(
                8, 3, 7, 7).astype(np.float32), is_parameter=True)
        conv = g.create_operation(
            'Conv', name='conv',
            attributes={'strides': [2, 2], 'pads': [3, 3, 3, 3],
                        'dilations': [1, 1], 'group': 1,
                        'kernel_shape': [7, 7]},
            inputs=[x, w])
        y = g.create_variable(name='y', source_op=conv)
        g.mark_as_output(y)
        xv = np.random.RandomState(2).randn(1, 3, 32, 32).astype(np.float32)
        r0 = np.asarray(compile_graph(g).make_runner()(xv)[0])
        assert stem_space_to_depth(g) == 1
        r1 = np.asarray(compile_graph(g).make_runner()(xv)[0])
        assert r0.shape == r1.shape == (1, 8, 16, 16)
        np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=1e-5)


class TestChainedRunner:
    def test_chain_matches_per_call(self):
        g, loader = _quantized_resnet()
        cg = compile_graph(g)
        run1 = cg.make_runner()
        runc = cg.make_runner(chain=2)
        singles = [np.asarray(run1(x)[0]) for x in loader]
        chained = np.asarray(runc(np.stack(loader))[0])
        assert chained.shape == (2,) + singles[0].shape
        for i in range(2):
            # scan bodies may fuse differently than the straight-line
            # program: allow ~one int8 rounding step, predictions stable
            assert _snr(chained[i], singles[i]) < 5e-3
            assert (chained[i].argmax(-1) == singles[i].argmax(-1)).all()
