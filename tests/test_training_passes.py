"""Training-based & equalization pass tests (reference models:
tests/test_block.py, test_layerwise_equalization.py)."""

import numpy as np
import pytest

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.api import manop
from ppq_tpu.ir import QuantableOperation
from ppq_tpu.quantization.algorithm.blocks import BlockBuilder
from ppq_tpu.quantization.algorithm.equalization import find_equalization_pairs
from ppq_tpu.quantization.measure import torch_snr_error
from ppq_tpu.quantization.optim import (AdaroundPass, BiasCorrectionPass,
                                        LayerwiseEqualizationPass,
                                        LearnedStepSizePass)
from ppq_tpu.zoo.vision import tiny_cnn


def build_quantized(seed=5, w_noise=0.0):
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(seed)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(graph, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return graph, loader


def fp32_outputs(loader):
    g = tiny_cnn(input_shape=(2, 3, 16, 16))
    ex = TPUExecutor(g)
    return [np.asarray(ex.forward(x)[0]) for x in loader]


def mean_snr(graph, loader, refs):
    ex = TPUExecutor(graph)
    return float(np.mean([
        float(torch_snr_error(np.asarray(ex.forward(x)[0])[None], r[None]))
        for x, r in zip(loader, refs)]))


class TestBlockBuilder:
    def test_blocks_cover_graph(self):
        graph, _ = build_quantized()
        blocks = BlockBuilder(graph).build(block_size=2, only_quantable=False)
        covered = [op.name for b in blocks for op in b.rps]
        assert sorted(covered) == sorted(graph.operations.keys())
        for b in blocks:
            assert b.num_computing_ops <= 2
            assert b.input_names and b.output_names

    def test_block_io_consistency(self):
        graph, _ = build_quantized()
        for b in BlockBuilder(graph).build(2):
            produced = {v.name for op in b.rps for v in op.outputs}
            for n in b.input_names:
                assert n not in produced


def sequential_cnn():
    """conv→relu→conv→relu chain — the canonical equalization target."""
    from ppq_tpu.zoo.builder import NetBuilder
    b = NetBuilder('seq', seed=3)
    x = b.input('x', [2, 3, 16, 16])
    y = b.relu(b.conv(x, 3, 8, 3, bias=True))
    y = b.relu(b.conv(y, 8, 8, 3, bias=True))
    y = b.conv(y, 8, 4, 3, bias=True)
    b.output(y)
    return b.g


class TestEqualization:
    def test_pairs_found_and_function_preserved(self):
        graph = sequential_cnn()
        pairs = find_equalization_pairs(graph)
        assert len(pairs) >= 2
        x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
        before = np.asarray(TPUExecutor(graph).forward(x)[0])
        LayerwiseEqualizationPass(iterations=4).optimize(graph)
        after = np.asarray(TPUExecutor(graph).forward(x)[0])
        np.testing.assert_allclose(after, before, rtol=1e-3, atol=1e-4)

    def test_equalization_narrows_ranges(self):
        graph = sequential_cnn()
        pairs = find_equalization_pairs(graph)
        up = pairs[0].upstream
        w = np.asarray(up.inputs[1].value)
        # inject channel outliers
        w[0] *= 10.0
        up.inputs[1].value = w
        rng_before = np.abs(w).reshape(w.shape[0], -1).max(1)
        spread_before = rng_before.max() / rng_before.min()
        LayerwiseEqualizationPass(iterations=10,
                                  value_threshold=0.0).optimize(graph)
        w2 = np.asarray(up.inputs[1].value)
        rng_after = np.abs(w2).reshape(w2.shape[0], -1).max(1)
        spread_after = rng_after.max() / max(rng_after.min(), 1e-9)
        assert spread_after < spread_before


class TestTrainingPasses:
    def test_lsq_improves_or_keeps_snr(self):
        graph, loader = build_quantized()
        refs = fp32_outputs(loader)
        pre = mean_snr(graph, loader, refs)
        manop(graph, LearnedStepSizePass(block_size=2, steps=40, lr=1e-4,
                                         calib_steps=4),
              calib_dataloader=loader, verbose=False)
        post = mean_snr(graph, loader, refs)
        assert post <= pre * 1.05, (pre, post)

    def test_bias_correction_runs_and_helps(self):
        graph, loader = build_quantized()
        refs = fp32_outputs(loader)
        pre = mean_snr(graph, loader, refs)
        manop(graph, BiasCorrectionPass(steps=4),
              calib_dataloader=loader, verbose=False)
        post = mean_snr(graph, loader, refs)
        assert post <= pre * 1.2, (pre, post)

    def test_adaround_keeps_weights_on_grid(self):
        graph, loader = build_quantized()
        manop(graph, AdaroundPass(block_size=2, steps=20, calib_steps=4),
              calib_dataloader=loader, verbose=False)
        for op in graph.operations.values():
            if isinstance(op, QuantableOperation) and op.type == 'Conv':
                cfg = op.config.input_quantization_config[1]
                if not cfg.has_scale:
                    continue
                w = np.asarray(op.inputs[1].value)
                s = np.asarray(cfg.scale).reshape(-1, 1, 1, 1)
                q = w / s
                np.testing.assert_allclose(q, np.round(q), atol=1e-4)


def test_finetune_after_baking_preserves_export_guarantee():
    """Regression: training passes applied AFTER ParameterBakingPass (manop
    flows) must keep deploy == sim — stale fp32 shadows once made exporters
    re-quantize pre-training weights."""
    from ppq_tpu import export_ppq_graph
    from ppq_tpu.api import load_onnx_graph

    graph, loader = build_quantized()        # pipeline ends with baking
    manop(graph, [BiasCorrectionPass(steps=4),
                  LearnedStepSizePass(block_size=2, steps=20, calib_steps=4)],
          calib_dataloader=loader, verbose=False)
    sim = np.asarray(TPUExecutor(graph).forward(loader[0])[0])

    import tempfile
    path = tempfile.mktemp(suffix='.onnx')
    export_ppq_graph(graph, TargetPlatform.TPU_INT8, path)
    deployed = np.asarray(TPUExecutor(load_onnx_graph(path)).forward(
        loader[0])[0])
    np.testing.assert_allclose(deployed, sim, atol=1e-6)


class TestSESEBlocks:
    def test_residual_joins_never_sliced(self):
        """Block boundaries must not cross a residual add: every block is
        single-entry/single-exit, so its outputs all come from its end op
        (reference training.py:191-316 block definition)."""
        from ppq_tpu.zoo.vision import resnet18
        g = resnet18(input_shape=[1, 3, 64, 64])
        blocks = BlockBuilder(g).build(block_size=4, only_quantable=False)
        covered = [op.name for b in blocks for op in b.rps]
        assert sorted(covered) == sorted(g.operations.keys())
        for b in blocks:
            ep_outs = {v.name for v in b.ep.outputs}
            for n in b.output_names:
                assert n in ep_outs or n in g.outputs, \
                    f'{b}: interior value {n} leaks out of the block'

    def test_multi_entry_interior_forbidden(self):
        """No non-start member may read a value produced outside the
        block (single-entry property)."""
        from ppq_tpu.zoo.vision import resnet18
        g = resnet18(input_shape=[1, 3, 64, 64])
        for b in BlockBuilder(g).build(block_size=4, only_quantable=False):
            inside = {op.name for op in b.rps}
            for op in b.rps:
                if op is b.sp:
                    continue
                for v in op.inputs:
                    if v.is_parameter or v.source_op is None:
                        continue
                    assert v.source_op.name in inside, \
                        f'{b}: {op.name} reads {v.name} from outside'

    def test_residual_block_groups_whole_branch(self):
        """A conv-conv residual bundle fits in one block when the budget
        allows — the join lands inside, not on a boundary."""
        from ppq_tpu.zoo.builder import NetBuilder
        b = NetBuilder('res', 0)
        x = b.input('x', [1, 8, 8, 8])
        t = b.relu(b.conv(x, 8, 8, 3))
        u = b.relu(b.conv(b.relu(b.conv(t, 8, 8, 3)), 8, 8, 3))
        s = b.add(u, t)                       # residual join
        b.output(b.conv(s, 8, 8, 3))
        blocks = BlockBuilder(b.g).build(block_size=4, only_quantable=False)
        add_block = next(bl for bl in blocks
                         if any(op.type == 'Add' for op in bl.rps))
        types = [op.type for op in add_block.rps]
        assert types.count('Conv') >= 2, \
            f'residual branch split away from its join: {add_block}'
