"""Property tests: TQC dominator/master sharing must survive whole-graph
copies and native round-trips (SURVEY.md §7 hard part; reference subtlety at
ppq/IR/base/graph.py:836-921)."""

import numpy as np
import pytest

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.core import QuantizationStates, dumps_native, loads_native
from ppq_tpu.ir import QuantableOperation
from ppq_tpu.zoo import tiny_cnn


def quantized(seed=0):
    g = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(seed)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(3)]
    quantize_graph(g, loader, calib_steps=3,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return g, loader


def sharing_structure(graph):
    """Map each TQC position to the position of its dominator root —
    structural fingerprint of the sharing forest."""
    positions = {}
    for name, op in sorted(graph.operations.items()):
        if not isinstance(op, QuantableOperation):
            continue
        for j, cfg in enumerate(op.config):
            positions[id(cfg)] = (name, j)
    out = {}
    for name, op in sorted(graph.operations.items()):
        if not isinstance(op, QuantableOperation):
            continue
        for j, cfg in enumerate(op.config):
            root = cfg.dominated_by
            out[(name, j)] = (positions.get(id(root), ('<external>', -1)),
                              cfg.state.name)
    return out


def test_copy_preserves_sharing_forest():
    g, loader = quantized()
    c = g.copy(copy_value=True)
    assert sharing_structure(c) == sharing_structure(g)
    # copied configs must be NEW objects, not aliases
    orig_ids = {id(cfg) for op in g.operations.values()
                if isinstance(op, QuantableOperation) for cfg in op.config}
    copy_ids = {id(cfg) for op in c.operations.values()
                if isinstance(op, QuantableOperation) for cfg in op.config}
    assert orig_ids.isdisjoint(copy_ids)


def test_copy_is_functionally_identical():
    g, loader = quantized()
    c = g.copy(copy_value=True)
    a = np.asarray(TPUExecutor(g).forward(loader[0])[0])
    b = np.asarray(TPUExecutor(c).forward(loader[0])[0])
    np.testing.assert_array_equal(a, b)


def test_copy_isolation_scale_edit():
    """Editing a copied TQC's scale must not leak into the original."""
    g, _ = quantized()
    c = g.copy(copy_value=True)
    for op in c.operations.values():
        if isinstance(op, QuantableOperation):
            for cfg in op.config:
                if cfg.is_root and cfg.state == QuantizationStates.ACTIVATED \
                        and cfg.has_scale:
                    before = np.asarray(
                        sharing_structure(g)[next(iter(
                            sharing_structure(g)))], dtype=object)
                    orig_scales = {
                        (name, j): np.array(ocfg.scale, copy=True)
                        for name, oop in g.operations.items()
                        if isinstance(oop, QuantableOperation)
                        for j, ocfg in enumerate(oop.config)
                        if ocfg.is_root and ocfg.has_scale}
                    cfg.scale = np.asarray(cfg.scale) * 7.0
                    for (name, j), sc in orig_scales.items():
                        ocfg = list(g.operations[name].config)[j]
                        np.testing.assert_array_equal(
                            np.asarray(ocfg.scale), sc)
                    return
    pytest.fail('no editable root config found')


def test_native_roundtrip_preserves_sharing():
    g, loader = quantized()
    blob = dumps_native(g)
    r = loads_native(blob)
    assert sharing_structure(r) == sharing_structure(g)
    a = np.asarray(TPUExecutor(g).forward(loader[0])[0])
    b = np.asarray(TPUExecutor(r).forward(loader[0])[0])
    np.testing.assert_array_equal(a, b)


def test_double_copy_stable():
    g, loader = quantized()
    c2 = g.copy().copy()
    assert sharing_structure(c2) == sharing_structure(g)
    a = np.asarray(TPUExecutor(g).forward(loader[0])[0])
    b = np.asarray(TPUExecutor(c2).forward(loader[0])[0])
    np.testing.assert_array_equal(a, b)
