"""Dispatcher tests (reference model: tests/test_persus.py — dispatch tables
on synthetic graphs with SOI chains)."""

import numpy as np

from ppq_tpu.core import TargetPlatform
from ppq_tpu.scheduler import (DISPATCHER_TABLE, AggressiveDispatcher,
                               AllinDispatcher, ConservativeDispatcher,
                               PerseusDispatcher, PointDispatcher)
from ppq_tpu.zoo.builder import NetBuilder

QUANT = TargetPlatform.TPU_INT8


def build_soi_graph():
    """Conv → Relu → (Shape → Gather → Unsqueeze → Concat(shape const) →
    Reshape) — the classic dynamic-flatten pattern: the shape chain must be
    dispatched to SOI, the conv trunk quantized."""
    b = NetBuilder('soi_net')
    x = b.input('x', [1, 8, 8, 8])
    y = b.relu(b.conv(x, 8, 16, k=3))
    shp = b.op('Shape', [y])
    g = b.op('Gather', [shp, b.iparam(np.asarray(0))], axis=0)
    u = b.op('Unsqueeze', [g, b.iparam(np.asarray([0]))])
    cc = b.op('Concat', [u, b.iparam(np.asarray([-1]))], axis=0)
    out = b.op('Reshape', [y, cc])
    b.output(out)
    return b.g


def test_conservative_soi_split():
    g = build_soi_graph()
    table = ConservativeDispatcher(g).dispatch(quant_platform=QUANT)
    by_type = {op.type: table[name] for name, op in g.operations.items()}
    assert by_type['Conv'] == QUANT
    assert by_type['Relu'] == QUANT
    assert by_type['Reshape'] == QUANT          # value flows through input 0
    # the shape-computation chain is SOI
    assert by_type['Gather'] == TargetPlatform.SOI
    assert by_type['Unsqueeze'] == TargetPlatform.SOI
    assert by_type['Concat'] == TargetPlatform.SOI
    # Shape itself bridges activation→SOI, stays un-quantized
    assert by_type['Shape'] in (TargetPlatform.FP32, TargetPlatform.SOI)


def test_all_dispatchers_cover_graph():
    g = build_soi_graph()
    for name, cls in DISPATCHER_TABLE.items():
        table = cls(g).dispatch(quant_platform=QUANT)
        assert set(table.keys()) == set(g.operations.keys()), name


def test_point_dispatcher_only_computing():
    g = build_soi_graph()
    table = PointDispatcher(g).dispatch(quant_platform=QUANT)
    for name, op in g.operations.items():
        if op.type == 'Conv':
            assert table[name] == QUANT
        else:
            assert table[name] != QUANT


def test_allin_quantizes_everything_but_soi():
    g = build_soi_graph()
    table = AllinDispatcher(g).dispatch(quant_platform=QUANT)
    for name, op in g.operations.items():
        if table[name] != QUANT:
            assert op.type in ('Gather', 'Unsqueeze', 'Concat', 'Shape')


def test_quant_types_filter():
    g = build_soi_graph()
    table = ConservativeDispatcher(g).dispatch(
        quant_types={'Conv'}, quant_platform=QUANT)
    for name, op in g.operations.items():
        if table[name] == QUANT:
            assert op.type == 'Conv'


def test_upstream_add_fp32_in_conservative():
    """Pre-compute Add (before any conv) stays fp32 conservatively, gets
    quantized aggressively."""
    b = NetBuilder('pre_add')
    x = b.input('x', [1, 4, 8, 8])
    shifted = b.op('Add', [x, b.param(np.ones((1, 4, 1, 1), np.float32))])
    y = b.relu(b.conv(shifted, 4, 8, k=3))
    b.output(y)
    g = b.g
    cons = ConservativeDispatcher(g).dispatch(quant_platform=QUANT)
    aggr = AggressiveDispatcher(g).dispatch(quant_platform=QUANT)
    add_name = next(n for n, o in g.operations.items() if o.type == 'Add')
    assert cons[add_name] == TargetPlatform.FP32
    assert aggr[add_name] == QUANT


def test_perseus_matches_conservative_on_trunk():
    g = build_soi_graph()
    pers = PerseusDispatcher(g).dispatch(quant_platform=QUANT)
    for name, op in g.operations.items():
        if op.type in ('Conv', 'Relu'):
            assert pers[name] == QUANT
        if op.type in ('Gather', 'Unsqueeze', 'Concat'):
            assert pers[name] == TargetPlatform.SOI


def test_pplnn_dispatcher_fusion_regions():
    """PPLNN quant region grows from Conv seeds through fusable types only;
    a non-fusable op breaks the INT8 region (reference dispatchers.py:278),
    and linear activations / NMS-like ops follow their producer."""
    from ppq_tpu.scheduler import PPLNNDispatcher
    b = NetBuilder('det_head')
    x = b.input('x', [1, 8, 16, 16])
    t = b.relu(b.conv(x, 8, 16, k=3))          # conv → relu: fused INT8
    t2 = b.conv(t, 16, 16, k=3)
    sig = b.op('Sigmoid', [t2])                # NOT in quant_types → breaks
    t3 = b.conv(t, 16, 16, k=3)                # second branch stays INT8
    s = b.add(t2, t3)                          # conv+conv add: fusable
    b.output(b.op('Mul', [sig, s]))
    g = b.g
    table = PPLNNDispatcher(g).dispatch(
        quant_types={'Conv', 'Relu', 'Add', 'MaxPool'},
        quant_platform=QUANT)
    by_name = {op.name: (op.type, table[name])
               for name, op in g.operations.items()}
    types = {op.type: table[name] for name, op in g.operations.items()}
    assert types['Conv'] == QUANT
    assert types['Relu'] == QUANT              # follows its conv producer
    assert types['Add'] == QUANT               # conv-conv add fusion region
    assert types['Sigmoid'] == TargetPlatform.FP32
    assert types['Mul'] == TargetPlatform.FP32  # not reachable via fusables


def test_pplnn_differs_from_conservative_on_matmul():
    """Conservative quantizes MatMul-seeded regions; PPLNN only grows from
    Conv seeds — a pure-MatMul head stays fp32 under pplnn."""
    from ppq_tpu.scheduler import PPLNNDispatcher
    b = NetBuilder('mm_head')
    x = b.input('x', [4, 16])
    y = b.matmul(x, b.param(b.rng.randn(16, 8)))
    b.output(b.relu(y))
    g = b.g
    cons = ConservativeDispatcher(g).dispatch(
        quant_types={'MatMul', 'Relu'}, quant_platform=QUANT)
    ppl = PPLNNDispatcher(g).dispatch(
        quant_types={'MatMul', 'Relu'}, quant_platform=QUANT)
    mm = next(n for n, op in g.operations.items() if op.type == 'MatMul')
    assert cons[mm] == QUANT
    assert ppl[mm] == TargetPlatform.FP32


def test_pplnn_registered_in_table():
    from ppq_tpu.scheduler import PPLNNDispatcher
    assert DISPATCHER_TABLE['pplnn'] is PPLNNDispatcher
