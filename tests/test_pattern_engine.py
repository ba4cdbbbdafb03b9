"""DAG pattern engine + TraversalCommand string queries
(reference ppq/IR/search.py:81-390)."""

import numpy as np
import pytest

from ppq_tpu.ir import GraphPattern, SearchableGraph, TraversalCommand
from ppq_tpu.zoo.builder import NetBuilder


def _diamond_graph():
    """Conv → (Softplus → Tanh) and direct edge → Mul  (mish shape)."""
    b = NetBuilder('mish', 0)
    x = b.input('x', [1, 4, 8, 8])
    c = b.op('Conv', [x, b.param(b.rng.randn(4, 4, 3, 3) * 0.1)],
             kernel_shape=[3, 3], pads=[1, 1, 1, 1])
    sp = b.op('Softplus', [c])
    th = b.op('Tanh', [sp])
    m = b.op('Mul', [c, th])
    b.output(m)
    return b.g


def test_dag_matching_diamond():
    g = _diamond_graph()
    pat = GraphPattern(
        [lambda op: op.is_computing_op, 'Softplus', 'Tanh', 'Mul'],
        edges=[[0, 1], [1, 2], [2, 3], [0, 3]])
    matches = SearchableGraph(g).dag_matching(pat, exclusive=True)
    assert len(matches) == 1
    conv, sp, th, mul = matches[0]
    assert conv.type == 'Conv' and mul.type == 'Mul'


def test_dag_matching_exclusive_rejects_external_consumer():
    g = _diamond_graph()
    # add an external consumer of the Tanh output → exclusive must reject
    th = next(op for op in g.operations.values() if op.type == 'Tanh')
    relu = g.create_operation('Relu', name='external')
    g.connect(th.outputs[0], relu)
    g.create_variable(source_op=relu)
    pat = GraphPattern(
        [lambda op: op.is_computing_op, 'Softplus', 'Tanh', 'Mul'],
        edges=[[0, 1], [1, 2], [2, 3], [0, 3]])
    assert SearchableGraph(g).dag_matching(pat, exclusive=True) == []
    assert len(SearchableGraph(g).dag_matching(pat, exclusive=False)) == 1


def test_dag_matching_rejects_chain_without_branch_edge():
    """A linear Conv→Softplus→Tanh→Mul chain (no Conv→Mul edge) must NOT
    match the diamond pattern — this is what chain matching cannot check."""
    b = NetBuilder('chain', 1)
    x = b.input('x', [1, 4, 8, 8])
    c = b.op('Conv', [x, b.param(b.rng.randn(4, 4, 3, 3) * 0.1)],
             kernel_shape=[3, 3], pads=[1, 1, 1, 1])
    th = b.op('Tanh', [b.op('Softplus', [c])])
    m = b.op('Mul', [th, b.param(np.ones((1, 4, 1, 1)))])
    b.output(m)
    pat = GraphPattern(
        [lambda op: op.is_computing_op, 'Softplus', 'Tanh', 'Mul'],
        edges=[[0, 1], [1, 2], [2, 3], [0, 3]])
    assert SearchableGraph(b.g).dag_matching(pat, exclusive=False) == []


def test_graph_pattern_validates():
    with pytest.raises(ValueError):
        GraphPattern(['A', 'B'], edges=[[0, 1], [1, 0]])       # cycle
    with pytest.raises(ValueError):
        GraphPattern(['A', 'B', 'C'], edges=[[0, 1]])           # disconnected
    with pytest.raises(IndexError):
        GraphPattern(['A', 'B'], edges=[[0, 5]])                # out of range


def test_traversal_command_compile_and_run():
    b = NetBuilder('trav', 2)
    x = b.input('x', [1, 4, 8, 8])
    c1 = b.op('Conv', [x, b.param(b.rng.randn(4, 4, 3, 3) * 0.1)],
              kernel_shape=[3, 3], pads=[1, 1, 1, 1])
    r1 = b.op('Relu', [c1])
    c2 = b.op('Conv', [r1, b.param(b.rng.randn(4, 4, 3, 3) * 0.1)],
              kernel_shape=[3, 3], pads=[1, 1, 1, 1])
    r2 = b.op('Relu', [c2])
    b.output(r2)
    g = b.g
    sg = SearchableGraph(g)

    cmd = TraversalCommand.compile('''
        SELECT PATH
        FROM Conv
        TO Relu
        THROUGH Any
        WHERE Path.length < 3''')
    paths = sg.traverse(cmd)
    # direct Conv→Relu pairs only (length-2 paths)
    assert len(paths) == 2
    assert all(p[0].type == 'Conv' and p[-1].type == 'Relu' for p in paths)

    starts = sg.traverse(TraversalCommand.compile(
        'SELECT START; FROM Conv; TO Conv; THROUGH Relu'))
    assert {op.type for op in starts} == {'Conv'}
    assert len(starts) == 1               # only c1 reaches another Conv

    opset = sg.traverse(TraversalCommand.compile(
        'SELECT OPSET; FROM Conv; TO Conv; THROUGH Relu'))
    assert len(opset) >= 3


def test_traversal_command_rejects_bad_query():
    with pytest.raises(ValueError):
        TraversalCommand.compile('SELECT NONSENSE; FROM Conv; TO Relu')
    with pytest.raises(ValueError):
        TraversalCommand.compile('FLY ME TO THE MOON')
