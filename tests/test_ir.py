"""IR tests: graph construction, surgery, topo sort, copy, search, morph.

Counterpart of reference tests/test_graph_api.py + testBnToConv.py +
test_gemm_fusion.py."""

import numpy as np
import pytest

from ppq_tpu.core import (QP, OperationQuantizationConfig, QuantizationPolicy,
                          QuantizationStates, TensorQuantizationConfig)
from ppq_tpu.ir import (BaseGraph, Operation, QuantableOperation,
                        SearchableGraph, Variable, format_graph, fuse_bn,
                        fuse_matmul_add, quantize_operation,
                        soi_input_indices)


def linear_graph():
    """input -> Conv -> Relu -> MaxPool -> output"""
    g = BaseGraph('test')
    x = g.create_variable('x', shape=[1, 3, 8, 8])
    g.mark_as_input(x)
    w = g.create_variable('w', value=np.random.randn(4, 3, 3, 3).astype(np.float32),
                          is_parameter=True)
    conv = g.create_operation('Conv', name='conv', inputs=[x, w],
                              attributes={'kernel_shape': [3, 3]})
    c_out = g.create_variable('c_out', source_op=conv)
    relu = g.create_operation('Relu', name='relu', inputs=[c_out])
    r_out = g.create_variable('r_out', source_op=relu)
    pool = g.create_operation('MaxPool', name='pool', inputs=[r_out],
                              attributes={'kernel_shape': [2, 2]})
    y = g.create_variable('y', source_op=pool)
    g.mark_as_output(y)
    return g


class TestGraphBasics:
    def test_topological_sort(self):
        g = linear_graph()
        order = [op.name for op in g.topological_sort()]
        assert order == ['conv', 'relu', 'pool']

    def test_up_down_stream(self):
        g = linear_graph()
        conv = g.operations['conv']
        assert [o.name for o in g.get_downstream_operations(conv)] == ['relu']
        relu = g.operations['relu']
        assert [o.name for o in g.get_upstream_operations(relu)] == ['conv']

    def test_cycle_detection(self):
        g = linear_graph()
        # feed pool output back into conv — creates a cycle
        g.connect(g.variables['y'], g.operations['conv'])
        with pytest.raises(RuntimeError):
            g.topological_sort()

    def test_remove_with_coherence(self):
        g = linear_graph()
        g.remove_operation(g.operations['relu'], keep_coherence=True)
        order = [op.name for op in g.topological_sort()]
        assert order == ['conv', 'pool']
        pool = g.operations['pool']
        assert pool.inputs[0].name == 'c_out'

    def test_insert_op_on_var(self):
        g = linear_graph()
        quant = Operation('fakequant', 'Identity')
        g.insert_op_on_var(quant, g.variables['c_out'])
        order = [op.name for op in g.topological_sort()]
        assert order == ['conv', 'fakequant', 'relu', 'pool']

    def test_insert_between(self):
        g = linear_graph()
        mid = Operation('mid', 'Identity')
        g.insert_op_between_ops(mid, g.operations['relu'], g.operations['pool'])
        order = [op.name for op in g.topological_sort()]
        assert order == ['conv', 'relu', 'mid', 'pool']

    def test_copy_independent(self):
        g = linear_graph()
        g2 = g.copy()
        assert set(g2.operations) == set(g.operations)
        g2.operations['conv'].attributes['kernel_shape'] = [5, 5]
        assert g.operations['conv'].attributes['kernel_shape'] == [3, 3]
        g2.variables['w'].value[:] = 0
        assert not np.allclose(g.variables['w'].value, 0)

    def test_copy_relinks_tqc_dominators(self):
        g = linear_graph()
        pol = QuantizationPolicy(QP.PER_TENSOR | QP.LINEAR | QP.SYMMETRICAL)
        for name in ('conv', 'relu'):
            op = g.operations[name]
            cfg = OperationQuantizationConfig(
                [TensorQuantizationConfig(pol) for _ in op.inputs],
                [TensorQuantizationConfig(pol) for _ in op.outputs])
            quantize_operation(g, name, cfg)
        conv, relu = g.operations['conv'], g.operations['relu']
        relu.config.input_quantization_config[0].dominated_by = \
            conv.config.output_quantization_config[0]
        g2 = g.copy()
        c2, r2 = g2.operations['conv'], g2.operations['relu']
        dom = r2.config.input_quantization_config[0].dominated_by
        assert dom is c2.config.output_quantization_config[0]
        assert dom is not conv.config.output_quantization_config[0]


class TestSocket:
    def test_reshape_soi(self):
        g = BaseGraph()
        x = g.create_variable('x')
        s = g.create_variable('s', value=np.array([1, -1], np.int64),
                              is_parameter=True)
        op = g.create_operation('Reshape', inputs=[x, s])
        g.create_variable('y', source_op=op)
        assert soi_input_indices(op) == [1]

    def test_conv_no_soi(self):
        g = linear_graph()
        assert soi_input_indices(g.operations['conv']) == []


class TestSearch:
    def test_path_matching(self):
        g = linear_graph()
        paths = SearchableGraph(g).path_matching(
            sp_expr='Conv', rp_expr='Relu', ep_expr='MaxPool')
        assert len(paths) == 1
        assert [op.name for op in paths[0]] == ['conv', 'relu', 'pool']

    def test_opset_matching(self):
        g = linear_graph()
        ops = SearchableGraph(g).opset_matching(
            sp_expr='Conv', rp_expr=lambda op: True)
        assert {op.name for op in ops} == {'conv', 'relu', 'pool'}

    def test_pattern_matching(self):
        g = linear_graph()
        m = SearchableGraph(g).pattern_matching(['Conv', 'Relu'], exclusive=True)
        assert len(m) == 1 and m[0][0].name == 'conv'


class TestMorph:
    def test_fuse_bn_numerics(self):
        """Conv+BN output must equal fused Conv output (reference
        testBnToConv.py)."""
        rng = np.random.RandomState(0)
        x = rng.randn(1, 3, 6, 6).astype(np.float32)
        w = rng.randn(4, 3, 3, 3).astype(np.float32)
        gamma = rng.rand(4).astype(np.float32) + 0.5
        beta = rng.randn(4).astype(np.float32)
        mean = rng.randn(4).astype(np.float32)
        var = rng.rand(4).astype(np.float32) + 0.5

        def conv2d(x, w, b):
            import jax
            import jax.numpy as jnp
            out = jax.lax.conv_general_dilated(
                jnp.asarray(x), jnp.asarray(w), (1, 1), 'VALID')
            return np.asarray(out + jnp.asarray(b).reshape(1, -1, 1, 1))

        ref = conv2d(x, w, np.zeros(4, np.float32))
        ref = (ref - mean.reshape(1, -1, 1, 1)) / np.sqrt(
            var.reshape(1, -1, 1, 1) + 1e-5)
        ref = ref * gamma.reshape(1, -1, 1, 1) + beta.reshape(1, -1, 1, 1)

        g = BaseGraph()
        xv = g.create_variable('x', shape=[1, 3, 6, 6])
        g.mark_as_input(xv)
        wv = g.create_variable('w', value=w, is_parameter=True)
        conv = g.create_operation('Conv', name='conv', inputs=[xv, wv],
                                  attributes={'kernel_shape': [3, 3]})
        cv = g.create_variable('cv', source_op=conv)
        bn_in = [cv]
        for nm, val in (('gamma', gamma), ('beta', beta), ('mean', mean), ('var', var)):
            bn_in.append(g.create_variable(nm, value=val, is_parameter=True))
        bn = g.create_operation('BatchNormalization', name='bn', inputs=bn_in,
                                attributes={'epsilon': 1e-5})
        y = g.create_variable('y', source_op=bn)
        g.mark_as_output(y)

        fuse_bn(g)
        assert 'bn' not in g.operations
        conv = g.operations['conv']
        assert len(conv.inputs) == 3  # bias added
        fused = conv2d(x, conv.inputs[1].value, conv.inputs[2].value)
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-4)

    def test_fuse_matmul_add(self):
        g = BaseGraph()
        x = g.create_variable('x', shape=[4, 8])
        g.mark_as_input(x)
        w = g.create_variable('w', value=np.random.randn(8, 16).astype(np.float32),
                              is_parameter=True)
        mm = g.create_operation('MatMul', name='mm', inputs=[x, w])
        mo = g.create_variable('mo', source_op=mm)
        b = g.create_variable('b', value=np.random.randn(16).astype(np.float32),
                              is_parameter=True)
        add = g.create_operation('Add', name='add', inputs=[mo, b])
        y = g.create_variable('y', source_op=add)
        g.mark_as_output(y)

        fuse_matmul_add(g)
        assert 'add' not in g.operations
        assert g.operations['mm'].type == 'Gemm'
        assert len(g.operations['mm'].inputs) == 3

    def test_format_constant_input(self):
        g = BaseGraph()
        c = g.create_operation('Constant', name='c',
                               attributes={'value': np.array([2.0], np.float32)})
        cv = g.create_variable('cv', source_op=c)
        x = g.create_variable('x', shape=[4])
        g.mark_as_input(x)
        add = g.create_operation('Add', name='add', inputs=[x, cv])
        y = g.create_variable('y', source_op=add)
        g.mark_as_output(y)
        format_graph(g)
        assert 'c' not in g.operations
        assert g.variables['cv'].is_parameter


class TestQuantable:
    def _quantize(self, g, name):
        op = g.operations[name]
        pol = QuantizationPolicy(QP.PER_TENSOR | QP.LINEAR | QP.SYMMETRICAL)
        cfg = OperationQuantizationConfig(
            [TensorQuantizationConfig(pol) for _ in op.inputs],
            [TensorQuantizationConfig(pol) for _ in op.outputs])
        return quantize_operation(g, name, cfg)

    def test_wrap_rewires(self):
        g = linear_graph()
        qop = self._quantize(g, 'conv')
        assert isinstance(g.operations['conv'], QuantableOperation)
        assert g.variables['x'].dest_ops[0] is qop
        assert g.variables['c_out'].source_op is qop

    def test_dequantize_restore(self):
        g = linear_graph()
        qop = self._quantize(g, 'conv')
        for c in qop.config:
            c.state = QuantizationStates.ACTIVATED
        original_w = np.array(g.variables['w'].value, copy=True)
        g.variables['w'].value = original_w * 2  # simulate baked modification
        qop.dequantize()
        np.testing.assert_allclose(g.variables['w'].value, original_w)
        assert all(c.state == QuantizationStates.FP32 for c in qop.config)
        qop.restore_quantize_state()
        assert all(c.state == QuantizationStates.ACTIVATED for c in qop.config)


def test_topological_sort_multi_edge_same_producer():
    """An op consuming SEVERAL outputs of one producer (both halves of a
    Split feeding one Concat) must sort: in-degree counts unique
    producers, matching the per-producer relaxation (regression: edge
    counting left Concat permanently blocked)."""
    import numpy as np
    from ppq_tpu.zoo import NetBuilder
    b = NetBuilder('splitjoin', seed=0)
    x = b.input('x', (1, 8, 4, 4))
    lo, hi = b.op('Split', [x], n_out=2, axis=1)
    y = b.concat([lo, hi], axis=1)
    b.output(y)
    order = [op.name for op in b.g.topological_sort()]
    assert len(order) == 2 and order[0].startswith('split')
    # and it executes
    from ppq_tpu import TPUExecutor
    xv = np.random.RandomState(0).randn(1, 8, 4, 4).astype(np.float32)
    out = np.asarray(TPUExecutor(b.g).forward(xv)[0])
    np.testing.assert_allclose(out, xv, atol=0)
