"""Compiled whole-graph executor parity vs the eager interpreter."""

import jax
import jax.numpy as jnp
import numpy as np

from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
from ppq_tpu.executor import CompiledGraph, compile_graph
from ppq_tpu.zoo.vision import tiny_cnn


def _quantized_tiny():
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    rng = np.random.RandomState(3)
    loader = [rng.randn(2, 3, 16, 16).astype(np.float32) for _ in range(4)]
    quantize_graph(graph, loader, calib_steps=4,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return graph, loader


def test_compiled_matches_eager_fp32():
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    eager = np.asarray(TPUExecutor(graph).forward(x)[0])
    run = compile_graph(graph).make_runner()
    compiled = np.asarray(run(x)[0])
    np.testing.assert_allclose(compiled, eager, rtol=1e-5, atol=1e-5)


def test_compiled_matches_eager_quantized():
    graph, loader = _quantized_tiny()
    ex = TPUExecutor(graph)
    run = compile_graph(graph).make_runner()
    for x in loader[:2]:
        eager = np.asarray(ex.forward(x)[0])
        compiled = np.asarray(run(x)[0])
        np.testing.assert_allclose(compiled, eager, rtol=1e-4, atol=1e-5)


def test_trainable_forward_grads_flow():
    graph, loader = _quantized_tiny()
    cg = compile_graph(graph)
    params = cg.init_params()
    qparams = cg.init_qparams()
    assert len(qparams) > 0, 'no trainable qparams found'
    fwd = cg.build_trainable_forward()
    x = {list(graph.inputs)[0]: jnp.asarray(loader[0])}

    def loss(qp):
        out = fwd(params, qp, x)[0]
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(qparams)
    total = sum(float(jnp.sum(jnp.abs(g['scale']))) for g in grads.values())
    assert np.isfinite(total)
    assert total > 0, 'scale gradients are identically zero'


def test_calibration_forward_stats():
    graph, loader = _quantized_tiny()
    # reset one activation TQC to INITIAL to observe stats flow
    from ppq_tpu.core import QuantizationStates
    from ppq_tpu.ir import QuantableOperation
    n_reset = 0
    for op in graph.operations.values():
        if isinstance(op, QuantableOperation):
            for cfg in op.config.output_quantization_config:
                if cfg.is_root and cfg.state == QuantizationStates.ACTIVATED \
                        and n_reset < 3:
                    cfg.state = QuantizationStates.INITIAL
                    n_reset += 1
    assert n_reset > 0
    cg = compile_graph(graph)
    fn = cg.build_calibration_forward('minmax')
    params = cg.init_params()
    outs, stats = fn(params, {list(graph.inputs)[0]: jnp.asarray(loader[0])})
    assert len(stats) >= n_reset
    for k, (lo, hi) in stats.items():
        assert float(jnp.min(hi - lo)) >= 0


def test_qparam_writeback():
    graph, _ = _quantized_tiny()
    cg = compile_graph(graph)
    qparams = cg.init_qparams()
    bumped = {k: {'scale': v['scale'] * 2.0, 'offset': v['offset']}
              for k, v in qparams.items()}
    cg.write_back_qparams(bumped)
    fresh = cg.init_qparams()
    for k in qparams:
        np.testing.assert_allclose(np.asarray(fresh[k]['scale']),
                                   np.asarray(qparams[k]['scale']) * 2.0,
                                   rtol=1e-6)


class TestBf16DeployMode:
    def test_bf16_storage_matches_sim(self):
        """precision='bf16' stores tensors in bfloat16 (HBM-bound deploy
        path); outputs stay fp32 and must track the fp32-faithful sim to
        bf16 rounding error."""
        from ppq_tpu import TargetPlatform, quantize_graph
        from ppq_tpu.executor import compile_graph
        from ppq_tpu.zoo.vision import tiny_cnn
        g = tiny_cnn(input_shape=(4, 3, 32, 32))
        loader = [np.random.RandomState(i).randn(4, 3, 32, 32)
                  .astype(np.float32) for i in range(4)]
        quantize_graph(g, loader, calib_steps=4,
                       platform=TargetPlatform.TPU_INT8, verbose=False)
        cg = compile_graph(g, precision='bf16')
        # weights live in bf16; io contract stays fp32
        params = cg.init_params()
        assert all(v.dtype == jnp.bfloat16 for v in params.values())
        a = np.asarray(compile_graph(g).make_runner()(loader[0])[0])
        b = np.asarray(cg.make_runner()(loader[0])[0])
        assert b.dtype == np.float32
        snr = float(np.sum((a - b) ** 2) / (np.sum(a ** 2) + 1e-12))
        assert snr < 0.01, snr


def test_quantile_bisect_matches_numpy_quantile():
    """The TPU percentile path (24-step bisection, no sort/histogram) must
    agree with the exact quantile to bisection resolution."""
    import numpy as np

    from ppq_tpu.core import QuantizationStates
    from ppq_tpu.ir import QuantableOperation

    graph, loader = _quantized_tiny()
    names = []
    for op in graph.operations.values():
        if isinstance(op, QuantableOperation):
            for var, cfg in zip(op.outputs,
                                op.config.output_quantization_config):
                if cfg.is_root and \
                        cfg.state == QuantizationStates.ACTIVATED and \
                        len(names) < 2:
                    cfg.state = QuantizationStates.INITIAL
                    names.append(var.name)
    assert names
    cg = compile_graph(graph)
    pct = 0.99
    spec = {n: {'kind': 'quantile_bisect', 'percentile': pct}
            for n in names}
    fn = cg.build_calibration_forward(spec)
    params = cg.init_params()
    # reference values: run the plain forward and quantile the outputs
    fwd = compile_graph(graph, output_names=names).make_runner()
    refs = [np.asarray(o).reshape(-1) for o in fwd(loader[0])]
    _, stats = fn(params, {list(graph.inputs)[0]: jnp.asarray(loader[0])})
    for name, ref in zip(names, refs):
        lo, hi = stats[name]
        lo, hi = float(lo), float(hi)
        srt = np.sort(ref)
        n_el = len(srt)

        def order_window(q):
            # the bisected threshold lands on the 'higher' order statistic
            # of count >= q*n (within 2^-24 of range); allow the couple of
            # order stats around the interpolated quantile
            i = int(q * n_el)
            return (srt[max(i - 2, 0)], srt[min(i + 2, n_el - 1)])

        lo_lo, lo_hi = order_window(1 - pct)
        hi_lo, hi_hi = order_window(pct)
        eps = float(srt[-1] - srt[0]) / 4096 + 1e-7
        assert hi_lo - eps <= hi <= hi_hi + eps, (hi, hi_lo, hi_hi)
        assert lo_lo - eps <= lo <= lo_hi + eps, (lo, lo_lo, lo_hi)
        # the bisected threshold must actually bracket the mass
        assert np.mean(ref <= hi + eps) >= pct - 2.0 / n_el
        assert np.mean(ref <= lo + eps) >= (1 - pct) - 2.0 / n_el
