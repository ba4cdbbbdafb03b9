"""Integer-exact simulation (CompiledGraph precision='int').

The lowering runs quantized Conv/Gemm/MatMul over centered integer codes on
the bf16 MXU with an fp32 accumulator — exact integer arithmetic (what a
real int8 backend computes), scales factored onto the output axis. Checks:

  * gold: the lowered conv matches an int64/f64 integer-arithmetic
    reference bit-exactly (per-channel weights, asymmetric activations,
    passive bias) — the strongest possible exactness claim;
  * parity: outputs agree with the fp32 'highest' simulation to the fp32
    accumulation-rounding level (predictions stable);
  * engagement: every quantized Conv/ConvTranspose/Gemm/MatMul actually
    takes the lowered path (a silent fallback would still pass parity);
  * fallback: >8-bit schemes (codes not exact in bf16) fall back to the
    generic fp32 path and remain bitwise identical to 'highest'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.quantization.qfunction import ppq_fake_quant
from ppq_tpu.zoo.builder import NetBuilder
from ppq_tpu.zoo.segmentation import unet_lite
from ppq_tpu.zoo.vision import mobilenet_v2, resnet18, tiny_cnn


def _quantize(graph, shape, seed=3, steps=4):
    rng = np.random.RandomState(seed)
    loader = [rng.randn(*shape).astype(np.float32) for _ in range(steps)]
    quantize_graph(graph, loader, calib_steps=steps,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    return loader


def _int_eligible_ops(graph):
    from ppq_tpu.executor.compile import INT_EXACT_TYPES
    from ppq_tpu.ir import QuantableOperation
    return [op.name for op in graph.operations.values()
            if isinstance(op, QuantableOperation)
            and op.type in INT_EXACT_TYPES]


def _snr(a, b):
    return float(np.sum((a - b) ** 2) / (np.sum(a ** 2) + 1e-12))


def test_int_exact_matches_int64_reference_conv():
    """Gold check: lowered conv == integer arithmetic in f64, bit-exact."""
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    loader = _quantize(graph, (2, 3, 16, 16))
    op = next(o for o in graph.topological_sort() if o.type == 'Conv')
    cfgs = op.config.input_quantization_config
    x = loader[0]

    cx = cfgs[0].dominated_by
    sx = np.float32(cx.scale)
    ox = np.round(np.asarray(cx.offset, np.float32))
    qx = np.clip(np.round((x / sx).astype(np.float32)) + ox,
                 cx.quant_min, cx.quant_max) - ox
    w = np.asarray(op.inputs[1].value, np.float32)
    cw = cfgs[1]
    sw = np.asarray(cw.scale, np.float32)
    qw = np.clip(np.round(w / sw.reshape(-1, 1, 1, 1)),
                 cw.quant_min, cw.quant_max)
    pads = op.attributes.get('pads', [0] * 4)
    yint = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(qx), jnp.asarray(qw),
        window_strides=[int(s) for s in op.attributes.get('strides', [1, 1])],
        padding=[(int(pads[i]), int(pads[i + 2])) for i in range(2)],
        precision=jax.lax.Precision.HIGHEST)).astype(np.float64)
    assert np.all(yint == np.round(yint)), 'integer reference not integer'
    yref = yint * (sx * sw.reshape(1, -1, 1, 1))
    if len(op.inputs) > 2:
        bq = np.asarray(ppq_fake_quant(
            jnp.asarray(np.asarray(op.inputs[2].value, np.float32)),
            cfgs[2]))
        yref = yref + bq.reshape(1, -1, 1, 1)
    yref_q = np.asarray(ppq_fake_quant(
        jnp.asarray(yref.astype(np.float32)),
        op.config.output_quantization_config[0]))

    span = compile_graph(graph, output_names=[op.outputs[0].name],
                         precision='int')
    got = np.asarray(span.make_runner()(x)[0])
    assert op.name in span.int_lowered
    np.testing.assert_array_equal(got, yref_q)


def test_int_parity_and_engagement_tiny():
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    loader = _quantize(graph, (2, 3, 16, 16))
    run_hi = compile_graph(graph).make_runner()
    cg = compile_graph(graph, precision='int')
    run_int = cg.make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    b = np.asarray(run_int(loader[0])[0])
    assert sorted(cg.int_lowered) == sorted(_int_eligible_ops(graph))
    assert _snr(a, b) < 1e-4
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_int_parity_resnet18_all_convs_lowered():
    graph = resnet18(num_classes=10, input_shape=[2, 3, 32, 32])
    loader = _quantize(graph, (2, 3, 32, 32))
    run_hi = compile_graph(graph).make_runner()
    cg = compile_graph(graph, precision='int')
    run_int = cg.make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    b = np.asarray(run_int(loader[0])[0])
    assert sorted(cg.int_lowered) == sorted(_int_eligible_ops(graph))
    # fp32-vs-integer accumulation rounding can flip codes at grid ties;
    # the cascade through 20 layers stays at the 1e-3 SNR level
    assert _snr(a, b) < 5e-3
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_int_parity_mobilenet_depthwise():
    graph = mobilenet_v2(num_classes=10, input_shape=[2, 3, 32, 32])
    loader = _quantize(graph, (2, 3, 32, 32))
    run_hi = compile_graph(graph).make_runner()
    cg = compile_graph(graph, precision='int')
    run_int = cg.make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    b = np.asarray(run_int(loader[0])[0])
    assert sorted(cg.int_lowered) == sorted(_int_eligible_ops(graph))
    assert _snr(a, b) < 5e-3


def test_int_parity_unet_convtranspose():
    graph = unet_lite(in_size=16, batch=2)
    loader = _quantize(graph, (2, 3, 16, 16))
    run_hi = compile_graph(graph).make_runner()
    cg = compile_graph(graph, precision='int')
    run_int = cg.make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    b = np.asarray(run_int(loader[0])[0])
    assert any(op.name in cg.int_lowered
               for op in graph.operations.values()
               if op.type == 'ConvTranspose')
    assert _snr(a, b) < 5e-3


def test_int_parity_gemm_transb_and_matmul():
    b = NetBuilder('gm', seed=7)
    x = b.input('x', [4, 8])
    h = b.op('Gemm', [x, b.param(b.rng.randn(16, 8) * 0.3),
                      b.param(b.rng.randn(16) * 0.01)],
             alpha=1.0, beta=1.0, transA=0, transB=1)
    h = b.op('Relu', [h])
    h = b.gemm(h, 16, 12)                      # transB=0
    h = b.op('Relu', [h])
    y = b.matmul(h, b.param(b.rng.randn(12, 6) * 0.3))
    b.output(y)
    graph = b.g
    loader = _quantize(graph, (4, 8))
    run_hi = compile_graph(graph).make_runner()
    cg = compile_graph(graph, precision='int')
    run_int = cg.make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    c = np.asarray(run_int(loader[0])[0])
    assert sorted(cg.int_lowered) == sorted(_int_eligible_ops(graph))
    assert _snr(a, c) < 1e-4


def test_int_codes_propagate_through_resnet_elementwise():
    """The code-propagation layer: Relu/MaxPool/Add/GAP/Flatten run ON
    integer codes (bf16) — activations between lowered ops never
    materialize as fp32 dequants. Engagement + parity."""
    graph = resnet18(num_classes=10, input_shape=[2, 3, 32, 32])
    loader = _quantize(graph, (2, 3, 32, 32))
    run_hi = compile_graph(graph).make_runner()
    cg = compile_graph(graph, precision='int')
    run_int = cg.make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    b = np.asarray(run_int(loader[0])[0])
    coded_types = {graph.operations[n].type for n in cg.int_coded}
    # every residual Add and the stem MaxPool must ride the code path
    n_adds = sum(1 for o in graph.operations.values() if o.type == 'Add')
    assert sum(1 for n in cg.int_coded
               if graph.operations[n].type == 'Add') == n_adds
    assert {'Relu', 'MaxPool', 'Add', 'GlobalAveragePool'} <= coded_types
    # weights ship as pre-coded bf16 codes
    assert len(cg._precoded) == sum(
        1 for o in graph.operations.values() if o.type in ('Conv', 'Gemm'))
    assert _snr(a, b) < 5e-3
    assert (a.argmax(-1) == b.argmax(-1)).all()


def test_int_coded_chain_matches_int64_reference():
    """Gold check through the CODE-PROPAGATED path: Conv→Relu→MaxPool→Conv.
    The conv-relu pair is fused (no quant between them); the quant site
    after the Relu emits CODES, the MaxPool propagates them (order-
    preserving on codes), and the second conv consumes them directly. The
    whole chain matches explicit integer arithmetic bit-exactly."""
    b = NetBuilder('chain', seed=11)
    x = b.input('x', [2, 4, 8, 8])
    h = b.conv(x, 4, 8, k=3, pad=1, bias=True)
    h = b.op('Relu', [h])
    h = b.op('MaxPool', [h], kernel_shape=[2, 2], strides=[2, 2],
             pads=[0, 0, 0, 0])
    y = b.conv(h, 8, 6, k=3, pad=1, bias=True)
    b.output(y)
    graph = b.g
    loader = _quantize(graph, (2, 4, 8, 8))
    cg = compile_graph(graph, precision='int')
    got = np.asarray(cg.make_runner()(loader[0])[0])
    assert len(cg.int_lowered) == 2
    assert any(graph.operations[n].type == 'MaxPool' for n in cg.int_coded)

    # explicit integer-arithmetic reference in float64
    def codes_of(v, cfg, axis=None):
        # the quotient is computed in f32 — exactly what the engine's
        # linear_quant_codes does (an f64 quotient can round differently
        # at grid ties)
        s = np.asarray(cfg.scale, np.float64)
        o = np.round(np.asarray(cfg.offset, np.float64))
        if axis is not None:
            sh = [1] * v.ndim
            sh[axis] = -1
            s, o = s.reshape(sh), o.reshape(sh)
        q32 = np.round(v.astype(np.float32) / s.astype(np.float32))
        q = np.clip(q32.astype(np.float64) + o, cfg.quant_min, cfg.quant_max)
        return (q - o).astype(np.float64), s

    def run_conv(op, cx, sx):
        cfgs = op.config.input_quantization_config
        w = np.asarray(op.inputs[1].value, np.float64)
        cw, sw = codes_of(w, cfgs[1], axis=0)
        pads = [int(p) for p in op.attributes.get('pads', [0] * 4)]
        yint = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(cx), jnp.asarray(cw),
            window_strides=[1, 1],
            padding=[(pads[0], pads[2]), (pads[1], pads[3])],
            precision=jax.lax.Precision.HIGHEST)).astype(np.float64)
        assert np.all(yint == np.round(yint))
        y = yint * (sx * sw.reshape(1, -1, 1, 1))
        bq = np.asarray(ppq_fake_quant(
            jnp.asarray(np.asarray(op.inputs[2].value, np.float32)),
            cfgs[2])).astype(np.float64)
        return y + bq.reshape(1, -1, 1, 1)

    ops = [o for o in graph.topological_sort() if o.type == 'Conv']
    relu = next(o for o in graph.topological_sort() if o.type == 'Relu')
    c0 = ops[0].config.input_quantization_config[0].dominated_by
    cx, sx = codes_of(loader[0].astype(np.float64), c0)
    y1 = run_conv(ops[0], cx, float(sx))
    y1 = np.maximum(y1, 0.0)
    rcfg = relu.config.output_quantization_config[0].dominated_by
    c1, s1 = codes_of(y1.astype(np.float64), rcfg)
    # the MaxPool's input/output sites may be active on their own grids
    # (pooling alignment / independent calibration) — model the runtime
    # requantization at each active site, in f32 like the engine
    mp = next(o for o in graph.topological_sort() if o.type == 'MaxPool')

    def maybe_requant(c, s, cfg):
        v32 = (c.astype(np.float32) * np.float32(s))
        return codes_of(v32.astype(np.float64), cfg)

    mp_in = mp.config.input_quantization_config[0]
    if mp_in.is_active:
        c1, s1 = maybe_requant(c1, s1, mp_in)
    # MaxPool on codes (2x2/2, no padding): order-preserving integer max
    n, c, hh, ww = c1.shape
    c1 = c1.reshape(n, c, hh // 2, 2, ww // 2, 2).max(axis=(3, 5))
    mp_out = mp.config.output_quantization_config[0]
    if mp_out.is_active and mp_out.dominated_by._uid != rcfg._uid:
        c1, s1 = maybe_requant(c1, s1, mp_out)
    y2 = run_conv(ops[1], c1, float(s1))
    ocfg = ops[1].config.output_quantization_config[0]
    ref = np.asarray(ppq_fake_quant(jnp.asarray(y2.astype(np.float32)),
                                    ocfg))
    np.testing.assert_array_equal(got, ref)


def test_int_accum_guard_rejects_oversized_reductions():
    """int_accum_guard=True refuses the lowering when the worst-case fp32
    partial sum could exceed 2^24 (reduction_len * 128 * 128 bound)."""
    b = NetBuilder('big', seed=5)
    x = b.input('x', [2, 2048])
    y = b.matmul(x, b.param(b.rng.randn(2048, 8) * 0.05))
    b.output(y)
    graph = b.g
    loader = _quantize(graph, (2, 2048))
    cg = compile_graph(graph, precision='int')
    _ = cg.make_runner()(loader[0])
    mm = next(o.name for o in graph.operations.values()
              if o.type == 'MatMul')
    assert mm in cg.int_lowered          # default: lowered, but flagged
    assert mm in cg.int_accum_risk
    cgg = compile_graph(graph, precision='int', int_accum_guard=True)
    a = np.asarray(cgg.make_runner()(loader[0])[0])
    assert mm not in cgg.int_lowered     # guard: falls back to fp32 path
    hi = np.asarray(compile_graph(graph).make_runner()(loader[0])[0])
    np.testing.assert_array_equal(a, hi)


def test_int_matmul_1d_rhs_per_tensor_only():
    """A 1-D MatMul rhs offers only the contraction axis — a per-channel
    scale there must NOT be accepted (it cannot factor out of the dot)."""
    b = NetBuilder('mv', seed=9)
    x = b.input('x', [4, 8])
    y = b.matmul(x, b.param(b.rng.randn(8) * 0.3))
    b.output(y)
    graph = b.g
    loader = _quantize(graph, (4, 8))
    op = next(o for o in graph.operations.values() if o.type == 'MatMul')
    wcfg = op.config.input_quantization_config[1]
    run_hi = compile_graph(graph).make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    cg = compile_graph(graph, precision='int')
    c = np.asarray(cg.make_runner()(loader[0])[0])
    if bool(wcfg.policy.per_channel):
        # per-channel scale on the contraction axis → must fall back
        assert op.name not in cg.int_lowered
        np.testing.assert_array_equal(a, c)
    else:
        assert op.name in cg.int_lowered
        assert _snr(a, c) < 1e-6


def test_int_fallback_16bit_scheme_identical_to_highest():
    graph = tiny_cnn(input_shape=(2, 3, 16, 16))
    loader = _quantize(graph, (2, 3, 16, 16))
    op = next(o for o in graph.topological_sort() if o.type == 'Conv')
    wcfg = op.config.input_quantization_config[1]
    # widen the weight scheme to 16 bit: codes are no longer bf16-exact, so
    # the lowering must reject this op (and only this op)
    wcfg.num_of_bits = 16
    wcfg.quant_min, wcfg.quant_max = -32768, 32767
    wcfg.scale = np.asarray(wcfg.scale, np.float32) / 256.0
    run_hi = compile_graph(graph).make_runner()
    cg = compile_graph(graph, precision='int')
    run_int = cg.make_runner()
    a = np.asarray(run_hi(loader[0])[0])
    c = np.asarray(run_int(loader[0])[0])
    assert op.name not in cg.int_lowered
    assert len(cg.int_lowered) == len(_int_eligible_ops(graph)) - 1
    assert _snr(a, c) < 1e-4
