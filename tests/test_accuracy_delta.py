"""Accuracy-delta protocol test: train a small classifier to competence on a
synthetic task, quantize it, and require the INT8 top-1 drop to stay within
the reference-style PTQ gap (BASELINE.md: ResNet-18 Δ≈0.38pt, MobileNetV2
Δ≈0.89pt — we allow 2pt on this tiny task)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ppq_tpu import TargetPlatform, quantize_graph
from ppq_tpu.executor import compile_graph
from ppq_tpu.zoo import tiny_cnn
from ppq_tpu.zoo.evaluate import evaluate_classification


def synthetic_task(n=512, seed=0):
    """Linearly-separable-ish 10-class images: class k has a bright blob at
    a class-specific location plus noise."""
    rng = np.random.RandomState(seed)
    xs, ys = [], []
    for i in range(n):
        k = i % 10
        img = rng.randn(3, 16, 16).astype(np.float32) * 0.3
        r, c = divmod(k, 4)
        img[:, 3 + r * 4: 6 + r * 4, 2 + c * 3: 5 + c * 3] += 2.0
        xs.append(img)
        ys.append(k)
    return np.stack(xs), np.asarray(ys, np.int32)


def classifier_graph():
    """conv→relu→pool→conv→relu→flatten→gemm — flatten head keeps the
    location feature (GAP would average it away)."""
    from ppq_tpu.zoo.builder import NetBuilder
    b = NetBuilder('clf', seed=7)
    x = b.input('x', [32, 3, 16, 16])
    y = b.relu(b.conv(x, 3, 8, 3, bias=True))
    y = b.maxpool(y, 2, 2)
    y = b.relu(b.conv(y, 8, 8, 3, bias=True))
    y = b.maxpool(y, 2, 2)
    y = b.flatten(y)
    y = b.gemm(y, 8 * 4 * 4, 10)
    b.output(y)
    return b.g


@pytest.mark.slow
def test_int8_top1_delta_within_reference_gap():
    graph = classifier_graph()
    xs, ys = synthetic_task(512)

    # --- train the graph's parameters with the compiled trainable forward --
    cg = compile_graph(graph)
    fwd = cg.build_trainable_forward()
    params = cg.init_params()
    in_name = list(graph.inputs)[0]

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb):
        logits = fwd(p, {}, {in_name: xb})[0]
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, yb))

    @jax.jit
    def step(p, o, xb, yb):
        l, g = jax.value_and_grad(loss_fn)(p, xb, yb)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    for epoch in range(15):
        for i in range(0, 512, 32):
            xb = jnp.asarray(xs[i:i + 32])
            yb = jnp.asarray(ys[i:i + 32])
            params, opt_state, l = step(params, opt_state, xb, yb)

    # write trained weights back into the IR
    for name, val in params.items():
        graph.variables[name].value = np.asarray(val)

    eval_loader = [(xs[i:i + 32], ys[i:i + 32]) for i in range(0, 512, 32)]
    fp32 = evaluate_classification(graph, eval_loader)
    assert fp32['top1'] > 0.9, f'training failed: {fp32}'

    # --- quantize & measure the drop -------------------------------------
    calib = [xs[i:i + 32] for i in range(0, 256, 32)]
    quantize_graph(graph, calib, calib_steps=8,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    int8 = evaluate_classification(graph, eval_loader)

    delta = fp32['top1'] - int8['top1']
    assert delta <= 0.02, (f"INT8 top-1 delta {delta * 100:.2f}pt exceeds "
                           f"the 2pt budget (fp32 {fp32['top1']:.3f}, "
                           f"int8 {int8['top1']:.3f})")
