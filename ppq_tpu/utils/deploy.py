"""Deployment & benchmarking utilities — the TPU-native equivalent of the
reference's backend deploy helpers (ppq/utils/TensorRTUtil.py:380 engine
build/benchmark, OnnxruntimeUtil, OpenvinoUtil).

Where TensorRT builds a serialized engine from a QDQ onnx file, the TPU
deployment artifact is a serialized **StableHLO executable** (jax.export)
of the whole-graph compiled forward with the quantized weights baked in —
self-contained, loadable without the framework, runnable on any matching
jax runtime:

    export_compiled_artifact(graph, 'model.stablehlo')      # "engine build"
    run = load_compiled_artifact('model.stablehlo')         # "engine load"
    y = run(x)

`benchmark_graph` mirrors TensorRTUtil.Benchmark (throughput sweep +
latency; adds MFU, which TensorRT does not report), and `profile_graph`
wraps `jax.profiler.trace` so a timeline lands in TensorBoard format
(SURVEY §5 tracing requirement).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np


def _example_inputs(graph, batch: Optional[int] = None) -> Dict[str, np.ndarray]:
    feed = {}
    for name, var in graph.inputs.items():
        shape = list(var.shape or [1])
        if batch is not None and len(shape) >= 1:
            shape[0] = batch
        feed[name] = np.zeros(shape, np.float32)
    return feed


def export_compiled_artifact(graph, path: str, precision: str = 'default',
                             batch: Optional[int] = None) -> str:
    """Compile the (quantized) graph to a single XLA program and serialize
    it as a self-contained StableHLO artifact (weights baked in). Returns
    the written path. The TPU analogue of TensorRT's engine build."""
    import jax
    from jax import export as jexport
    from ..executor.compile import compile_graph

    cg = compile_graph(graph, precision=precision)
    params = jax.device_put(cg.init_params())
    fwd = cg.build_forward()
    example = {k: jax.numpy.asarray(v)
               for k, v in _example_inputs(graph, batch).items()}

    def fn(inputs):
        return fwd(params, inputs)

    exp = jexport.export(jax.jit(fn))(example)
    data = exp.serialize()
    with open(path, 'wb') as f:
        f.write(data)
    return path


def load_compiled_artifact(path: str):
    """Load a StableHLO artifact; returns run(inputs_dict_or_array) →
    [outputs]. The TPU analogue of TensorRT's engine deserialize."""
    from jax import export as jexport
    with open(path, 'rb') as f:
        exp = jexport.deserialize(bytearray(f.read()))
    in_names = None

    def run(inputs):
        nonlocal in_names
        if not isinstance(inputs, dict):
            # single-input convenience
            tree = exp.in_tree.unflatten(
                [0] * exp.in_tree.num_leaves)
            keys = sorted(tree[0][0].keys()) if tree else None
            inputs = {keys[0]: inputs} if keys else inputs
        return exp.call(inputs)
    return run


def benchmark_graph(graph, batch_sizes: Sequence[int] = (1, 8, 64),
                    precision: str = 'default', iters: int = 20,
                    warmup: int = 2) -> List[dict]:
    """Throughput/latency sweep of the compiled graph with device-resident
    inputs (reference: TensorRTUtil.Benchmark); adds MFU per batch."""
    import jax
    from ..executor.compile import compile_graph
    from .flops import graph_flops, mfu

    cg = compile_graph(graph, precision=precision)
    run = cg.make_runner()
    base_batch = None
    for var in graph.inputs.values():
        if var.shape:
            base_batch = int(var.shape[0])
            break
    fl = graph_flops(graph)
    flops_per_item = fl / max(base_batch or 1, 1)

    rows = []
    for batch in batch_sizes:
        x = {k: jax.device_put(v)
             for k, v in _example_inputs(graph, batch).items()}
        feed = list(x.values())[0] if len(x) == 1 else x
        out = run(feed)[0]
        out.block_until_ready()
        for _ in range(warmup):
            out = run(feed)[0]
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(feed)[0]
        out.block_until_ready()
        dt = time.perf_counter() - t0
        ips = batch * iters / dt
        rows.append({
            'batch': batch,
            'items_per_sec': round(ips, 2),
            'latency_ms': round(dt / iters * 1e3, 3),
            'mfu': (round(mfu(flops_per_item, ips), 4)
                    if mfu(flops_per_item, ips) is not None else None),
        })
    return rows


def profile_graph(graph, logdir: str, precision: str = 'default',
                  iters: int = 5, batch: Optional[int] = None) -> str:
    """Capture a jax.profiler timeline of the compiled forward into
    `logdir` (TensorBoard trace-viewer format). SURVEY §5: the reference
    has no timeline profiler; this is the TPU-native instrumentation."""
    import jax
    from ..executor.compile import compile_graph
    cg = compile_graph(graph, precision=precision)
    run = cg.make_runner()
    x = {k: jax.device_put(v)
         for k, v in _example_inputs(graph, batch).items()}
    feed = list(x.values())[0] if len(x) == 1 else x
    out = run(feed)[0]
    out.block_until_ready()                       # compile outside trace
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            out = run(feed)[0]
        out.block_until_ready()
    return logdir
