"""Graph FLOP counting for MFU reporting.

Counts 2*MACs for the compute-dominant ops (Conv/ConvTranspose/Gemm/MatMul/
PPQBiasFusedMatMul) from traced variable shapes. Elementwise/reduction work
is ignored (sub-1% on CNN/transformer graphs) — this is the standard
model-FLOPs-utilization numerator (MFU = model_flops/sec ÷ peak_flops).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def op_flops(op) -> int:
    """FLOPs (2*MACs) of one op from its variables' traced shapes; 0 if
    shapes are unknown or the op is not a dense-compute type."""
    t = op.type
    try:
        if t in ('Conv', 'ConvTranspose'):
            w = op.inputs[1]
            out = op.outputs[0]
            if w.shape is None or out.shape is None:
                return 0
            groups = int(op.attributes.get('group', 1))
            if t == 'Conv':
                # w: (Cout, Cin/g, *k); out: (N, Cout, *spatial)
                macs = _prod(out.shape) * _prod(w.shape[1:])
            else:
                # w: (Cin, Cout/g, *k); macs = in_spatial * Cin * Cout/g * k
                x = op.inputs[0]
                if x.shape is None:
                    return 0
                macs = _prod(x.shape) * _prod(w.shape[1:])
            bias = 0
            if len(op.inputs) > 2 and out.shape is not None:
                bias = _prod(out.shape)
            return 2 * macs + bias
        if t in ('Gemm', 'MatMul', 'PPQBiasFusedMatMul'):
            a, b = op.inputs[0], op.inputs[1]
            out = op.outputs[0]
            if b.shape is None or out.shape is None:
                return 0
            k = int(b.shape[0])
            if t == 'Gemm' and int(op.attributes.get('transB', 0)):
                k = int(b.shape[-1])
            return 2 * _prod(out.shape) * k
    except (TypeError, IndexError):
        return 0
    return 0


def graph_flops(graph, inputs=None) -> int:
    """Total forward FLOPs of the graph. If variable shapes are missing and
    `inputs` is given, runs a meta trace first."""
    total = sum(op_flops(op) for op in graph.operations.values())
    if total == 0 and inputs is not None:
        from ..executor import TPUExecutor
        TPUExecutor(graph).tracing_operation_meta(inputs)
        total = sum(op_flops(op) for op in graph.operations.values())
    return total


# peak dense-matmul throughput per chip, FLOP/s — used as the MFU denominator
_TPU_PEAKS = {
    # device_kind substring → (bf16 peak, int8 peak)
    'v5 lite': (197e12, 394e12),
    'v5e': (197e12, 394e12),
    'v5p': (459e12, 918e12),
    'v6 lite': (918e12, 1836e12),
    'v6e': (918e12, 1836e12),
    'v4': (275e12, 275e12),
}


def device_peak_flops(dtype: str = 'bf16') -> Optional[float]:
    """Peak FLOP/s of jax device 0, or None when unknown."""
    import jax
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for key, (bf16, int8) in _TPU_PEAKS.items():
        if key in kind:
            return int8 if dtype == 'int8' else bf16
    return None


def mfu(model_flops_per_item: int, items_per_sec: float,
        dtype: str = 'bf16') -> Optional[float]:
    """Model FLOPs utilization in [0, 1], or None off-TPU."""
    peak = device_peak_flops(dtype)
    if peak is None or model_flops_per_item <= 0:
        return None
    return model_flops_per_item * items_per_sec / peak
