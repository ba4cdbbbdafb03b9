"""Default op library: ONNX op semantics in JAX.

Redesign of ppq/executor/op/torch/default.py (94 forward functions /
99-entry DEFAULT_BACKEND_TABLE at :3642-3743). Every function has signature

    f(op: Operation, values: List[Array], ctx: ExecContext) -> Array | tuple

Arrays are jnp (activations) or numpy (SOI values — shapes/indices computed
eagerly on host, mirroring the reference's CPU dispatch of SOI subgraphs).
Simulation fidelity: matmuls/convs run with precision=_prec() and fp32
accumulation — quantization error measurements must not be polluted by
bf16 MXU rounding (TPUs default to bf16 matmul otherwise).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import DataType, ppq_warning

# Simulation fidelity vs deployment speed: quantization-error measurement
# needs fp32 matmul accumulation (HIGHEST); deployment-mode inference of an
# already-quantized graph can ride the bf16 MXU fast path (DEFAULT) — the
# int8 grid snap dominates bf16 rounding there. Switch via
# `simulation_precision('default')` (used by CompiledGraph deploy mode).
_PRECISION = [jax.lax.Precision.HIGHEST]


class simulation_precision:
    """Context manager scoping the matmul/conv precision of the op library."""

    def __init__(self, mode: str = 'highest'):
        # 'default' and 'bf16' both ride the MXU bf16 fast path; 'bf16'
        # additionally stores tensors in bfloat16 (CompiledGraph casts).
        # 'int' (integer-exact simulation) keeps fallback ops at fp32
        # fidelity — its quantized matmuls get DEFAULT precision scoped
        # around each lowered call by CompiledGraph itself.
        self._new = (jax.lax.Precision.HIGHEST if mode in ('highest', 'int')
                     else jax.lax.Precision.DEFAULT)

    def __enter__(self):
        self._old = _PRECISION[0]
        _PRECISION[0] = self._new
        return self

    def __exit__(self, *exc):
        _PRECISION[0] = self._old


def _prec():
    return _PRECISION[0]


# Accumulation dtype of matmuls/convs (preferred_element_type). The
# integer-exact simulation path (executor/compile.py) feeds bf16 integer
# codes into the MXU and needs the f32 accumulator to come back un-cast —
# bf16 inputs otherwise return bf16 outputs, destroying the exactness.
_ACCUM_DTYPE = [None]


class accumulation_dtype:
    """Context manager scoping the preferred_element_type of the op
    library's matmuls/convs (None = follow input dtype)."""

    def __init__(self, dtype=None):
        self._new = dtype

    def __enter__(self):
        self._old = _ACCUM_DTYPE[0]
        _ACCUM_DTYPE[0] = self._new
        return self

    def __exit__(self, *exc):
        _ACCUM_DTYPE[0] = self._old


def _accum():
    return _ACCUM_DTYPE[0]


HIGHEST = jax.lax.Precision.HIGHEST


class ExecContext:
    """Per-forward context handed to every op fn (reference:
    op/torch/base.py TorchBackendContext)."""

    def __init__(self, graph=None, executing_order=None):
        self.graph = graph
        self.executing_order = executing_order
        self.detail: Dict[str, Any] = {}


def ASSERT_NUM_OF_INPUT(op, values, min_num: int, max_num: Optional[int] = None):
    max_num = max_num if max_num is not None else min_num
    if not (min_num <= len(values) <= max_num):
        raise ValueError(
            f'{op.type} op {op.name} expects {min_num}..{max_num} inputs, '
            f'got {len(values)}')


def attr(op, name, default=None):
    return op.attributes.get(name, default)


def _np(x) -> np.ndarray:
    """Materialize a (small) value on host — used for SOI operands."""
    return np.asarray(x)


def _present(values, idx) -> bool:
    """Optional input present and non-empty."""
    return (len(values) > idx and values[idx] is not None
            and getattr(values[idx], 'size', 1) > 0)


# ============================================================ conv family ===


def _conv_padding(op, spatial_rank: int, x_shape, w_shape, strides, dilations):
    auto_pad = attr(op, 'auto_pad', 'NOTSET')
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad in ('SAME_UPPER', 'SAME_LOWER'):
        pads = []
        for i in range(spatial_rank):
            in_dim = x_shape[2 + i]
            k = (w_shape[2 + i] - 1) * dilations[i] + 1
            out_dim = -(-in_dim // strides[i])
            total = max(0, (out_dim - 1) * strides[i] + k - in_dim)
            if auto_pad == 'SAME_UPPER':
                pads.append((total // 2, total - total // 2))
            else:
                pads.append((total - total // 2, total // 2))
        return pads
    if auto_pad == 'VALID':
        return [(0, 0)] * spatial_rank
    p = attr(op, 'pads', [0] * (2 * spatial_rank))
    return [(int(p[i]), int(p[i + spatial_rank])) for i in range(spatial_rank)]


def Conv_forward(op, values, ctx=None):
    ASSERT_NUM_OF_INPUT(op, values, 2, 3)
    x, w = jnp.asarray(values[0]), jnp.asarray(values[1])
    spatial = x.ndim - 2
    group = int(attr(op, 'group', 1))
    strides = [int(s) for s in attr(op, 'strides', [1] * spatial)]
    dilations = [int(d) for d in attr(op, 'dilations', [1] * spatial)]
    pads = _conv_padding(op, spatial, x.shape, w.shape, strides, dilations)
    if spatial == 1:   # lift 1-D conv to 2-D
        x2, w2 = x[..., None], w[..., None]
        out = jax.lax.conv_general_dilated(
            x2, w2, window_strides=strides + [1], padding=pads + [(0, 0)],
            rhs_dilation=dilations + [1], feature_group_count=group,
            precision=_prec(), preferred_element_type=_accum())
        y = out[..., 0]
    else:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=pads,
            rhs_dilation=dilations, feature_group_count=group,
            precision=_prec(), preferred_element_type=_accum())
    if len(values) > 2 and values[2] is not None:
        b = jnp.asarray(values[2]).reshape((1, -1) + (1,) * spatial)
        y = y + b
    return y


def ConvTranspose_forward(op, values, ctx=None):
    ASSERT_NUM_OF_INPUT(op, values, 2, 3)
    x, w = jnp.asarray(values[0]), jnp.asarray(values[1])
    spatial = x.ndim - 2
    group = int(attr(op, 'group', 1))
    strides = [int(s) for s in attr(op, 'strides', [1] * spatial)]
    dilations = [int(d) for d in attr(op, 'dilations', [1] * spatial)]
    p = attr(op, 'pads', [0] * 2 * spatial)
    out_pads = [int(v) for v in attr(op, 'output_padding', [0] * spatial)]
    # onnx weight layout: [C_in, C_out/group, *k]
    # grad-style transposed conv: use lax.conv_transpose on each group
    k = w.shape[2:]
    pads = []
    for i in range(spatial):
        k_eff = (k[i] - 1) * dilations[i] + 1
        pads.append((k_eff - 1 - int(p[i]),
                     k_eff - 1 - int(p[i + spatial]) + out_pads[i]))
    # lax.conv_transpose expects OIHW-ish rhs via dimension_numbers; we use
    # grouped manual approach
    cin = x.shape[1]
    cout_pg = w.shape[1]
    if group == 1:
        # flip spatial dims, swap io → standard dilated conv of upsampled x
        w_flip = jnp.flip(w, axis=tuple(range(2, w.ndim)))
        w_t = jnp.swapaxes(w_flip, 0, 1)  # [C_out, C_in, *k]
        y = jax.lax.conv_general_dilated(
            x, w_t, window_strides=[1] * spatial, padding=pads,
            lhs_dilation=strides, rhs_dilation=dilations, precision=_prec(),
            preferred_element_type=_accum())
    else:
        xs = jnp.split(x, group, axis=1)
        ws = jnp.split(w, group, axis=0)
        ys = []
        for xg, wg in zip(xs, ws):
            wf = jnp.flip(wg, axis=tuple(range(2, w.ndim)))
            wt = jnp.swapaxes(wf, 0, 1)
            ys.append(jax.lax.conv_general_dilated(
                xg, wt, window_strides=[1] * spatial, padding=pads,
                lhs_dilation=strides, rhs_dilation=dilations,
                precision=_prec(), preferred_element_type=_accum()))
        y = jnp.concatenate(ys, axis=1)
    if len(values) > 2 and values[2] is not None:
        y = y + jnp.asarray(values[2]).reshape((1, -1) + (1,) * spatial)
    return y


# ============================================================ pool family ===


def _pool(op, x, init, reduce_fn, spatial=None):
    spatial = spatial or (x.ndim - 2)
    k = [int(v) for v in attr(op, 'kernel_shape')]
    strides = [int(s) for s in attr(op, 'strides', [1] * spatial)]
    p = attr(op, 'pads', [0] * 2 * spatial)
    ceil_mode = int(attr(op, 'ceil_mode', 0))
    pads = [(int(p[i]), int(p[i + spatial])) for i in range(spatial)]
    if ceil_mode:
        for i in range(spatial):
            in_dim = x.shape[2 + i] + pads[i][0] + pads[i][1]
            rem = (in_dim - k[i]) % strides[i]
            if rem != 0:
                pads[i] = (pads[i][0], pads[i][1] + strides[i] - rem)
    window = (1, 1) + tuple(k)
    strides_full = (1, 1) + tuple(strides)
    padding = ((0, 0), (0, 0)) + tuple(pads)
    return jax.lax.reduce_window(x, init, reduce_fn, window, strides_full,
                                 padding), pads, k, strides


def MaxPool_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    y, _, _, _ = _pool(op, x, -jnp.inf, jax.lax.max)
    return y


def AveragePool_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    include_pad = int(attr(op, 'count_include_pad', 0))
    y, pads, k, strides = _pool(op, x, 0.0, jax.lax.add)
    if include_pad or all(p == (0, 0) for p in pads):
        return y / float(np.prod(k))
    ones = jnp.ones(x.shape, x.dtype)
    cnt, _, _, _ = _pool(op, ones, 0.0, jax.lax.add)
    return y / cnt


def GlobalAveragePool_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)


def GlobalMaxPool_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)


# ========================================================== linear algebra ===


def Gemm_forward(op, values, ctx=None):
    ASSERT_NUM_OF_INPUT(op, values, 2, 3)
    a, b = jnp.asarray(values[0]), jnp.asarray(values[1])
    if int(attr(op, 'transA', 0)):
        a = a.T
    if int(attr(op, 'transB', 0)):
        b = b.T
    y = jnp.matmul(a, b, precision=_prec(),
                   preferred_element_type=_accum()) * float(attr(op, 'alpha', 1.0))
    if len(values) > 2 and values[2] is not None:
        y = y + jnp.asarray(values[2]) * float(attr(op, 'beta', 1.0))
    return y


def MatMul_forward(op, values, ctx=None):
    return jnp.matmul(jnp.asarray(values[0]), jnp.asarray(values[1]),
                      precision=_prec(), preferred_element_type=_accum())


def PPQBiasFusedMatMul_forward(op, values, ctx=None):
    y = jnp.matmul(jnp.asarray(values[0]), jnp.asarray(values[1]),
                   precision=_prec(), preferred_element_type=_accum())
    if len(values) > 2 and values[2] is not None:
        y = y + jnp.asarray(values[2])
    return y


# ============================================================ elementwise ===


def _binary(fn):
    def f(op, values, ctx=None):
        ASSERT_NUM_OF_INPUT(op, values, 2)
        return fn(jnp.asarray(values[0]), jnp.asarray(values[1]))
    return f


def _unary(fn):
    def f(op, values, ctx=None):
        ASSERT_NUM_OF_INPUT(op, values, 1)
        return fn(jnp.asarray(values[0]))
    return f


Add_forward = _binary(jnp.add)
Sub_forward = _binary(jnp.subtract)
Mul_forward = _binary(jnp.multiply)
Div_forward = _binary(lambda a, b: a / b)
Pow_forward = _binary(jnp.power)
Mod_forward = _binary(jnp.mod)
Max_forward = lambda op, values, ctx=None: functools.reduce(jnp.maximum, map(jnp.asarray, values))
Min_forward = lambda op, values, ctx=None: functools.reduce(jnp.minimum, map(jnp.asarray, values))
Sum_forward = lambda op, values, ctx=None: functools.reduce(jnp.add, map(jnp.asarray, values))

Relu_forward = _unary(jax.nn.relu)
Sigmoid_forward = _unary(jax.nn.sigmoid)
Tanh_forward = _unary(jnp.tanh)
Exp_forward = _unary(jnp.exp)
Log_forward = _unary(jnp.log)
Sqrt_forward = _unary(jnp.sqrt)
Reciprocal_forward = _unary(lambda x: 1.0 / x)
Abs_forward = _unary(jnp.abs)
Neg_forward = _unary(jnp.negative)
Floor_forward = _unary(jnp.floor)
Ceil_forward = _unary(jnp.ceil)
Round_forward = _unary(jnp.round)
Sign_forward = _unary(jnp.sign)
Erf_forward = _unary(jax.scipy.special.erf)
Sin_forward = _unary(jnp.sin)
Cos_forward = _unary(jnp.cos)
Not_forward = _unary(jnp.logical_not)
Softplus_forward = _unary(jax.nn.softplus)
Mish_forward = _unary(lambda x: x * jnp.tanh(jax.nn.softplus(x)))
Swish_forward = _unary(lambda x: x * jax.nn.sigmoid(x))
SiLU_forward = Swish_forward
Gelu_forward = _unary(lambda x: jax.nn.gelu(x, approximate=False))
HardSwish_forward = _unary(lambda x: x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0))
Identity_forward = _unary(lambda x: x)


def HardSigmoid_forward(op, values, ctx=None):
    alpha = float(attr(op, 'alpha', 0.2))
    beta = float(attr(op, 'beta', 0.5))
    return jnp.clip(alpha * jnp.asarray(values[0]) + beta, 0.0, 1.0)


def LeakyRelu_forward(op, values, ctx=None):
    alpha = float(attr(op, 'alpha', 0.01))
    x = jnp.asarray(values[0])
    return jnp.where(x >= 0, x, alpha * x)


def PRelu_forward(op, values, ctx=None):
    x, slope = jnp.asarray(values[0]), jnp.asarray(values[1])
    if slope.ndim == 1 and x.ndim > 1:
        slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, slope * x)


def Clip_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    lo = jnp.asarray(values[1]) if _present(values, 1) else -jnp.inf
    hi = jnp.asarray(values[2]) if _present(values, 2) else jnp.inf
    return jnp.clip(x, lo, hi)


def Elu_forward(op, values, ctx=None):
    alpha = float(attr(op, 'alpha', 1.0))
    x = jnp.asarray(values[0])
    return jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


def Selu_forward(op, values, ctx=None):
    alpha = float(attr(op, 'alpha', 1.6732632423543772))
    gamma = float(attr(op, 'gamma', 1.0507009873554805))
    x = jnp.asarray(values[0])
    return gamma * jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))


# comparison / logic (outputs bool)
Equal_forward = _binary(jnp.equal)
Greater_forward = _binary(jnp.greater)
GreaterOrEqual_forward = _binary(jnp.greater_equal)
Less_forward = _binary(jnp.less)
LessOrEqual_forward = _binary(jnp.less_equal)
And_forward = _binary(jnp.logical_and)
Or_forward = _binary(jnp.logical_or)
Xor_forward = _binary(jnp.logical_xor)


def Where_forward(op, values, ctx=None):
    ASSERT_NUM_OF_INPUT(op, values, 3)
    return jnp.where(jnp.asarray(values[0]).astype(bool),
                     jnp.asarray(values[1]), jnp.asarray(values[2]))


# ============================================================== softmax etc ===


def Softmax_forward(op, values, ctx=None):
    axis = int(attr(op, 'axis', -1))
    return jax.nn.softmax(jnp.asarray(values[0]), axis=axis)


def LogSoftmax_forward(op, values, ctx=None):
    axis = int(attr(op, 'axis', -1))
    return jax.nn.log_softmax(jnp.asarray(values[0]), axis=axis)


def Softmax_opset11_forward(op, values, ctx=None):
    # opset<13: flatten trailing dims from axis
    axis = int(attr(op, 'axis', 1))
    x = jnp.asarray(values[0])
    shape = x.shape
    flat = x.reshape(int(np.prod(shape[:axis])), -1)
    return jax.nn.softmax(flat, axis=-1).reshape(shape)


# =============================================================== norms ===


def BatchNormalization_forward(op, values, ctx=None):
    ASSERT_NUM_OF_INPUT(op, values, 5)
    x, gamma, beta, mean, var = (jnp.asarray(v) for v in values)
    eps = float(attr(op, 'epsilon', 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
            * gamma.reshape(shape) + beta.reshape(shape))


def LayerNormalization_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', -1))
    eps = float(attr(op, 'epsilon', 1e-5))
    axes = tuple(range(axis % x.ndim, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) / jnp.sqrt(var + eps)
    if _present(values, 1):
        y = y * jnp.asarray(values[1])
    if _present(values, 2):
        y = y + jnp.asarray(values[2])
    return y


def InstanceNormalization_forward(op, values, ctx=None):
    x, gamma, beta = (jnp.asarray(v) for v in values[:3])
    eps = float(attr(op, 'epsilon', 1e-5))
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean) / jnp.sqrt(var + eps) * gamma.reshape(shape)
            + beta.reshape(shape))


def GroupNormalization_forward(op, values, ctx=None):
    x, gamma, beta = (jnp.asarray(v) for v in values[:3])
    eps = float(attr(op, 'epsilon', 1e-5))
    groups = int(attr(op, 'num_groups', 1))
    n, c = x.shape[0], x.shape[1]
    xg = x.reshape((n, groups, c // groups) + x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    y = ((xg - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return y * gamma.reshape(shape) + beta.reshape(shape)


def LRN_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    size = int(attr(op, 'size'))
    alpha = float(attr(op, 'alpha', 1e-4))
    beta = float(attr(op, 'beta', 0.75))
    bias = float(attr(op, 'k', 1.0))
    sq = x * x
    half = size // 2
    pad = [(0, 0), (half, size - 1 - half)] + [(0, 0)] * (x.ndim - 2)
    sq_pad = jnp.pad(sq, pad)
    window = jax.lax.reduce_window(
        sq_pad, 0.0, jax.lax.add, (1, size) + (1,) * (x.ndim - 2),
        (1,) * x.ndim, 'VALID')
    return x / jnp.power(bias + alpha * window / size, beta)


# ======================================================== shape / movement ===


def Reshape_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    shape = [int(v) for v in _np(values[1]).reshape(-1)]
    allowzero = int(attr(op, 'allowzero', 0))
    if not allowzero:
        shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
    return x.reshape(shape)


def Flatten_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', 1))
    lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
    return x.reshape(lead, -1)


def Transpose_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    perm = attr(op, 'perm', list(reversed(range(x.ndim))))
    return jnp.transpose(x, [int(p) for p in perm])


def Squeeze_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    if _present(values, 1):
        axes = tuple(int(a) % x.ndim for a in _np(values[1]).reshape(-1))
        return jnp.squeeze(x, axis=axes)
    return jnp.squeeze(x)


def Unsqueeze_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axes = sorted(int(a) % (x.ndim + len(_np(values[1]).reshape(-1)))
                  for a in _np(values[1]).reshape(-1))
    for a in axes:
        x = jnp.expand_dims(x, a)
    return x


def Concat_forward(op, values, ctx=None):
    axis = int(attr(op, 'axis'))
    vals = [jnp.asarray(v) for v in values if getattr(v, 'size', 1) > 0 or
            np.prod(np.asarray(v).shape) > 0]
    if not vals:
        vals = [jnp.asarray(v) for v in values]
    return jnp.concatenate(vals, axis=axis)


def Split_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', 0))
    sizes = None
    if _present(values, 1):
        sizes = [int(s) for s in _np(values[1]).reshape(-1)]
    elif attr(op, 'split', None) is not None:
        # legacy opset<13 attribute; the caffe frontend also uses it with
        # a -1 tail (caffe slice_point doesn't record the last extent)
        sizes = [int(s) for s in attr(op, 'split')]
    if sizes is not None:
        if any(s < 0 for s in sizes):
            rem = int(x.shape[axis]) - sum(s for s in sizes if s >= 0)
            sizes = [s if s >= 0 else rem for s in sizes]
        idx = np.cumsum(sizes)[:-1]
        return tuple(jnp.split(x, idx, axis=axis))
    n_out = len(op.outputs) if op.outputs else int(attr(op, 'num_outputs', 2))
    return tuple(jnp.split(x, n_out, axis=axis))


def Slice_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    starts = _np(values[1]).reshape(-1).astype(np.int64)
    ends = _np(values[2]).reshape(-1).astype(np.int64)
    axes = (_np(values[3]).reshape(-1).astype(np.int64) if _present(values, 3)
            else np.arange(len(starts)))
    steps = (_np(values[4]).reshape(-1).astype(np.int64) if _present(values, 4)
             else np.ones(len(starts), np.int64))
    slices = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = int(a) % x.ndim
        dim = x.shape[a]
        s, e, st = int(s), int(e), int(st)
        s = max(s + dim, 0) if s < 0 else min(s, dim)
        if e < -dim:
            e = -dim - 1 if st < 0 else 0
        e = e + dim if e < 0 else min(e, dim) if st > 0 else min(e, dim - 1)
        slices[a] = slice(s, e, st)
    return x[tuple(slices)]


def Pad_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    mode = attr(op, 'mode', 'constant')
    if isinstance(mode, bytes):
        mode = mode.decode()
    pads = _np(values[1]).reshape(-1).astype(np.int64)
    n = x.ndim
    pad_width = [(int(pads[i]), int(pads[i + n])) for i in range(n)]
    if mode == 'constant':
        cval = float(_np(values[2]).reshape(-1)[0]) if _present(values, 2) else 0.0
        return jnp.pad(x, pad_width, constant_values=cval)
    jnp_mode = {'reflect': 'reflect', 'edge': 'edge', 'wrap': 'wrap'}[mode]
    return jnp.pad(x, pad_width, mode=jnp_mode)


def Expand_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    shape = [int(v) for v in _np(values[1]).reshape(-1)]
    # ONNX Expand = numpy broadcast of input against `shape`: dimensions
    # right-aligned, a shape entry of 1 keeps the input dim (the spec has
    # no -1; tolerate it as 1 for models that use the torch convention)
    ndim = max(len(shape), x.ndim)
    in_shape = (1,) * (ndim - x.ndim) + tuple(x.shape)
    sh = [1] * (ndim - len(shape)) + [1 if s == -1 else s for s in shape]
    target = [max(a, b) for a, b in zip(in_shape, sh)]
    return jnp.broadcast_to(x.reshape(in_shape), target)


def Tile_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    reps = [int(v) for v in _np(values[1]).reshape(-1)]
    # ONNX requires len(reps) == rank; the caffe frontend can emit reps for
    # leading axes only (Tile layer's axis/tiles) — treat reps as
    # LEFT-aligned and pad/truncate with 1s (numpy's own promotion is
    # right-aligned, which would tile the wrong axis)
    if len(reps) < x.ndim:
        reps = reps + [1] * (x.ndim - len(reps))
    elif len(reps) > x.ndim:
        reps = reps[:x.ndim]
    return jnp.tile(x, reps)


def _is_traced(v) -> bool:
    """True when `v` is a jax tracer / device array whose values are not
    host-readable (e.g. token ids flowing as network inputs under jit)."""
    import jax.core
    return isinstance(v, jax.core.Tracer)


def Gather_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', 0))
    if _is_traced(values[1]):
        # runtime indices (embedding lookups): stay on-device
        return jnp.take(x, jnp.asarray(values[1]).astype(jnp.int32),
                        axis=axis)
    idx = _np(values[1]).astype(np.int64)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def GatherElements_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', 0))
    if _is_traced(values[1]):
        return jnp.take_along_axis(
            x, jnp.asarray(values[1]).astype(jnp.int32), axis=axis)
    idx = jnp.asarray(_np(values[1]).astype(np.int64))
    return jnp.take_along_axis(x, idx, axis=axis)


def GatherND_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    idx = _np(values[1]).astype(np.int64)
    b = int(attr(op, 'batch_dims', 0))
    if b:
        # flatten batch dims and prepend a batch-index column, then gather
        # with batch_dims=0 semantics (ONNX GatherND batch_dims spec)
        batch_shape = x.shape[:b]
        nb = int(np.prod(batch_shape))
        xf = x.reshape((nb,) + x.shape[b:])
        idxf = idx.reshape((nb,) + idx.shape[b:])
        rows = np.arange(nb).reshape((nb,) + (1,) * (idxf.ndim - 2))
        rows = np.broadcast_to(rows, idxf.shape[:-1])[..., None]
        idx2 = np.concatenate([rows, idxf], axis=-1)
        k = idxf.shape[-1]
        flat = idx2.reshape(-1, k + 1)
        out = xf[tuple(flat[:, i] for i in range(k + 1))]
        return out.reshape(tuple(batch_shape) + idxf.shape[1:-1]
                           + xf.shape[1 + k:])
    last = idx.shape[-1]
    flat_idx = idx.reshape(-1, last)
    out = x[tuple(flat_idx[:, i] for i in range(last))]
    return out.reshape(idx.shape[:-1] + x.shape[last:])


def ScatterND_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    idx = jnp.asarray(_np(values[1]).astype(np.int64))
    updates = jnp.asarray(values[2])
    return x.at[tuple(jnp.moveaxis(idx, -1, 0))].set(updates)


def ScatterElements_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    idx = jnp.asarray(_np(values[1]).astype(np.int64))
    updates = jnp.asarray(values[2])
    axis = int(attr(op, 'axis', 0))
    return jax.lax.scatter(
        x, jnp.expand_dims(idx, -1), updates,
        jax.lax.ScatterDimensionNumbers(
            update_window_dims=(), inserted_window_dims=(axis % x.ndim,),
            scatter_dims_to_operand_dims=(axis % x.ndim,))) \
        if x.ndim == 1 else _scatter_elements_general(x, idx, updates, axis)


def _scatter_elements_general(x, idx, updates, axis):
    axis = axis % x.ndim
    grids = jnp.meshgrid(*[jnp.arange(s) for s in idx.shape], indexing='ij')
    grids[axis] = idx
    return x.at[tuple(grids)].set(updates)


def Cast_forward(op, values, ctx=None):
    to = DataType(int(attr(op, 'to')))
    x = values[0]
    np_dtype = to.to_numpy()
    if isinstance(x, np.ndarray):
        return x.astype(np_dtype)
    return jnp.asarray(x).astype(np_dtype)


def Resize_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    mode = attr(op, 'mode', 'nearest')
    if isinstance(mode, bytes):
        mode = mode.decode()
    coord = attr(op, 'coordinate_transformation_mode', 'half_pixel')
    if isinstance(coord, bytes):
        coord = coord.decode()
    sizes = None
    if _present(values, 3):
        sizes = [int(v) for v in _np(values[3]).reshape(-1)]
    elif _present(values, 2):
        scales = _np(values[2]).reshape(-1)
        sizes = [int(np.floor(d * s)) for d, s in zip(x.shape, scales)]
    if sizes is None:
        return x
    method = {'nearest': 'nearest', 'linear': 'bilinear', 'cubic': 'bicubic'}[mode]
    if coord == 'align_corners' and method != 'nearest':
        # jax.image.resize has no align_corners; emulate with linear map
        return _resize_align_corners(x, sizes)
    return jax.image.resize(x, sizes, method=method)


def _resize_align_corners(x, sizes):
    out = x
    for axis in range(2, x.ndim):
        n_in, n_out = x.shape[axis], sizes[axis]
        if n_in == n_out:
            continue
        pos = jnp.linspace(0.0, n_in - 1, n_out)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (pos - lo).reshape((-1,) + (1,) * (x.ndim - axis - 1))
        out = (jnp.take(out, lo, axis=axis) * (1 - w)
               + jnp.take(out, hi, axis=axis) * w)
    return out


def Upsample_forward(op, values, ctx=None):
    return Resize_forward(op, [values[0], None, values[1] if len(values) > 1 else None], ctx)


def DepthToSpace_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    bs = int(attr(op, 'blocksize'))
    mode = attr(op, 'mode', 'DCR')
    n, c, h, w = x.shape
    if mode == 'DCR':
        y = x.reshape(n, bs, bs, c // (bs * bs), h, w)
        y = jnp.transpose(y, (0, 3, 4, 1, 5, 2))
    else:
        y = x.reshape(n, c // (bs * bs), bs, bs, h, w)
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
    return y.reshape(n, c // (bs * bs), h * bs, w * bs)


def SpaceToDepth_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    bs = int(attr(op, 'blocksize'))
    n, c, h, w = x.shape
    y = x.reshape(n, c, h // bs, bs, w // bs, bs)
    y = jnp.transpose(y, (0, 3, 5, 1, 2, 4))
    return y.reshape(n, c * bs * bs, h // bs, w // bs)


# ============================================================== reductions ===


def _reduce(jnp_fn):
    def f(op, values, ctx=None):
        x = jnp.asarray(values[0])
        if _present(values, 1):             # opset 18 axes-as-input
            axes = tuple(int(a) for a in _np(values[1]).reshape(-1))
        else:
            axes_attr = attr(op, 'axes')
            axes = tuple(int(a) for a in axes_attr) if axes_attr is not None else None
        keepdims = bool(attr(op, 'keepdims', 1))
        return jnp_fn(x, axis=axes, keepdims=keepdims)
    return f


ReduceMean_forward = _reduce(jnp.mean)
ReduceSum_forward = _reduce(jnp.sum)
ReduceMax_forward = _reduce(jnp.max)
ReduceMin_forward = _reduce(jnp.min)
ReduceProd_forward = _reduce(jnp.prod)
ReduceL2_forward = _reduce(lambda x, axis, keepdims:
                           jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims)))
ReduceL1_forward = _reduce(lambda x, axis, keepdims:
                           jnp.sum(jnp.abs(x), axis=axis, keepdims=keepdims))
ReduceSumSquare_forward = _reduce(lambda x, axis, keepdims:
                                  jnp.sum(x * x, axis=axis, keepdims=keepdims))


def ArgMax_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', 0))
    keepdims = bool(attr(op, 'keepdims', 1))
    y = jnp.argmax(x, axis=axis).astype(jnp.int64)
    return jnp.expand_dims(y, axis) if keepdims else y


def ArgMin_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', 0))
    keepdims = bool(attr(op, 'keepdims', 1))
    y = jnp.argmin(x, axis=axis).astype(jnp.int64)
    return jnp.expand_dims(y, axis) if keepdims else y


# =========================================================== SOI / host ops ===


def Shape_forward(op, values, ctx=None):
    start = int(attr(op, 'start', 0))
    end = attr(op, 'end')
    shape = list(np.asarray(values[0]).shape if isinstance(values[0], np.ndarray)
                 else values[0].shape)
    shape = shape[start: None if end is None else int(end)]
    return np.asarray(shape, np.int64)


def Size_forward(op, values, ctx=None):
    return np.asarray(int(np.prod(values[0].shape)), np.int64)


def ConstantOfShape_forward(op, values, ctx=None):
    shape = [int(v) for v in _np(values[0]).reshape(-1)]
    value = attr(op, 'value', np.zeros(1, np.float32))
    value = np.asarray(value)
    return np.full(shape, value.reshape(-1)[0], dtype=value.dtype)


def Range_forward(op, values, ctx=None):
    start, limit, delta = (_np(v).reshape(-1)[0] for v in values[:3])
    return np.arange(start, limit, delta)


def NonZero_forward(op, values, ctx=None):
    return np.stack(np.nonzero(_np(values[0]))).astype(np.int64)


def TopK_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    k = int(_np(values[1]).reshape(-1)[0])
    axis = int(attr(op, 'axis', -1))
    largest = int(attr(op, 'largest', 1))
    moved = jnp.moveaxis(x, axis, -1)
    if largest:
        vals, idx = jax.lax.top_k(moved, k)
    else:
        vals, idx = jax.lax.top_k(-moved, k)
        vals = -vals
    return (jnp.moveaxis(vals, -1, axis),
            np.asarray(jnp.moveaxis(idx, -1, axis)).astype(np.int64))


def NonMaxSuppression_forward(op, values, ctx=None):
    """Host-side NMS (SOI output — index selection, cf. reference
    default.py:1522). boxes [nb, ns, 4], scores [nb, nc, ns]."""
    boxes = _np(values[0])
    scores = _np(values[1])
    max_out = int(_np(values[2]).reshape(-1)[0]) if _present(values, 2) else 0
    iou_thr = float(_np(values[3]).reshape(-1)[0]) if _present(values, 3) else 0.0
    score_thr = float(_np(values[4]).reshape(-1)[0]) if _present(values, 4) else -np.inf
    center = int(attr(op, 'center_point_box', 0))
    selected = []
    for b in range(boxes.shape[0]):
        for c in range(scores.shape[1]):
            s = scores[b, c]
            order = np.argsort(-s)
            order = order[s[order] > score_thr]
            keep = []
            bb = boxes[b]
            if center:
                cx, cy, w, h = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
                bb = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], 1)
            for i in order:
                ok = True
                for j in keep:
                    if _iou(bb[i], bb[j]) > iou_thr:
                        ok = False
                        break
                if ok:
                    keep.append(i)
                    if len(keep) >= max_out:
                        break
            selected.extend([b, c, int(i)] for i in keep)
    return np.asarray(selected, np.int64).reshape(-1, 3)


def _iou(a, b):
    y1, x1 = max(a[0], b[0]), max(a[1], b[1])
    y2, x2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, y2 - y1) * max(0.0, x2 - x1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def RoiAlign_forward(op, values, ctx=None):
    """Bilinear ROI align (reference default.py:2417)."""
    x = jnp.asarray(values[0])
    rois = _np(values[1]).astype(np.float32)
    batch_idx = _np(values[2]).astype(np.int64) if _present(values, 2) else \
        np.zeros(len(rois), np.int64)
    oh = int(attr(op, 'output_height', 1))
    ow = int(attr(op, 'output_width', 1))
    ratio = int(attr(op, 'sampling_ratio', 0)) or 2
    scale = float(attr(op, 'spatial_scale', 1.0))
    outs = []
    for roi, bi in zip(rois, batch_idx):
        x1, y1, x2, y2 = roi * scale
        grid_y = jnp.linspace(y1, y2, oh * ratio)
        grid_x = jnp.linspace(x1, x2, ow * ratio)
        feat = _bilinear_sample(x[int(bi)], grid_y, grid_x)
        feat = feat.reshape(x.shape[1], oh, ratio, ow, ratio).mean((2, 4))
        outs.append(feat)
    return jnp.stack(outs)


def _bilinear_sample(img, ys, xs):
    c, h, w = img.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys, 0, h - 1) - y0
    wx = jnp.clip(xs, 0, w - 1) - x0
    g00 = img[:, y0][:, :, x0]
    g01 = img[:, y0][:, :, x1]
    g10 = img[:, y1][:, :, x0]
    g11 = img[:, y1][:, :, x1]
    wy = wy.reshape(1, -1, 1)
    wx = wx.reshape(1, 1, -1)
    return (g00 * (1 - wy) * (1 - wx) + g01 * (1 - wy) * wx
            + g10 * wy * (1 - wx) + g11 * wy * wx)


def GridSample_forward(op, values, ctx=None):
    """(reference default.py:2629) — bilinear, align_corners handling."""
    x = jnp.asarray(values[0])
    grid = jnp.asarray(values[1])
    align = int(attr(op, 'align_corners', 0))
    n, c, h, w = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align:
        ix = (gx + 1) * (w - 1) / 2
        iy = (gy + 1) * (h - 1) / 2
    else:
        ix = ((gx + 1) * w - 1) / 2
        iy = ((gy + 1) * h - 1) / 2
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx, wy = ix - x0, iy - y0

    def gather(b, xi, yi, vx, vy):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(x.dtype)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        g = x[b][:, yi, xi]     # [c, Ho, Wo]
        return g * valid[None]

    outs = []
    for b in range(n):
        g00 = gather(b, x0[b], y0[b], wx[b], wy[b])
        g01 = gather(b, x1[b], y0[b], wx[b], wy[b])
        g10 = gather(b, x0[b], y1[b], wx[b], wy[b])
        g11 = gather(b, x1[b], y1[b], wx[b], wy[b])
        wxb, wyb = wx[b][None], wy[b][None]
        outs.append(g00 * (1 - wxb) * (1 - wyb) + g01 * wxb * (1 - wyb)
                    + g10 * (1 - wxb) * wyb + g11 * wxb * wyb)
    return jnp.stack(outs)


def CumSum_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(_np(values[1]).reshape(-1)[0])
    return jnp.cumsum(x, axis=axis)


def OneHot_forward(op, values, ctx=None):
    idx = _np(values[0]).astype(np.int64)
    depth = int(_np(values[1]).reshape(-1)[0])
    off_v, on_v = _np(values[2]).reshape(-1)
    axis = int(attr(op, 'axis', -1))
    eye = jax.nn.one_hot(jnp.asarray(idx % depth), depth, axis=axis)
    return eye * (on_v - off_v) + off_v


def Einsum_forward(op, values, ctx=None):
    eq = attr(op, 'equation')
    if isinstance(eq, bytes):
        eq = eq.decode()
    return jnp.einsum(eq, *[jnp.asarray(v) for v in values],
                      precision=_prec())


# ========================================================= recurrent (base) ===


_LSTM_ACTS = {
    'sigmoid': jax.nn.sigmoid, 'tanh': jnp.tanh, 'relu': jax.nn.relu,
    'softsign': jax.nn.soft_sign, 'softplus': jax.nn.softplus,
    'hardsigmoid': lambda v: jnp.clip(0.2 * v + 0.5, 0.0, 1.0),
    'elu': jax.nn.elu, 'leakyrelu': lambda v: jnp.where(v > 0, v, 0.01 * v),
}


def LSTM_forward(op, values, ctx=None):
    """ONNX LSTM (reference default.py:2951). Supports forward/bidirectional,
    iofc gate order, optional bias/initial states, `sequence_lens` (per-
    sample masking: states freeze and outputs zero past each length; the
    reverse direction reverses only the valid prefix), the `activations`
    attribute (per-direction [f, g, h] names) and `clip`. Scan-based
    (lax.scan) so it compiles to one fused XLA loop."""
    x = jnp.asarray(values[0])                       # [T, N, I]
    w = jnp.asarray(values[1])                       # [D, 4H, I]
    r = jnp.asarray(values[2])                       # [D, 4H, H]
    num_dir = w.shape[0]
    hidden = r.shape[-1]
    T, N = x.shape[0], x.shape[1]
    b = (jnp.asarray(values[3]) if _present(values, 3)
         else jnp.zeros((num_dir, 8 * hidden)))
    seq_lens = (jnp.asarray(_np(values[4]).astype(np.int32))
                if _present(values, 4) else None)
    h0 = (jnp.asarray(values[5]) if _present(values, 5)
          else jnp.zeros((num_dir, N, hidden)))
    c0 = (jnp.asarray(values[6]) if _present(values, 6)
          else jnp.zeros((num_dir, N, hidden)))
    clip = attr(op, 'clip')
    act_names = [str(a).lower() for a in (attr(op, 'activations') or [])]
    if not act_names:
        act_names = ['sigmoid', 'tanh', 'tanh'] * num_dir

    def acts_of(d):
        names = act_names[3 * d: 3 * d + 3]
        return tuple(_LSTM_ACTS[n] for n in names)

    def _reverse_valid(xd):
        """Reverse each sample's VALID prefix ([seq_len-1 … 0]), leaving
        padding in place (ONNX reverse-direction semantics)."""
        if seq_lens is None:
            return jnp.flip(xd, 0)
        t_ids = jnp.arange(T)[:, None]                       # (T, 1)
        src = seq_lens[None, :] - 1 - t_ids                  # (T, N)
        src = jnp.where(src >= 0, src, t_ids)                # pad keeps slot
        return jnp.take_along_axis(xd, src[:, :, None], axis=0)

    def run_dir(xd, wd, rd, bd, h_init, c_init, d):
        wb, rb = bd[:4 * hidden], bd[4 * hidden:]
        f_act, g_act, h_act = acts_of(d)

        def step(carry, inp):
            h, c = carry
            xt, t = inp
            gates = (xt @ wd.T + wb) + (h @ rd.T + rb)
            if clip is not None:
                gates = jnp.clip(gates, -float(clip), float(clip))
            i, o, f, g = jnp.split(gates, 4, axis=-1)
            i, o, f = f_act(i), f_act(o), f_act(f)
            g = g_act(g)
            c_new = f * c + i * g
            h_new = o * h_act(c_new)
            if seq_lens is not None:
                valid = (t < seq_lens)[:, None]              # (N, 1)
                h_new = jnp.where(valid, h_new, h)
                c_new = jnp.where(valid, c_new, c)
                y_t = jnp.where(valid, h_new, 0.0)
            else:
                y_t = h_new
            return (h_new, c_new), y_t

        (hT, cT), hs = jax.lax.scan(
            step, (h_init, c_init), (xd, jnp.arange(T)))
        return hs, hT, cT

    outs, hTs, cTs = [], [], []
    for d in range(num_dir):
        xd = x if d == 0 else _reverse_valid(x)
        hs, hT, cT = run_dir(xd, w[d], r[d], b[d], h0[d], c0[d], d)
        if d == 1:
            hs = _reverse_valid(hs)
        outs.append(hs)
        hTs.append(hT)
        cTs.append(cT)
    y = jnp.stack(outs, axis=1)                      # [T, D, N, H]
    return y, jnp.stack(hTs), jnp.stack(cTs)


def GRU_forward(op, values, ctx=None):
    """ONNX GRU (reference default.py:2737), zrh gate order,
    linear_before_reset honored."""
    x = jnp.asarray(values[0])
    w = jnp.asarray(values[1])
    r = jnp.asarray(values[2])
    num_dir = w.shape[0]
    hidden = r.shape[-1]
    N = x.shape[1]
    b = (jnp.asarray(values[3]) if _present(values, 3)
         else jnp.zeros((num_dir, 6 * hidden)))
    h0 = (jnp.asarray(values[5]) if _present(values, 5)
          else jnp.zeros((num_dir, N, hidden)))
    lbr = int(attr(op, 'linear_before_reset', 0))

    def run_dir(xd, wd, rd, bd, h_init):
        wb, rb = bd[:3 * hidden], bd[3 * hidden:]
        wz, wr_, wh = jnp.split(wd, 3, axis=0)
        rz, rr, rh = jnp.split(rd, 3, axis=0)
        wbz, wbr, wbh = jnp.split(wb, 3)
        rbz, rbr, rbh = jnp.split(rb, 3)

        def step(h, xt):
            z = jax.nn.sigmoid(xt @ wz.T + wbz + h @ rz.T + rbz)
            rr_g = jax.nn.sigmoid(xt @ wr_.T + wbr + h @ rr.T + rbr)
            if lbr:
                hh = jnp.tanh(xt @ wh.T + wbh + rr_g * (h @ rh.T + rbh))
            else:
                hh = jnp.tanh(xt @ wh.T + wbh + (rr_g * h) @ rh.T + rbh)
            h_new = (1 - z) * hh + z * h
            return h_new, h_new

        hT, hs = jax.lax.scan(step, h_init, xd)
        return hs, hT

    outs, hTs = [], []
    for d in range(num_dir):
        xd = x if d == 0 else jnp.flip(x, 0)
        hs, hT = run_dir(xd, w[d], r[d], b[d], h0[d])
        if d == 1:
            hs = jnp.flip(hs, 0)
        outs.append(hs)
        hTs.append(hT)
    return jnp.stack(outs, axis=1), jnp.stack(hTs)


# ============================================================== attention ===


def Attention_forward(op, values, ctx=None):
    """Two layouts:
    * com.microsoft Attention (reference default.py:90): fused QKV
      projection + MHA — inputs x, qkv_weight, qkv_bias, [mask];
    * fuse_selfattention product (IR/morph.py fuse_selfattention): raw
      softmax(q @ k_t * scale) @ v over already-shaped head tensors —
      marked by the 'scale' attribute and absence of num_heads.
    """
    if attr(op, 'num_heads') is None:
        q, k_t, v = (jnp.asarray(x) for x in values[:3])
        scale = float(attr(op, 'scale', 1.0))
        scores = jnp.matmul(q, k_t, precision=_prec()) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.matmul(probs, v, precision=_prec())
    x, w, b = (jnp.asarray(v) for v in values[:3])
    num_heads = int(attr(op, 'num_heads'))
    qkv = x @ w + b                                   # [N, T, 3H]
    h = qkv.shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return _mha_core(q, k, v, num_heads,
                     jnp.asarray(values[3]) if _present(values, 3) else None)


def MultiHeadAttention_forward(op, values, ctx=None):
    """(reference default.py:586) two layouts:
    * 3-4 inputs: q, k, v already projected (+ optional mask);
    * 7/11 inputs: q, k, v + projection weights wq wk wv wo
      (+ biases bq bk bv bo) — the torch MultiheadAttention export layout.
    """
    num_heads = int(attr(op, 'num_heads', 1))
    if len(values) >= 7:
        xq, xk, xv, wq, wk, wv, wo = (jnp.asarray(x) for x in values[:7])
        def b(i):
            return jnp.asarray(values[i]) if _present(values, i) else 0.0
        q = jnp.matmul(xq, wq) + b(7)
        k = jnp.matmul(xk, wk) + b(8)
        v = jnp.matmul(xv, wv) + b(9)
        out = _mha_core(q, k, v, num_heads)
        return jnp.matmul(out, wo) + b(10)
    q, k, v = (jnp.asarray(x) for x in values[:3])
    mask = jnp.asarray(values[3]) if _present(values, 3) else None
    return _mha_core(q, k, v, num_heads, mask)


def _mha_core(q, k, v, num_heads, mask=None):
    n, t, h = q.shape
    hd = h // num_heads

    def split(x):
        return jnp.transpose(x.reshape(n, -1, num_heads, hd), (0, 2, 1, 3))

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum('nhqd,nhkd->nhqk', qh, kh,
                        precision=_prec()) / np.sqrt(hd)
    if mask is not None:
        neg = jnp.asarray(-1e9, scores.dtype)
        scores = jnp.where(mask[:, None, None, :].astype(bool), scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('nhqk,nhkd->nhqd', probs, vh, precision=_prec())
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(n, t, h)


# ============================================================ misc / control ===


def Dropout_forward(op, values, ctx=None):
    return jnp.asarray(values[0])


def Constant_forward(op, values, ctx=None):
    return np.asarray(attr(op, 'value'))


def PPQDeviceSwitch_forward(op, values, ctx=None):
    """Host↔device boundary (reference default.py:3301). In the interpreter
    this converts jnp→np (to host) or np→jnp (to device)."""
    direction = attr(op, 'direction', 'to_host')
    v = values[0]
    if direction == 'to_host':
        return np.asarray(v)
    return jnp.asarray(v)


def QuantizeLinear_forward(op, values, ctx=None):
    """ONNX QuantizeLinear: y = saturate(round(x / scale) + zero_point).
    Needed to round-trip exported QDQ models through the simulator
    (reference guarantee: tests/test_onnxruntime.py)."""
    ASSERT_NUM_OF_INPUT(op, values, 2, 3)
    x = jnp.asarray(values[0], jnp.float32)
    scale = jnp.asarray(values[1], jnp.float32)
    zp = jnp.asarray(values[2]) if _present(values, 2) else jnp.zeros((), jnp.int8)
    axis = attr(op, 'axis', 1)
    if scale.ndim > 0 and scale.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape)
    zp_dtype = np.asarray(values[2]).dtype if _present(values, 2) else np.int8
    info = jnp.iinfo(zp_dtype)
    q = jnp.round(x / scale) + jnp.asarray(zp, jnp.float32)
    return jnp.clip(q, info.min, info.max).astype(zp_dtype)


def DequantizeLinear_forward(op, values, ctx=None):
    """ONNX DequantizeLinear: y = (x - zero_point) * scale."""
    ASSERT_NUM_OF_INPUT(op, values, 2, 3)
    x = jnp.asarray(values[0], jnp.float32)
    scale = jnp.asarray(values[1], jnp.float32)
    zp = (jnp.asarray(values[2], jnp.float32) if _present(values, 2)
          else jnp.zeros((), jnp.float32))
    axis = attr(op, 'axis', 1)
    if scale.ndim > 0 and scale.size > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape)
    return (x - zp) * scale


def _floating_qdq_params(op, x, values):
    scale = jnp.asarray(values[1], jnp.float32)
    zp = (jnp.asarray(values[2], jnp.float32) if _present(values, 2)
          else jnp.zeros((), jnp.float32))
    axis = attr(op, 'axis', None)
    if scale.ndim > 0 and scale.size > 1 and axis is not None:
        shape = [1] * x.ndim
        shape[int(axis)] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape)
    return scale, zp


def QuantizeFloating_forward(op, values, ctx=None):
    """ppq floating QDQ dialect (reference onnxruntime_exporter.py:113):
    y = clip(fp8_round(x / scale + offset), min, max) kept in float32 —
    there is no guaranteed fp8 initializer type at the exported opset."""
    from ...quantization.qfunction import _generic_float_round
    ASSERT_NUM_OF_INPUT(op, values, 2, 3)
    x = jnp.asarray(values[0], jnp.float32)
    scale, zp = _floating_qdq_params(op, x, values)
    exponent = int(attr(op, 'exponent', 4))
    mantissa = int(attr(op, 'mantissa', 3))
    lo = float(attr(op, 'min', -448.0))
    hi = float(attr(op, 'max', 448.0))
    q = _generic_float_round(x / scale + zp, exponent, mantissa)
    return jnp.clip(q, lo, hi)


def DequantizeFloating_forward(op, values, ctx=None):
    """Inverse of QuantizeFloating: y = (x - offset) * scale."""
    ASSERT_NUM_OF_INPUT(op, values, 2, 3)
    x = jnp.asarray(values[0], jnp.float32)
    scale, zp = _floating_qdq_params(op, x, values)
    return (x - zp) * scale


# ---------------------------------------------------- vendor / alias ops ---

def AdaptiveAvgPool2d_forward(op, values, ctx=None):
    """torch export alias (reference default.py): average-pool to a fixed
    output size."""
    x = jnp.asarray(values[0])
    out_h, out_w = [int(v) for v in np.atleast_1d(
        attr(op, 'output_size', _np(values[1]) if _present(values, 1)
             else [1, 1]))][:2]
    n, c, h, w = x.shape
    if (h % out_h == 0) and (w % out_w == 0):
        kh, kw = h // out_h, w // out_w
        return jnp.mean(x.reshape(n, c, out_h, kh, out_w, kw), axis=(3, 5))
    # general case: interpolate bin edges
    ys = [slice((i * h) // out_h, max(((i + 1) * h + out_h - 1) // out_h,
                                      (i * h) // out_h + 1))
          for i in range(out_h)]
    xs = [slice((j * w) // out_w, max(((j + 1) * w + out_w - 1) // out_w,
                                      (j * w) // out_w + 1))
          for j in range(out_w)]
    rows = [jnp.stack([jnp.mean(x[:, :, sy, sx], axis=(2, 3))
                       for sx in xs], axis=-1) for sy in ys]
    return jnp.stack(rows, axis=-2)


def ChannelShuffle_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    g = int(attr(op, 'group', attr(op, 'groups', 1)))
    n, c, h, w = x.shape
    return x.reshape(n, g, c // g, h, w).transpose(0, 2, 1, 3, 4) \
            .reshape(n, c, h, w)


def Scale_forward(op, values, ctx=None):
    """Caffe Scale: y = x * scale (+ bias), channel-broadcast."""
    x = jnp.asarray(values[0])
    scale = jnp.asarray(values[1])
    shape = [1] * x.ndim
    if scale.ndim == 1 and x.ndim > 1:
        shape[1] = -1
        scale = scale.reshape(shape)
    y = x * scale
    if _present(values, 2):
        bias = jnp.asarray(values[2])
        if bias.ndim == 1 and x.ndim > 1:
            bias = bias.reshape(shape)
        y = y + bias
    return y


def Parameter_forward(op, values, ctx=None):
    return np.asarray(attr(op, 'value'))


def SkipLayerNorm_forward(op, values, ctx=None):
    """TensorRT skipLayerNormPlugin: LN(x + skip) (reference
    fuse_skiplayernorm target, IR/morph.py:821)."""
    x = jnp.asarray(values[0]) + jnp.asarray(values[1])
    gamma = jnp.asarray(values[2])
    beta = jnp.asarray(values[3]) if _present(values, 3) else 0.0
    eps = float(attr(op, 'epsilon', 1e-5))
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def CaffeArgMax_forward(op, values, ctx=None):
    x = jnp.asarray(values[0])
    axis = int(attr(op, 'axis', 1))
    return jnp.argmax(x, axis=axis).astype(jnp.int64)


# =============================================================== the table ===

DEFAULT_BACKEND_TABLE: Dict[str, Callable] = {
    'Conv': Conv_forward, 'ConvTranspose': ConvTranspose_forward,
    'MaxPool': MaxPool_forward, 'AveragePool': AveragePool_forward,
    'GlobalAveragePool': GlobalAveragePool_forward,
    'GlobalMaxPool': GlobalMaxPool_forward,
    'Gemm': Gemm_forward, 'MatMul': MatMul_forward,
    'PPQBiasFusedMatMul': PPQBiasFusedMatMul_forward,
    'Add': Add_forward, 'Sub': Sub_forward, 'Mul': Mul_forward,
    'Div': Div_forward, 'Pow': Pow_forward, 'Mod': Mod_forward,
    'Max': Max_forward, 'Min': Min_forward, 'Sum': Sum_forward,
    'Relu': Relu_forward, 'Sigmoid': Sigmoid_forward, 'Tanh': Tanh_forward,
    'Exp': Exp_forward, 'Log': Log_forward, 'Sqrt': Sqrt_forward,
    'Reciprocal': Reciprocal_forward, 'Abs': Abs_forward, 'Neg': Neg_forward,
    'Floor': Floor_forward, 'Ceil': Ceil_forward, 'Round': Round_forward,
    'Sign': Sign_forward, 'Erf': Erf_forward, 'Sin': Sin_forward,
    'Cos': Cos_forward, 'Not': Not_forward, 'Softplus': Softplus_forward,
    'Mish': Mish_forward, 'Swish': Swish_forward, 'SiLU': SiLU_forward,
    'Gelu': Gelu_forward, 'HardSwish': HardSwish_forward,
    'HardSigmoid': HardSigmoid_forward, 'Identity': Identity_forward,
    'LeakyRelu': LeakyRelu_forward, 'PRelu': PRelu_forward,
    'Clip': Clip_forward, 'Elu': Elu_forward, 'Selu': Selu_forward,
    'Equal': Equal_forward, 'Greater': Greater_forward,
    'GreaterOrEqual': GreaterOrEqual_forward, 'Less': Less_forward,
    'LessOrEqual': LessOrEqual_forward, 'And': And_forward, 'Or': Or_forward,
    'Xor': Xor_forward, 'Where': Where_forward,
    'Softmax': Softmax_forward, 'LogSoftmax': LogSoftmax_forward,
    'BatchNormalization': BatchNormalization_forward,
    'LayerNormalization': LayerNormalization_forward,
    'InstanceNormalization': InstanceNormalization_forward,
    'GroupNormalization': GroupNormalization_forward,
    'LRN': LRN_forward,
    'Reshape': Reshape_forward, 'Flatten': Flatten_forward,
    'Transpose': Transpose_forward, 'Squeeze': Squeeze_forward,
    'Unsqueeze': Unsqueeze_forward, 'Concat': Concat_forward,
    'Split': Split_forward, 'Slice': Slice_forward, 'Pad': Pad_forward,
    'Expand': Expand_forward, 'Tile': Tile_forward,
    'Gather': Gather_forward, 'GatherElements': GatherElements_forward,
    'GatherND': GatherND_forward, 'ScatterND': ScatterND_forward,
    'ScatterElements': ScatterElements_forward,
    'Cast': Cast_forward, 'Resize': Resize_forward,
    'Upsample': Upsample_forward,
    'DepthToSpace': DepthToSpace_forward, 'SpaceToDepth': SpaceToDepth_forward,
    'ReduceMean': ReduceMean_forward, 'ReduceSum': ReduceSum_forward,
    'ReduceMax': ReduceMax_forward, 'ReduceMin': ReduceMin_forward,
    'ReduceProd': ReduceProd_forward, 'ReduceL2': ReduceL2_forward,
    'ReduceL1': ReduceL1_forward, 'ReduceSumSquare': ReduceSumSquare_forward,
    'ArgMax': ArgMax_forward, 'ArgMin': ArgMin_forward,
    'Shape': Shape_forward, 'Size': Size_forward,
    'ConstantOfShape': ConstantOfShape_forward, 'Range': Range_forward,
    'NonZero': NonZero_forward, 'TopK': TopK_forward,
    'NonMaxSuppression': NonMaxSuppression_forward,
    'RoiAlign': RoiAlign_forward, 'GridSample': GridSample_forward,
    'CumSum': CumSum_forward, 'OneHot': OneHot_forward,
    'Einsum': Einsum_forward,
    'LSTM': LSTM_forward, 'GRU': GRU_forward,
    'Attention': Attention_forward,
    'MultiHeadAttention': MultiHeadAttention_forward,
    'Dropout': Dropout_forward, 'Constant': Constant_forward,
    'PPQDeviceSwitch': PPQDeviceSwitch_forward,
    'QuantizeLinear': QuantizeLinear_forward,
    'QuantizeFloating': QuantizeFloating_forward,
    'DequantizeFloating': DequantizeFloating_forward,
    'DequantizeLinear': DequantizeLinear_forward,
    # vendor / alias ops (reference table parity)
    'AdaptiveAvgPool2d': AdaptiveAvgPool2d_forward,
    'ChannelShuffle': ChannelShuffle_forward,
    'Scale': Scale_forward,
    'Parameter': Parameter_forward,
    'skipLayerNormPlugin': SkipLayerNorm_forward,
    'CaffeArgMax': CaffeArgMax_forward,
    'LayerNorm': LayerNormalization_forward,
    'grid_sampler': GridSample_forward,
    'MMCVRoiAlign': RoiAlign_forward,
    'Interp': Resize_forward,
    'Tan': _unary(jnp.tan),
}
