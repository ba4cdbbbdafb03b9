"""Whole-graph XLA compilation of a (quantized) BaseGraph.

This is the TPU-native answer to the reference's per-op eager interpreter
(ppq/executor/torch.py:499 hot loop): instead of 99 Python dispatches per
inference, the whole graph — ops, fake-quant sites, dequant epilogues — is
traced once into a single jitted XLA program. XLA then fuses fake-quant into
the surrounding matmuls/convs, tiles onto the MXU, and eliminates the
interpreter overhead entirely. This is where calibration sweeps and
simulated inference get their orders-of-magnitude speedup.

Three modes:
  * inference:   fn(params, inputs)            -> outputs
  * trainable:   fn(params, qparams, inputs)   -> outputs        (LSQ/QAT —
                 scales/offsets are live pytree leaves with custom-vjp grads)
  * calibration: fn(params, inputs)            -> (outputs, stats pytree)
                 (functional observer transform — min/max/absmax/histogram
                 stats computed on-device in the same fused program)

Host/SOI boundary: shape-chain ops (Shape/Gather-on-shape/Concat/Reshape)
execute on *concrete* values at trace time and constant-fold into the XLA
program — the trace-time equivalent of the reference's CPU-dispatched SOI
subgraphs (ppq/scheduler). Truly data-dependent ops (NonZero, NMS with
dynamic counts) cannot be compiled; `compilable()` reports them and callers
fall back to the eager TPUExecutor.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (OBSERVER_KL_HIST_BINS, QuantizationStates,
                    TensorQuantizationConfig)
from ..ir import BaseGraph, Operation, QuantableOperation
from ..quantization.qfunction import (dynamic_linear_fake_quant,
                                      floating_fake_quant, linear_fake_quant,
                                      linear_quant_codes,
                                      linear_recover_codes, ppq_fake_quant)
from .base import resolve_forward
from .ops.default import ExecContext

# op types whose outputs depend on input *data* in shape-affecting ways —
# they cannot live inside one static XLA program.
UNCOMPILABLE_TYPES = {'NonZero', 'NonMaxSuppression'}

# op types eligible for the integer-exact simulation lowering (precision
# 'int'): the quantized matmul/conv runs over centered integer CODES on the
# bf16 MXU with fp32 accumulation, scales factored out of the contraction.
# Exactness caveat: fp32 holds integers exactly only up to 2^24, so the
# result is bit-identical to an int32-accumulating int8 backend whenever
# partial sums stay below 2^24 — guaranteed when
# reduction_len * |codes_x|max * |codes_w|max <= 2^24, otherwise exact in
# practice for realistic data but not worst-case-guaranteed. CompiledGraph
# records lowered ops whose worst case exceeds the bound in
# `int_accum_risk`; pass int_accum_guard=True to reject lowering them.
INT_EXACT_TYPES = {'Conv', 'ConvTranspose', 'Gemm', 'MatMul',
                   'PPQBiasFusedMatMul'}

# ops the int-exact mode propagates CODES through without dequantizing:
# order-preserving (f(c*s) == f(c)*s for s > 0) or pure layout — the value
# keeps living as bf16 integer codes across them.
INT_CODED_PASSTHRU = {'Relu', 'MaxPool', 'GlobalMaxPool', 'Flatten',
                      'Reshape', 'Transpose', 'Identity', 'Squeeze',
                      'Unsqueeze'}

# ops the int-exact mode computes ON code sums (shared input grids):
# Add/Concat after QuantAlignment share one scale across inputs.
# INFORMATIONAL inventory only — _int_forward's per-branch handlers
# (compile.py ~:699-740) own the actual eligibility checks (each branch
# needs its own grid/arity conditions, so a type-set gate would be
# misleading); keep the two lists in sync when extending coverage.
INT_CODED_LINEAR = {'Add', 'Sum', 'Concat', 'GlobalAveragePool',
                    'AveragePool', 'ReduceMean'}


class _Coded:
    """Integer-exact intermediate: centered integer codes + the quant grid
    they live on. Invariant: value == codes * scale exactly (codes are
    integral; per-tensor activations keep |codes| <= 256 so the codes are
    bf16-exact and stored in bfloat16 — HALF the HBM traffic of an fp32
    dequant, and consumers skip the recover division entirely). `uid` is
    the root TQC's uid (equal uid ⟺ same grid); lo/hi bound the centered
    code range."""
    __slots__ = ('codes', 'scale', 'axis', 'uid', 'lo', 'hi')

    def __init__(self, codes, scale, axis, uid, lo, hi):
        self.codes, self.scale, self.axis = codes, scale, axis
        self.uid, self.lo, self.hi = uid, lo, hi

    def decode(self):
        c = jnp.asarray(self.codes, jnp.float32)
        s = jnp.asarray(self.scale, jnp.float32)
        if self.axis is not None:
            shape = [1] * c.ndim
            shape[self.axis] = -1
            s = s.reshape(shape)
        else:
            s = s.reshape(())
        return c * s


def _decode(v):
    """Materialize the fp32 value of a (possibly coded) intermediate."""
    return v.decode() if isinstance(v, _Coded) else v


# ---------------------------------------------------------------------------
# Host (numpy) evaluation of SOI-region ops. Inside a jit trace every jax
# primitive is STAGED — even on concrete operands — so shape-chain ops must
# run in numpy to keep their results concrete for the consumers (Reshape /
# Slice / Resize need static shapes). This is the compile-time realization
# of the scheduler's SOI split: the SOI subprogram executes at trace time
# and constant-folds into the XLA program.
def _soi_eval(op, vals):
    t = op.type
    attrs = op.attributes
    # Shape/Size read only static metadata — valid even on traced inputs.
    if t == 'Shape':
        start = int(attrs.get('start', 0))
        end = attrs.get('end')
        return np.asarray(list(vals[0].shape)[start: None if end is None
                                              else int(end)], np.int64)
    if t == 'Size':
        return np.asarray(int(np.prod(vals[0].shape)), np.int64)
    a = [np.asarray(v) for v in vals]
    if t == 'Gather':
        return np.take(a[0], a[1].astype(np.int64),
                       axis=int(attrs.get('axis', 0)))
    if t == 'GatherElements':
        return np.take_along_axis(a[0], a[1].astype(np.int64),
                                  axis=int(attrs.get('axis', 0)))
    if t == 'Unsqueeze':
        axes = (a[1].reshape(-1).tolist() if len(a) > 1
                else list(attrs.get('axes', [0])))
        out = a[0]
        for ax in sorted(int(x) for x in axes):
            out = np.expand_dims(out, ax)
        return out
    if t == 'Squeeze':
        axes = (a[1].reshape(-1).tolist() if len(a) > 1
                else attrs.get('axes'))
        return (np.squeeze(a[0]) if axes is None
                else np.squeeze(a[0], axis=tuple(int(x) for x in axes)))
    if t == 'Concat':
        xs = [x for x in a if x.size > 0] or a
        return np.concatenate([np.atleast_1d(x) for x in xs],
                              axis=int(attrs.get('axis', 0)))
    if t == 'Slice':
        starts = a[1].reshape(-1).astype(np.int64)
        ends = a[2].reshape(-1).astype(np.int64)
        axes = (a[3].reshape(-1).astype(np.int64) if len(a) > 3
                else np.arange(len(starts)))
        steps = (a[4].reshape(-1).astype(np.int64) if len(a) > 4
                 else np.ones(len(starts), np.int64))
        sl = [slice(None)] * a[0].ndim
        for s, e, ax, st in zip(starts, ends, axes, steps):
            sl[int(ax)] = slice(int(s), int(e), int(st))
        return a[0][tuple(sl)]
    if t == 'Cast':
        from ..core import DataType
        return a[0].astype(DataType(int(attrs['to'])).numpy_dtype)
    if t in ('Add', 'Sub', 'Mul', 'Div', 'Mod'):
        fn = {'Add': np.add, 'Sub': np.subtract, 'Mul': np.multiply,
              'Div': lambda x, y: (x // y if np.issubdtype(x.dtype, np.integer)
                                   else x / y),
              'Mod': np.mod}[t]
        return fn(a[0], a[1])
    if t in ('ReduceProd', 'ReduceSum', 'ReduceMax', 'ReduceMin'):
        fn = {'ReduceProd': np.prod, 'ReduceSum': np.sum,
              'ReduceMax': np.max, 'ReduceMin': np.min}[t]
        axes = attrs.get('axes')
        axes = tuple(int(x) for x in axes) if axes is not None else None
        return fn(a[0], axis=axes,
                  keepdims=bool(attrs.get('keepdims', 1)))
    if t == 'ConstantOfShape':
        value = np.asarray(attrs.get('value', np.zeros(1, np.float32)))
        return np.full([int(v) for v in a[0].reshape(-1)],
                       value.reshape(-1)[0], dtype=value.dtype)
    if t == 'Range':
        return np.arange(a[0].reshape(-1)[0], a[1].reshape(-1)[0],
                         a[2].reshape(-1)[0])
    if t == 'Where':
        return np.where(a[0], a[1], a[2])
    if t == 'Reshape':
        shape = [int(v) for v in a[1].reshape(-1)]
        if not int(attrs.get('allowzero', 0)):
            shape = [a[0].shape[i] if v == 0 else v
                     for i, v in enumerate(shape)]
        return a[0].reshape(shape)
    if t == 'Transpose':
        return np.transpose(a[0], attrs.get('perm'))
    if t == 'Expand':
        return np.broadcast_to(a[0], [int(v) for v in a[1].reshape(-1)])
    if t == 'Identity':
        return a[0]
    if t == 'Equal':
        return np.equal(a[0], a[1])
    if t == 'Size':
        return np.asarray(int(np.prod(a[0].shape)), np.int64)
    raise NotImplementedError(
        f'SOI op {op.type} ({op.name}) has no host (numpy) evaluation — '
        f'add it to _soi_eval or dispatch it off the compiled region.')


def _device_histogram(idx: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Scatter-free histogram via a factorized one-hot MATMUL.

    jnp.bincount lowers to scatter-add, which the TPU compiler handles
    pathologically slowly when dozens of instances appear in one program
    (~5s compile each — calibration programs took minutes). A flat
    equality one-hot reduction avoids that but costs O(N*bins) VPU
    compare-ops — 0.9 s/batch across resnet18's ~21 observer sites.

    Factorizing bins = HI x LO turns the count into an outer-product:
      hist[hi, lo] = sum_n onehot(idx_n // LO)[hi] * onehot(idx_n % LO)[lo]
    i.e. a (HI, N) @ (N, LO) matmul — O(N*(HI+LO)) VPU compares plus
    N*bins bf16 MACs on the MXU, with exact f32 accumulation (counts
    stay < 2^24 per chunk). Measured 2.2x the flat reduction at
    N=25.7M, bins=2048 on TPU v5e, bit-identical counts
    (probes/hist_mxu.py)."""
    n = idx.shape[0]
    CH = 1 << 18
    pad = (-n) % CH
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, idx.dtype)])
    if bins % 64:     # flat fallback for odd bin counts (none in the
        chunks = idx.reshape(-1, 8192)       # shipped observers)
        bin_ids = jnp.arange(bins, dtype=idx.dtype)

        def body(acc, chunk):
            return acc + jnp.sum(
                (chunk[:, None] == bin_ids[None, :]).astype(jnp.int32),
                axis=0), None

        counts, _ = jax.lax.scan(body, jnp.zeros((bins,), jnp.int32),
                                 chunks)
        return counts
    HI = 64
    LO = bins // HI
    g = idx.reshape(-1, CH)
    hi = g // LO                  # pad (-1) // LO == -1: matches no bin
    lo = g - hi * LO
    a = (hi[:, :, None] == jnp.arange(HI, dtype=idx.dtype)) \
        .astype(jnp.bfloat16)
    b = (lo[:, :, None] == jnp.arange(LO, dtype=idx.dtype)) \
        .astype(jnp.bfloat16)
    # per-chunk counts <= CH < 2^24: the f32 MXU accumulation is exact;
    # the cross-chunk sum then runs in int32 (exact for any N < 2^31)
    h = jax.lax.dot_general(a, b, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.sum(h.astype(jnp.int32), axis=0).reshape(bins)


def _device_histogram_nd(absval, scale, bins: int) -> jnp.ndarray:
    """Factorized one-hot MATMUL histogram over an n-d |x| tensor.

    Keeps the tensor's native leading axis as the dot_general batch dim
    (only the trailing axes collapse) — a full flatten of an NCHW conv
    activation forces a cross-lane relayout that costs the TPU compiler
    ~36s PER INSTANCE at compile time (probes/hist_mxu.py); this shape
    compiles ~5x faster and runs at the same ~29 ms / 25.7M elements.
    Counts are exact: per-batch-row counts < 2^24 ride the f32 MXU
    accumulator, the cross-row sum runs in int32."""
    if bins % 64:
        idx = jnp.clip((absval.reshape(-1) / scale).astype(jnp.int32),
                       0, bins - 1)
        return _device_histogram(idx, bins)
    HI = 64
    LO = bins // HI
    idx = jnp.clip((absval / scale).astype(jnp.int32), 0, bins - 1)
    idx = idx.reshape(idx.shape[0], -1) if idx.ndim > 1 \
        else idx.reshape(1, -1)
    # keep per-row counts under 2^24 for the exact f32 accumulation
    if idx.shape[1] >= (1 << 24):
        idx = idx.reshape(-1, idx.shape[1] // 2)
    hi = idx // LO
    lo = idx - hi * LO
    a = (hi[:, :, None] == jnp.arange(HI, dtype=idx.dtype)) \
        .astype(jnp.bfloat16)
    b = (lo[:, :, None] == jnp.arange(LO, dtype=idx.dtype)) \
        .astype(jnp.bfloat16)
    h = jax.lax.dot_general(a, b, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.sum(h.astype(jnp.int32), axis=0).reshape(bins)


def compilable(graph: BaseGraph) -> Tuple[bool, List[str]]:
    bad = [op.name for op in graph.operations.values()
           if op.type in UNCOMPILABLE_TYPES]
    return (len(bad) == 0), bad


def _cfg_key(cfg: TensorQuantizationConfig) -> str:
    return f'tqc{hash(cfg.dominated_by)}'


def _is_trainable_cfg(cfg: TensorQuantizationConfig) -> bool:
    root = cfg.dominated_by
    return root.state in {QuantizationStates.ACTIVATED,
                          QuantizationStates.PASSIVE} and root.has_scale


class CompiledGraph:
    """Compile a BaseGraph (or a contiguous op span of it) into jitted
    forward functions."""

    def __init__(self, graph: BaseGraph,
                 output_names: Optional[List[str]] = None,
                 op_span: Optional[Sequence[Operation]] = None,
                 input_names: Optional[List[str]] = None,
                 precision: str = 'highest',
                 int_accum_guard: bool = False):
        # 'highest' = fp32-accurate simulation; 'int' = integer-exact
        # simulation — quantized matmuls/convs run over centered integer
        # codes (exact in bf16) on the MXU with fp32 accumulation, scales
        # factored out of the contraction: EXACT integer arithmetic (what a
        # real int8 backend computes) at bf16 MXU speed, everything else at
        # fp32 fidelity; 'default' = bf16 MXU math over fp32 storage;
        # 'bf16' = full deployment mode — bf16 math AND bf16 tensor storage
        # (weights + activations), which halves HBM traffic. On a ResNet-18
        # the deploy path is HBM-bound: fp32 storage measured ~19k img/s on
        # v5e vs ~27k with bf16 storage (the pure-JAX ceiling at the same
        # batch). Quant grid snaps still compute in fp32 (scales stay fp32;
        # int8 codes are exact in bf16), so deploy-vs-sim error stays at
        # the bf16 rounding level.
        self.precision = precision
        span = list(op_span) if op_span is not None else None
        bad = [op.name for op in (span or graph.operations.values())
               if op.type in UNCOMPILABLE_TYPES]
        if bad:
            raise ValueError(
                f'Graph contains data-dependent ops that cannot compile into '
                f'a static XLA program: {bad}. Use the eager TPUExecutor.')
        self.graph = graph
        self._order = span if span is not None else graph.topological_sort()
        self._ctx = ExecContext(graph, self._order)
        if span is not None:
            produced = {v.name for op in span for v in op.outputs}
            if input_names is None:
                input_names = sorted({
                    v.name for op in span for v in op.inputs
                    if not v.is_parameter and v.name not in produced})
            if output_names is None:
                output_names = sorted(
                    {v.name for op in span for v in op.outputs
                     if v.name in graph.outputs or any(
                         d not in span for d in v.dest_ops)})
            self._param_scope = {v.name for op in span for v in op.inputs
                                 if v.is_parameter}
        else:
            input_names = list(input_names or graph.inputs.keys())
            output_names = list(output_names or graph.outputs.keys())
            self._param_scope = None
        self.output_names = list(output_names)
        self._input_names = list(input_names)
        # names of ops lowered via the integer-exact path (populated at
        # trace time; diagnostic — tests assert the lowering engages)
        self.int_lowered: List[str] = []
        # ops that propagate/compute on integer codes without dequantizing
        self.int_coded: List[str] = []
        # lowered ops whose WORST-CASE partial sum (reduction_len * |x|max *
        # |w|max) exceeds 2^24 — beyond that fp32 accumulation is no longer
        # guaranteed bit-identical to an int32-accumulating backend (it
        # stays exact in practice for realistic data). int_accum_guard=True
        # rejects lowering these ops instead of recording them.
        self.int_accum_risk: List[str] = []
        self._int_accum_guard = bool(int_accum_guard)
        # weight parameters pre-lowered to integer codes (init_params ships
        # them as bf16 codes: no per-step recover division, half the HBM)
        self._precoded: Dict[str, dict] = {}
        if precision == 'int':
            self._build_precoded()

    # ------------------------------------------------------------ pytrees
    def init_params(self) -> Dict[str, jnp.ndarray]:
        """Parameter pytree (weights stay runtime args → shardable/donatable,
        not burned into the program)."""
        from ..ir import soi_input_indices
        # params consumed at SOI-typed input slots (Reshape shapes, Resize
        # scales, Slice starts, …) must stay concrete at trace time — they
        # are burned into the program rather than passed as traced args.
        soi_vars = set()
        for op in self._order:
            for idx in soi_input_indices(op):
                if idx < len(op.inputs):
                    soi_vars.add(op.inputs[idx].name)
        out = {}
        for name, var in self.graph.variables.items():
            if self._param_scope is not None and name not in self._param_scope:
                continue
            if name in soi_vars:
                continue
            if var.is_parameter and var.has_value:
                val = np.asarray(var.value)
                if np.issubdtype(val.dtype, np.floating):
                    if name in self._precoded:
                        # int mode: ship the weight as bf16 integer codes —
                        # no per-step recover division, half the HBM read
                        out[name] = self._precode_weight(name, val)
                        continue
                    dt = (jnp.bfloat16 if self.precision == 'bf16'
                          else jnp.float32)
                    out[name] = jnp.asarray(val, dt)
        return out

    def init_qparams(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Trainable quantization parameter pytree: one {scale, offset} per
        *root* active TQC (slaves resolve to their dominator)."""
        out = {}
        for op in self._order:
            if not isinstance(op, QuantableOperation):
                continue
            for cfg in op.config:
                root = cfg.dominated_by
                if not _is_trainable_cfg(root):
                    continue
                key = _cfg_key(root)
                if key not in out:
                    out[key] = {
                        'scale': jnp.asarray(root.scale, jnp.float32),
                        'offset': jnp.asarray(root.offset, jnp.float32),
                    }
        return out

    def write_back_qparams(self, qparams: Dict[str, Dict[str, jnp.ndarray]]):
        """Push trained scales/offsets back onto the IR's TQCs."""
        seen = {}
        for op in self._order:
            if not isinstance(op, QuantableOperation):
                continue
            for cfg in op.config:
                root = cfg.dominated_by
                key = _cfg_key(root)
                if key in qparams and key not in seen:
                    root.scale = np.asarray(qparams[key]['scale'])
                    root.offset = np.asarray(qparams[key]['offset'])
                    seen[key] = True

    # ------------------------------------------------------------- tracing
    def _apply_quant(self, value, cfg: TensorQuantizationConfig,
                     qparams: Optional[dict]):
        if cfg is None:
            return value
        if isinstance(value, np.ndarray) and \
                not np.issubdtype(value.dtype, np.floating):
            return value
        if not cfg.is_active:
            return value
        if cfg.policy.dynamic:
            return dynamic_linear_fake_quant(
                value, cfg.quant_min, cfg.quant_max,
                symmetric=cfg.policy.symmetric, rounding=cfg.rounding,
                channel_axis=cfg.channel_axis)
        if qparams is not None:
            key = _cfg_key(cfg)
            if key in qparams:
                scale = qparams[key]['scale']
                offset = qparams[key]['offset']
                if cfg.policy.floating:
                    return floating_fake_quant(
                        value, scale, cfg.exponent_bits,
                        cfg.num_of_bits - 1 - cfg.exponent_bits,
                        cfg.quant_min, cfg.quant_max)
                return linear_fake_quant(
                    value, scale, offset, cfg.quant_min, cfg.quant_max,
                    cfg.rounding, cfg.channel_axis)
        return ppq_fake_quant(value, cfg)

    # ------------------------------------------- integer-exact simulation
    @staticmethod
    def _weight_axes(op, w_ndim: int):
        """(expected weight scale axis | None, output channel axis | None
        meaning 'last axis of y') for an INT_EXACT_TYPES op."""
        t = op.type
        if t == 'Conv':
            return 0, 1                  # OIHW weights → NCHW outputs
        if t == 'ConvTranspose':
            return 1, 1                  # IOHW weights
        if t == 'Gemm':
            return (0 if int(op.attributes.get('transB', 0)) else 1), 1
        # MatMul / PPQBiasFusedMatMul. A 1-D rhs has only the contraction
        # axis — a per-channel scale there cannot factor out of the dot:
        # require a per-tensor scale in that case.
        return ((w_ndim - 1) if w_ndim >= 2 else None), None

    def _int_site(self, cfg: TensorQuantizationConfig,
                  expected_axis: Optional[int],
                  ndim: Optional[int] = None) -> Optional[dict]:
        """Resolve `cfg` to a usable integer grid for the int-exact mode.

        Returns {site, already, scale, offset, axis, uid, lo, hi, bound}
        or None when the site is ineligible. `already` — the value arriving
        at this site is ALREADY fake-quantized (OVERLAPPED under an active
        dominator, or BAKED). lo/hi bound the centered code range; bf16
        holds integers exactly up to 2^8 = 256, so any <=8-bit scheme
        qualifies (sym int8 codes <=128, asym uint8 centered <=255).

        expected_axis None → require a per-tensor (scalar) scale (the
        activation side: a per-channel scale on the contraction axis cannot
        factor out of the matmul); an int → per-tensor OR per-channel on
        exactly that axis (the weight side: scale rides the output axis).
        """
        if cfg is None:
            return None
        root = cfg.dominated_by
        if cfg.is_active:
            site, already = cfg, False
        elif (cfg.state == QuantizationStates.OVERLAPPED and
              QuantizationStates.is_activated(root.state)):
            site, already = root, True
        elif cfg.state in (QuantizationStates.BAKED,
                           QuantizationStates.PASSIVE_BAKED):
            site, already = cfg, True
        else:
            return None
        pol = site.policy
        if not pol.linear or pol.dynamic or pol.floating or \
                not site.has_scale:
            return None
        scale = np.asarray(site.scale, np.float32)
        offset = (np.asarray(site.offset, np.float32)
                  if pol.asymmetric else np.zeros_like(scale))
        axis = site.channel_axis if pol.per_channel else None
        if axis is not None:
            if ndim is not None:
                axis = axis % ndim
            if expected_axis is None or axis != expected_axis:
                return None
        elif scale.size != 1:
            return None
        o_r = np.round(offset)
        lo = float(np.min(site.quant_min - o_r))
        hi = float(np.max(site.quant_max - o_r))
        bound = max(abs(lo), abs(hi))
        if bound > 256:
            return None
        return {'site': site, 'already': already, 'scale': scale,
                'offset': offset, 'axis': axis, 'uid': root._uid,
                'lo': lo, 'hi': hi, 'bound': bound}

    def _codes_for_site(self, v, cfg: TensorQuantizationConfig,
                        expected_axis: Optional[int]):
        """Lower input `v` (raw value, fake-quantized value, or _Coded) to
        centered integer codes at `cfg`'s site. Returns (codes, info) or
        None when ineligible — info as from _int_site."""
        if isinstance(v, np.ndarray) and \
                not np.issubdtype(v.dtype, np.floating):
            return None
        if isinstance(v, _Coded):
            info = self._int_site(cfg, expected_axis,
                                  ndim=jnp.asarray(v.codes).ndim)
            if info is None:
                return None
            if v.axis is None and info['axis'] is None and \
                    info['uid'] == v.uid:
                codes = v.codes
                # the consumer's range may be NARROWER than the producer's
                # (joint-quant chains with unequal quant_min/max): clip
                if info['lo'] > v.lo or info['hi'] < v.hi:
                    codes = jnp.clip(codes, info['lo'], info['hi'])
                info = dict(info, lo=max(info['lo'], v.lo),
                            hi=min(info['hi'], v.hi))
                info['bound'] = max(abs(info['lo']), abs(info['hi']))
                return codes, info
            # different grid → requantize through the decoded value
            codes = linear_quant_codes(
                v.decode(), info['scale'], info['offset'],
                info['site'].quant_min, info['site'].quant_max,
                info['site'].rounding, info['axis'])
            return codes, info
        info = self._int_site(cfg, expected_axis, ndim=jnp.asarray(v).ndim)
        if info is None:
            return None
        if info['already']:
            # value is ALREADY fake-quantized upstream — recover the codes
            # by dividing the grid back out
            codes = linear_recover_codes(
                v, info['scale'], info['offset'], info['site'].quant_min,
                info['site'].quant_max, info['axis'])
        else:
            codes = linear_quant_codes(
                v, info['scale'], info['offset'], info['site'].quant_min,
                info['site'].quant_max, info['site'].rounding, info['axis'])
        return codes, info

    def _build_precoded(self):
        """Register weight parameters of int-lowerable ops for pre-coding:
        init_params ships them as bf16 integer codes, so every forward
        skips the recover/quant pass over the weights and reads HALF the
        bytes from HBM."""
        for op in self._order:
            if not isinstance(op, QuantableOperation):
                continue
            if op.type not in INT_EXACT_TYPES or len(op.inputs) < 2:
                continue
            wvar = op.inputs[1]
            if not wvar.is_parameter or not wvar.has_value:
                continue
            if len(wvar.dest_ops) != 1 or wvar.name in self._precoded:
                continue
            w_val = np.asarray(wvar.value)
            if not np.issubdtype(w_val.dtype, np.floating):
                continue
            cfgs = op.config.input_quantization_config
            if len(cfgs) < 2:
                continue
            w_axis, _ = self._weight_axes(op, w_val.ndim)
            info = self._int_site(cfgs[1], expected_axis=w_axis,
                                  ndim=w_val.ndim)
            if info is None:
                continue
            if op.type == 'ConvTranspose' and \
                    int(op.attributes.get('group', 1)) != 1 and \
                    info['scale'].size != 1:
                continue   # per-channel axis 1 covers only C_out/group rows
            self._precoded[wvar.name] = info

    def _precode_weight(self, name: str, value: np.ndarray) -> jnp.ndarray:
        """Compute the bf16 integer codes for a registered weight."""
        info = self._precoded[name]
        if info['already']:
            codes = linear_recover_codes(
                value, info['scale'], info['offset'], info['site'].quant_min,
                info['site'].quant_max, info['axis'])
        else:
            codes = linear_quant_codes(
                value, info['scale'], info['offset'], info['site'].quant_min,
                info['site'].quant_max, info['site'].rounding, info['axis'])
        return jnp.asarray(codes, jnp.bfloat16)

    def _int_exact_forward(self, op, in_vals):
        """Integer-exact lowering of a quantized Conv/Gemm/MatMul: run the
        contraction over bf16 integer codes with an fp32 accumulator, then
        apply s_x * s_w on the output axis and the fake-quantized bias.
        Exactness: bit-identical to an int32-accumulating int8 backend
        whenever partial sums stay below 2^24 (fp32's exact-integer range);
        ops whose WORST CASE exceeds that are recorded in int_accum_risk
        and rejected under int_accum_guard=True. Returns [y] (fp32) or None
        to fall back to the generic path."""
        t = op.type
        if t not in INT_EXACT_TYPES or len(in_vals) < 2:
            return None
        cfgs = op.config.input_quantization_config
        if len(cfgs) < 2:
            return None
        x, w = in_vals[0], in_vals[1]
        if isinstance(w, _Coded):
            w_shape = tuple(jnp.asarray(w.codes).shape)
        else:
            try:
                w_shape = tuple(jnp.asarray(w).shape)
            except Exception:
                return None
        w_ndim = len(w_shape)
        group = int(op.attributes.get('group', 1))
        w_axis, out_axis = self._weight_axes(op, w_ndim)
        rx = self._codes_for_site(x, cfgs[0], expected_axis=None)
        if rx is None:
            return None
        if isinstance(w, _Coded):
            # pre-coded parameter (built against this op's own cfg)
            qw, sw, bw = w.codes, w.scale, max(abs(w.lo), abs(w.hi))
        else:
            rw = self._codes_for_site(w, cfgs[1], expected_axis=w_axis)
            if rw is None:
                return None
            qw, sw, bw = rw[0], rw[1]['scale'], rw[1]['bound']
        qx, xinfo = rx
        sx, bx = xinfo['scale'], xinfo['bound']
        if t == 'ConvTranspose' and group != 1 and sw.size != 1:
            return None   # per-channel axis 1 covers only C_out/group rows
        # fp32 partial sums are exact integers only below 2^24 — flag (or
        # reject, under the guard) ops whose worst case can exceed that
        if t == 'Conv':
            red = int(np.prod(w_shape[1:]))
        elif t == 'ConvTranspose':
            red = (w_shape[0] // group) * int(np.prod(w_shape[2:]))
        elif t == 'Gemm':
            red = w_shape[1 if int(op.attributes.get('transB', 0)) else 0]
        else:
            red = w_shape[-2] if w_ndim >= 2 else w_shape[0]
        if red * bx * bw > 2.0 ** 24:
            if op.name not in self.int_accum_risk:
                self.int_accum_risk.append(op.name)
            if self._int_accum_guard:
                return None
        fn = resolve_forward(op.platform, op.type)
        from .ops.default import accumulation_dtype, simulation_precision
        with simulation_precision('default'), \
                accumulation_dtype(jnp.float32):
            y = fn(op, [jnp.asarray(qx, jnp.bfloat16),
                        jnp.asarray(qw, jnp.bfloat16)], self._ctx)
        if isinstance(y, (tuple, list)):
            y = y[0]
        sxs = jnp.asarray(sx, jnp.float32).reshape(())
        sws = jnp.asarray(sw, jnp.float32)
        if sws.size == 1:
            y = y * (sxs * sws.reshape(()))
        else:
            shape = [1] * y.ndim
            shape[out_axis if out_axis is not None else y.ndim - 1] = -1
            y = y * (sxs * sws.reshape(shape))
        if len(in_vals) > 2 and in_vals[2] is not None and \
                getattr(in_vals[2], 'size', 1) > 0:
            b = self._apply_quant(_decode(in_vals[2]),
                                  cfgs[2] if len(cfgs) > 2 else None, None)
            b = jnp.asarray(b, jnp.float32)
            if t in ('Conv', 'ConvTranspose'):
                y = y + b.reshape((1, -1) + (1,) * (y.ndim - 2))
            elif t == 'Gemm':
                y = y + b * float(op.attributes.get('beta', 1.0))
            else:
                y = y + b
        if op.name not in self.int_lowered:
            self.int_lowered.append(op.name)
        return [y]

    def _int_forward(self, op, in_vals):
        """Integer-exact handling of one quantable op. Returns the output
        values (plain arrays or _Coded) with OUTPUT-site quantization
        already applied, or None to take the generic fp32 path."""
        t = op.type
        if t in INT_EXACT_TYPES:
            outs = self._int_exact_forward(op, in_vals)
            if outs is None:
                return None
            return self._quant_outputs_int(op, outs)
        cfgs = op.config.input_quantization_config
        if t in INT_CODED_PASSTHRU and len(op.outputs) == 1 and \
                isinstance(in_vals[0], _Coded):
            v = in_vals[0]
            if v.axis is not None:
                return None
            cfg0 = cfgs[0] if cfgs else None
            if cfg0 is not None and cfg0.is_active:
                r = self._codes_for_site(v, cfg0, expected_axis=None)
                if r is None:
                    return None
                codes, info = r
                codes = jnp.asarray(codes, jnp.bfloat16)
                scale, uid = info['scale'], info['uid']
                lo, hi = info['lo'], info['hi']
            else:
                codes, scale, uid, lo, hi = v.codes, v.scale, v.uid, v.lo, v.hi
            fn = resolve_forward(op.platform, op.type)
            y = fn(op, [codes] + [_decode(x) for x in in_vals[1:]], self._ctx)
            if isinstance(y, (tuple, list)):
                y = y[0]
            if t == 'Relu':
                lo = max(lo, 0.0)
            out = _Coded(y, scale, None, uid, lo, hi)
            if op.name not in self.int_coded:
                self.int_coded.append(op.name)
            return self._quant_outputs_int(op, [out])
        if t in ('Add', 'Sum') and len(in_vals) == 2 and \
                len(op.outputs) == 1 and \
                all(isinstance(v, _Coded) for v in in_vals):
            # residual/eltwise adds: QuantAlignment forces the inputs onto
            # one shared grid — the sum of codes is exact integer math in
            # fp32 (|sum| <= 512 < 2^24); the output site requantizes
            rs = [self._codes_for_site(v, c, None)
                  for v, c in zip(in_vals, cfgs)]
            if any(r is None for r in rs):
                return None
            s0 = float(np.asarray(rs[0][1]['scale']).reshape(()))
            if float(np.asarray(rs[1][1]['scale']).reshape(())) != s0:
                return None
            y = (jnp.asarray(rs[0][0], jnp.float32) +
                 jnp.asarray(rs[1][0], jnp.float32)) * s0
            if op.name not in self.int_coded:
                self.int_coded.append(op.name)
            return self._quant_outputs_int(op, [y])
        if t == 'Concat' and len(op.outputs) == 1 and \
                all(isinstance(v, _Coded) for v in in_vals):
            rs = [self._codes_for_site(v, c, None)
                  for v, c in zip(in_vals, cfgs)]
            if any(r is None for r in rs):
                return None
            s0 = float(np.asarray(rs[0][1]['scale']).reshape(()))
            if any(float(np.asarray(r[1]['scale']).reshape(())) != s0
                   for r in rs[1:]):
                return None
            if any(r[1]['uid'] != rs[0][1]['uid'] for r in rs[1:]):
                return None
            codes = jnp.concatenate(
                [jnp.asarray(r[0], jnp.bfloat16) for r in rs],
                axis=int(op.attributes.get('axis', 0)))
            out = _Coded(codes, rs[0][1]['scale'], None, rs[0][1]['uid'],
                         min(r[1]['lo'] for r in rs),
                         max(r[1]['hi'] for r in rs))
            if op.name not in self.int_coded:
                self.int_coded.append(op.name)
            return self._quant_outputs_int(op, [out])
        if t in ('GlobalAveragePool', 'AveragePool', 'ReduceMean') and \
                len(op.outputs) == 1 and isinstance(in_vals[0], _Coded):
            # linear in the input: mean(codes) * s — the code sum is exact
            # in fp32, the division is the same arithmetic the fp32
            # simulation performs
            r = self._codes_for_site(in_vals[0], cfgs[0], None)
            if r is None:
                return None
            codes, info = r
            fn = resolve_forward(op.platform, op.type)
            y = fn(op, [jnp.asarray(codes, jnp.float32)]
                   + [_decode(x) for x in in_vals[1:]], self._ctx)
            if isinstance(y, (tuple, list)):
                y = y[0]
            y = y * float(np.asarray(info['scale']).reshape(()))
            if op.name not in self.int_coded:
                self.int_coded.append(op.name)
            return self._quant_outputs_int(op, [y])
        return None

    def _quant_outputs_int(self, op, outs):
        cfgs = op.config.output_quantization_config
        return [self._quant_one_output_int(v, c)
                for v, c in zip(outs, list(cfgs) + [None] * len(outs))]

    def _quant_one_output_int(self, v, cfg: TensorQuantizationConfig):
        """Output-site quantization in the integer-exact mode. Returns a
        _Coded (bf16 codes — the fp32 dequant never materializes unless a
        non-code-aware consumer decodes on demand) or a plain array."""
        if isinstance(v, _Coded):
            if cfg is None or not cfg.is_active:
                return v                      # quant happens elsewhere
            info = self._int_site(cfg, expected_axis=None,
                                  ndim=jnp.asarray(v.codes).ndim)
            if info is None:
                return self._apply_quant(v.decode(), cfg, None)
            if v.axis is None and info['axis'] is None and \
                    info['uid'] == v.uid:
                if info['lo'] <= v.lo and info['hi'] >= v.hi:
                    return v                  # already on this grid
                return _Coded(jnp.clip(v.codes, info['lo'], info['hi']),
                              v.scale, None, v.uid,
                              max(info['lo'], v.lo), min(info['hi'], v.hi))
            codes = linear_quant_codes(
                v.decode(), info['scale'], info['offset'],
                info['site'].quant_min, info['site'].quant_max,
                info['site'].rounding, info['axis'])
            return _Coded(jnp.asarray(codes, jnp.bfloat16), info['scale'],
                          None, info['uid'], info['lo'], info['hi'])
        if cfg is None or not cfg.is_active:
            return self._apply_quant(v, cfg, None)
        if isinstance(v, np.ndarray) and \
                not np.issubdtype(v.dtype, np.floating):
            return v
        info = self._int_site(cfg, expected_axis=None,
                              ndim=jnp.asarray(v).ndim)
        if info is None:
            # per-channel / non-linear / >8-bit output: plain fake-quant
            return self._apply_quant(v, cfg, None)
        codes = linear_quant_codes(
            v, info['scale'], info['offset'], info['site'].quant_min,
            info['site'].quant_max, info['site'].rounding, None)
        return _Coded(jnp.asarray(codes, jnp.bfloat16), info['scale'], None,
                      info['uid'], info['lo'], info['hi'])

    def _collect_stat(self, stats: dict, var_name: str,
                      cfg: TensorQuantizationConfig, value,
                      stat_spec, hist_scales: Optional[dict],
                      ranges: Optional[dict] = None):
        if isinstance(value, np.ndarray) and \
                not np.issubdtype(value.dtype, np.floating):
            return
        spec = stat_spec if isinstance(stat_spec, dict) else None
        if spec is not None:
            entry = spec.get(var_name)
            if entry is None:
                return
            kind = entry['kind'] if isinstance(entry, dict) else entry
        else:
            entry = None      # bare-string spec: branches below fall back
            kind = stat_spec
        v = jnp.asarray(value, jnp.float32)
        if cfg.policy.per_channel and cfg.channel_axis is not None:
            axes = tuple(i for i in range(v.ndim)
                         if i != cfg.channel_axis % v.ndim)
        else:
            axes = tuple(range(v.ndim))
        if kind == 'minmax':
            stats[var_name] = (jnp.min(v, axis=axes), jnp.max(v, axis=axes))
        elif kind == 'percentile':
            pct = entry.get('percentile', 0.9999) if isinstance(entry, dict) \
                else 0.9999
            if cfg.policy.per_channel and cfg.channel_axis is not None:
                ax = cfg.channel_axis % v.ndim
                moved = jnp.moveaxis(v, ax, 0).reshape(v.shape[ax], -1)
                hi = jnp.quantile(moved, pct, axis=1)
                lo = jnp.quantile(moved, 1.0 - pct, axis=1)
            else:
                flat = v.reshape(-1)
                hi = jnp.quantile(flat, pct)
                lo = jnp.quantile(flat, 1.0 - pct)
            stats[var_name] = (lo, hi)
        elif kind == 'quantile_bisect':
            # per-tensor quantile WITHOUT a sort or a histogram: 24-step
            # bisection on the threshold. An XLA sort compiles
            # pathologically slowly on TPU and the histogram CDF needed a
            # SECOND full-network sweep (and a second ~30s program
            # compile); this is pure compare+reduce inside the SAME
            # phase-1 program — calibration becomes single-phase. The
            # result is the smallest data-bracketing threshold at
            # (range/2^24) resolution, matching the eager per-batch
            # quantile up to interpolation within one element gap.
            pct = entry.get('percentile', 0.9999) if isinstance(entry, dict) \
                else 0.9999
            flat = v.reshape(-1)
            n = flat.shape[0]
            qs = jnp.asarray([1.0 - pct, pct], jnp.float32) * n
            lo0 = jnp.min(flat)
            hi0 = jnp.max(flat)
            span = jnp.maximum(hi0 - lo0, 1e-30)

            def body(_, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum(flat[None, :] <= mid[:, None],
                              axis=1).astype(jnp.float32)
                ok = cnt >= qs
                return (jnp.where(ok, lo, mid), jnp.where(ok, mid, hi))

            lo, hi = jax.lax.fori_loop(
                0, 24, body,
                (jnp.full((2,), lo0 - 1e-3 * span),
                 jnp.full((2,), hi0)))
            stats[var_name] = (hi[0], hi[1])
        elif kind == 'absmax':
            stats[var_name] = jnp.max(jnp.abs(v))
        elif kind == 'hist':
            # range arrives as a TRACED argument (ranges dict) so the
            # compiled program is independent of the calibration data —
            # the persistent XLA cache then hits across runs and models
            # of the same architecture; a baked constant would force a
            # fresh compile for every new range
            if ranges is not None and var_name in ranges:
                scale = ranges[var_name]
            else:
                scale = hist_scales[var_name]
            bins = (entry.get('bins', OBSERVER_KL_HIST_BINS)
                    if isinstance(entry, dict) else OBSERVER_KL_HIST_BINS)
            idx = jnp.clip((jnp.abs(v).reshape(-1) / scale).astype(jnp.int32),
                           0, bins - 1)
            stats[var_name] = _device_histogram(idx, bins)
        elif kind == 'absmax_hist':
            # fused kl/mse calibration kind: ONE program yields both the
            # range probe (absmax) and the |x| histogram, with the
            # histogram scale riding as a TRACED argument. The calibrator
            # then runs the SAME compiled program twice — sweep 1 with a
            # dummy scale to learn absmax, sweep 2 with the real scale to
            # fill histograms — instead of compiling two full-network
            # programs (the two ~20-30s compiles serialized on the
            # remote-compile backend and dominated cold-start wall).
            if ranges is not None and var_name in ranges:
                scale = ranges[var_name]
            else:
                scale = (hist_scales or {}).get(var_name, 1.0)
            bins = (entry.get('bins', OBSERVER_KL_HIST_BINS)
                    if isinstance(entry, dict) else OBSERVER_KL_HIST_BINS)
            a = jnp.abs(v)
            stats[var_name] = (jnp.max(a),
                               _device_histogram_nd(a, scale, bins))
        elif kind == 'hist_signed':
            # signed histogram over a [lo, hi) range — used by the compiled
            # percentile calibrator (an XLA sort/quantile over big
            # activations compiles pathologically slowly on TPU; a
            # histogram CDF is one fused scatter-free pass). lo/width come
            # from the traced ranges dict when present (same cache
            # rationale as 'hist').
            if ranges is not None and var_name in ranges:
                lo, width = ranges[var_name]
            else:
                lo, width = entry['lo'], entry['width']
            bins = entry.get('bins', OBSERVER_KL_HIST_BINS)
            idx = jnp.clip(((v.reshape(-1) - lo) / width).astype(jnp.int32),
                           0, bins - 1)
            stats[var_name] = _device_histogram(idx, bins)

    def _trace(self, params: dict, qparams: Optional[dict], inputs: dict,
               stat_kind: Optional[str] = None,
               hist_scales: Optional[dict] = None,
               ranges: Optional[dict] = None):
        values: Dict[str, Any] = {}
        stats: Dict[str, Any] = {}
        # integer-exact mode engages only for plain inference (training and
        # calibration paths need live fp32 values / gradients)
        is_int = (self.precision == 'int' and qparams is None
                  and stat_kind is None)

        def cast(v):
            # bf16 deploy storage: every float tensor flowing between ops
            # lives in bfloat16 (scales/quant math stay fp32 inside
            # _apply_quant; int8 codes are exact in bf16)
            if self.precision == 'bf16' and hasattr(v, 'dtype') and \
                    jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating):
                return jnp.asarray(v, jnp.bfloat16)
            return v

        for name in self._input_names:
            values[name] = cast(inputs[name])

        def fetch(var):
            if var.name in values:
                return values[var.name]
            if var.is_parameter:
                if var.name in params:
                    if var.name in self._precoded:
                        # params leaf holds bf16 codes (init_params); wrap
                        # so non-int paths decode back to the fq value
                        m = self._precoded[var.name]
                        return _Coded(params[var.name], m['scale'],
                                      m['axis'], m['uid'], m['lo'], m['hi'])
                    return params[var.name]
                return cast(var.value)
            raise RuntimeError(f'compile: no value for {var.name}')

        for op in self._order:
            in_vals = [fetch(v) for v in op.inputs]
            int_outs = None
            if isinstance(op, QuantableOperation):
                cfgs = op.config.input_quantization_config
                if stat_kind is not None:
                    for var, cfg, v in zip(op.inputs, cfgs, in_vals):
                        if (not var.is_parameter and cfg.is_root and
                                cfg.state == QuantizationStates.INITIAL):
                            self._collect_stat(stats, var.name, cfg,
                                               _decode(v), stat_kind,
                                               hist_scales, ranges)
                if is_int:
                    # integer-exact lowering consumes RAW/coded values (it
                    # performs the quantization itself, on codes) and
                    # returns output-quantized values directly
                    int_outs = self._int_forward(op, in_vals)
                if int_outs is None:
                    in_vals = [cast(self._apply_quant(_decode(v), c,
                                                      qparams))
                               for v, c in zip(in_vals, cfgs)]
            else:
                in_vals = [_decode(v) for v in in_vals]
            from ..core import TargetPlatform as _TP
            if int_outs is not None:
                outs = int_outs
            elif op.platform == _TP.SOI or op.type in ('Shape', 'Size'):
                # shape/index subprogram: evaluate on host at trace time so
                # results stay concrete (see _soi_eval docstring)
                outs = _soi_eval(op, in_vals)
            else:
                fn = resolve_forward(op.platform, op.type)
                outs = fn(op, in_vals, self._ctx)
            if not isinstance(outs, (tuple, list)):
                outs = [outs]
            if isinstance(op, QuantableOperation) and int_outs is None:
                cfgs = op.config.output_quantization_config
                if stat_kind is not None:
                    for var, cfg, v in zip(op.outputs, cfgs, outs):
                        if cfg.is_root and \
                                cfg.state == QuantizationStates.INITIAL:
                            self._collect_stat(stats, var.name, cfg, v,
                                               stat_kind, hist_scales,
                                               ranges)
                if is_int:
                    outs = self._quant_outputs_int(op, outs)
                else:
                    outs = [cast(self._apply_quant(v, c, qparams))
                            for v, c in zip(outs, cfgs)]
            for var, v in zip(op.outputs, outs):
                values[var.name] = v

        out_vals = []
        for name in self.output_names:
            if name in values:
                out_vals.append(_decode(values[name]))
            else:
                out_vals.append(self.graph.variables[name].value)
        return out_vals, stats

    # ------------------------------------------------------------ builders
    def build_forward(self) -> Callable:
        """fn(params, inputs_dict) -> [outputs], jitted."""
        from .ops.default import simulation_precision

        def fn(params, inputs):
            with simulation_precision(self.precision):
                outs, _ = self._trace(params, None, inputs)
            if self.precision == 'bf16':
                # io contract stays fp32 regardless of internal storage
                outs = [o.astype(jnp.float32)
                        if jnp.issubdtype(jnp.asarray(o).dtype,
                                          jnp.floating) else o
                        for o in outs]
            return outs
        return jax.jit(fn)

    def build_trainable_forward(self) -> Callable:
        """fn(params, qparams, inputs_dict) -> [outputs], differentiable in
        params AND qparams (LSQ scale gradients via custom_vjp)."""
        def fn(params, qparams, inputs):
            outs, _ = self._trace(params, qparams, inputs)
            return outs
        return jax.jit(fn)

    def build_calibration_forward(self, stat_kind: str = 'minmax',
                                  hist_scales: Optional[Dict[str, float]] = None
                                  ) -> Callable:
        """fn(params, inputs_dict, ranges=None) -> ([outputs], stats) — the
        functional observer transform. stats fold across batches on host
        (tiny). `ranges` carries histogram lo/width (or scale) values as
        TRACED inputs, so the compiled program hashes identically across
        calibration runs — data-derived constants would defeat the
        persistent compilation cache."""
        hs = None
        if hist_scales is not None:
            hs = {k: float(v) for k, v in hist_scales.items()}

        def fn(params, inputs, ranges=None):
            return self._trace(params, None, inputs, stat_kind=stat_kind,
                               hist_scales=hs, ranges=ranges)
        return jax.jit(fn)

    # ---------------------------------------------------------- conveniences
    def make_runner(self, chain: int = 1) -> Callable:
        """Self-contained inference callable: closes over device-resident
        params; accepts a single array, sequence, or dict of inputs.

        chain > 1 builds the BULK runner: inputs carry a leading chain
        axis (chain, batch, ...) and the whole chain executes as ONE
        device program (`lax.scan` over the stacked batches), returning
        stacked outputs. Host dispatch overhead is paid once per chain
        instead of once per batch — the batch-inference analogue of the
        serving engine's burst decode. Caveat: XLA may fuse the scanned
        body slightly differently than the straight-line program, so
        values can deviate from the chain=1 runner by ~one int8 rounding
        step (measured SNR ~3e-4 on ResNet-18 logits, predictions
        stable); bit-exactness across the two modes is not guaranteed."""
        fwd = self.build_forward()
        params = jax.device_put(self.init_params())
        if chain > 1:
            @jax.jit
            def fwd_chain(params, inputs):
                def body(carry, inp):
                    return carry, fwd(params, inp)
                return jax.lax.scan(body, None, inputs)[1]
        else:
            fwd_chain = fwd

        def run(inputs):
            if not isinstance(inputs, dict):
                if isinstance(inputs, (list, tuple)):
                    inputs = dict(zip(self._input_names, inputs))
                else:
                    inputs = {self._input_names[0]: inputs}
            return fwd_chain(params, inputs)
        return run


def compile_graph(graph: BaseGraph,
                  output_names: Optional[List[str]] = None,
                  precision: str = 'highest',
                  int_accum_guard: bool = False) -> CompiledGraph:
    return CompiledGraph(graph, output_names, precision=precision,
                         int_accum_guard=int_accum_guard)
