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
INT_EXACT_TYPES = {'Conv', 'ConvTranspose', 'Gemm', 'MatMul',
                   'PPQBiasFusedMatMul'}


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
    """Scatter-free histogram: chunked equality-sum reduction.

    jnp.bincount lowers to scatter-add, which the TPU compiler handles
    pathologically slowly when dozens of instances appear in one program
    (~5s compile each — calibration programs took minutes). An equality
    one-hot reduction is pure VPU math: ~N*bins bool ops per tensor,
    memory-bounded by the chunk, and compiles in milliseconds.
    """
    CH = 8192
    n = idx.shape[0]
    pad = (-n) % CH
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, idx.dtype)])
    chunks = idx.reshape(-1, CH)
    bin_ids = jnp.arange(bins, dtype=idx.dtype)

    def body(acc, chunk):
        return acc + jnp.sum(
            (chunk[:, None] == bin_ids[None, :]).astype(jnp.int32),
            axis=0), None

    counts, _ = jax.lax.scan(body, jnp.zeros((bins,), jnp.int32), chunks)
    return counts


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
                 precision: str = 'highest'):
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
    def _apply_quant_int(self, value, cfg: TensorQuantizationConfig):
        """Output-site fake-quant for the integer-exact mode: computed VIA
        codes (fq == codes * s bitwise) so downstream lowered consumers can
        reuse the bf16 codes directly — the recover division disappears and
        the fp32 dequant tensor is DCE'd when every consumer is lowered.
        Returns (fq_value, codes_bf16 | None, root_uid | None)."""
        if cfg is None or not cfg.is_active:
            return self._apply_quant(value, cfg, None), None, None
        if isinstance(value, np.ndarray) and \
                not np.issubdtype(value.dtype, np.floating):
            return value, None, None
        pol = cfg.policy
        if not pol.linear or pol.dynamic or pol.floating or \
                not cfg.has_scale:
            return self._apply_quant(value, cfg, None), None, None
        scale = np.asarray(cfg.scale, np.float32)
        offset = (np.asarray(cfg.offset, np.float32)
                  if pol.asymmetric else np.zeros_like(scale))
        ndim = jnp.asarray(value).ndim
        axis = (cfg.channel_axis % ndim
                if pol.per_channel and cfg.channel_axis is not None else None)
        o_r = np.round(offset)
        bound = max(float(np.max(cfg.quant_max - o_r)),
                    float(np.max(o_r - cfg.quant_min)))
        if bound > 256:
            return self._apply_quant(value, cfg, None), None, None
        codes = linear_quant_codes(value, scale, offset, cfg.quant_min,
                                   cfg.quant_max, cfg.rounding, axis)
        if axis is None:
            s_b = jnp.asarray(scale, jnp.float32).reshape(())
        else:
            shape = [1] * ndim
            shape[axis] = -1
            s_b = jnp.asarray(scale, jnp.float32).reshape(shape)
        fq = codes * s_b
        if axis is not None:
            # per-channel codes can't be consumed by the activation side of
            # a lowered matmul; don't advertise them
            return fq, None, None
        return fq, jnp.asarray(codes, jnp.bfloat16), cfg.dominated_by._uid

    def _int_codes(self, value, cfg: TensorQuantizationConfig,
                   expected_axis: Optional[int],
                   cached: Optional[tuple] = None):
        """Lower `value` to centered integer codes for the integer-exact
        path. Returns (codes_f32, scale_np) or None when ineligible.

        expected_axis None → require a per-tensor (scalar) scale (the
        activation side: a per-channel scale on the contraction axis cannot
        factor out of the matmul); an int → per-tensor OR per-channel on
        exactly that axis (the weight side: scale rides the output axis).
        """
        if cfg is None:
            return None
        if isinstance(value, np.ndarray) and \
                not np.issubdtype(value.dtype, np.floating):
            return None
        root = cfg.dominated_by
        already_quantized = False
        if cfg.is_active:
            site = cfg           # quantize here (scale resolves to master)
        elif (cfg.state == QuantizationStates.OVERLAPPED and
              QuantizationStates.is_activated(root.state)) or \
                cfg.state in (QuantizationStates.BAKED,
                              QuantizationStates.PASSIVE_BAKED):
            # value is ALREADY fake-quantized — by the dominator's site
            # upstream (QuantizeSimplify) or at parameter-bake time; recover
            # the codes by dividing the grid back out
            site = cfg if cfg.state in (
                QuantizationStates.BAKED,
                QuantizationStates.PASSIVE_BAKED) else root
            already_quantized = True
        else:
            return None
        pol = site.policy
        if not pol.linear or pol.dynamic or pol.floating:
            return None
        if not site.has_scale:
            return None
        scale = np.asarray(site.scale, np.float32)
        offset = (np.asarray(site.offset, np.float32)
                  if pol.asymmetric else np.zeros_like(scale))
        ndim = jnp.asarray(value).ndim
        axis = site.channel_axis if pol.per_channel else None
        if axis is not None:
            axis = axis % ndim
            if expected_axis is None or axis != expected_axis:
                return None
        elif scale.size != 1:
            return None
        # bf16 holds integers exactly up to 2^8 = 256 — any <=8-bit scheme
        # qualifies (sym int8 codes <=128, asym uint8 centered <=255)
        o_r = np.round(offset)
        bound = max(float(np.max(site.quant_max - o_r)),
                    float(np.max(o_r - site.quant_min)))
        if bound > 256:
            return None
        if already_quantized:
            if cached is not None and cached[1] == site.dominated_by._uid:
                # producer's output-quant site published its codes (same
                # scale root) — consume them directly, skip the recover
                return cached[0], scale
            codes = linear_recover_codes(
                value, scale, offset, site.quant_min, site.quant_max, axis)
        else:
            codes = linear_quant_codes(
                value, scale, offset, site.quant_min, site.quant_max,
                site.rounding, axis)
        return codes, scale

    def _int_exact_forward(self, op, in_vals, codes_by_var=None):
        """Integer-exact lowering of a quantized Conv/Gemm/MatMul: run the
        contraction over bf16 integer codes with an fp32 accumulator (exact
        integer arithmetic — bitwise what an int8 backend computes, modulo
        fp32 accumulation past 2^24), then apply s_x * s_w on the output
        axis and the fake-quantized bias. Returns [y] or None to fall back
        to the generic fp32 path."""
        t = op.type
        if t not in INT_EXACT_TYPES or len(in_vals) < 2:
            return None
        cfgs = op.config.input_quantization_config
        if len(cfgs) < 2:
            return None
        x, w = in_vals[0], in_vals[1]
        try:
            w_ndim = jnp.asarray(w).ndim
        except Exception:
            return None
        group = int(op.attributes.get('group', 1))
        if t == 'Conv':
            w_axis, out_axis = 0, 1      # OIHW weights → NCHW outputs
        elif t == 'ConvTranspose':
            w_axis, out_axis = 1, 1      # IOHW weights
        elif t == 'Gemm':
            w_axis = 0 if int(op.attributes.get('transB', 0)) else 1
            out_axis = 1
        else:                            # MatMul / PPQBiasFusedMatMul
            w_axis, out_axis = w_ndim - 1, None   # None → last axis of y
        cached = None
        if codes_by_var is not None and not op.inputs[0].is_parameter:
            cached = codes_by_var.get(op.inputs[0].name)
        rx = self._int_codes(x, cfgs[0], expected_axis=None, cached=cached)
        if rx is None:
            return None
        rw = self._int_codes(w, cfgs[1], expected_axis=w_axis)
        if rw is None:
            return None
        qx, sx = rx
        qw, sw = rw
        if t == 'ConvTranspose' and group != 1 and sw.size != 1:
            return None   # per-channel axis 1 covers only C_out/group rows
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
            b = self._apply_quant(in_vals[2],
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
        # int mode: bf16 codes published by output-quant sites, keyed by
        # variable name → (codes_bf16, root TQC uid)
        codes_by_var: Dict[str, tuple] = {}

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
                            self._collect_stat(stats, var.name, cfg, v,
                                               stat_kind, hist_scales,
                                               ranges)
                if (self.precision == 'int' and qparams is None
                        and stat_kind is None):
                    # integer-exact lowering consumes RAW values (it
                    # performs the input quantization itself, to codes)
                    int_outs = self._int_exact_forward(op, in_vals,
                                                       codes_by_var)
                if int_outs is None:
                    in_vals = [cast(self._apply_quant(v, c, qparams))
                               for v, c in zip(in_vals, cfgs)]
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
            if isinstance(op, QuantableOperation):
                cfgs = op.config.output_quantization_config
                if stat_kind is not None:
                    for var, cfg, v in zip(op.outputs, cfgs, outs):
                        if cfg.is_root and \
                                cfg.state == QuantizationStates.INITIAL:
                            self._collect_stat(stats, var.name, cfg, v,
                                               stat_kind, hist_scales,
                                               ranges)
                if (self.precision == 'int' and qparams is None
                        and stat_kind is None):
                    quantized = []
                    for var, cfg, v in zip(op.outputs, cfgs, outs):
                        fq, codes, uid = self._apply_quant_int(v, cfg)
                        if codes is not None:
                            codes_by_var[var.name] = (codes, uid)
                        quantized.append(cast(fq))
                    outs = quantized
                else:
                    outs = [cast(self._apply_quant(v, c, qparams))
                            for v, c in zip(outs, cfgs)]
            for var, v in zip(op.outputs, outs):
                values[var.name] = v

        out_vals = []
        for name in self.output_names:
            if name in values:
                out_vals.append(values[name])
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
                  precision: str = 'highest') -> CompiledGraph:
    return CompiledGraph(graph, output_names, precision=precision)
