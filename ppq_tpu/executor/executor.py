"""TPUExecutor — the quantization-simulating interpreter.

Redesign of ppq/executor/torch.py:76-682 for JAX:

  * topological walk; per op: fake-quant inputs via TQCs → forward fn →
    fake-quant outputs → hooks → store value; dead activations freed by
    consumer refcount (reference frees at torch.py:565-575).
  * runtime values live in a private dict, NOT on Variable.value —
    parameters stay pristine on the IR and the executor is reentrant.
  * `quantize_function` supports per-TQC delegates (LSQ pass plugs in
    trainable scales, reference torch.py:296,610).
  * `tracing_operation_meta` fills Variable.shape/dtype by running once.
  * `partial_graph_forward` runs a contiguous op span (blockwise finetune).

Eager per-op execution keeps data-dependent (SOI) ops trivially correct —
they run host-side numpy. The whole-graph compiled path (10-100x faster for
calibration sweeps) lives in ppq_tpu/executor/compile.py and is used by the
calibration/analysis passes whenever the graph region is static.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (DataType, QuantizationStates, TargetPlatform,
                    TensorQuantizationConfig, ppq_warning)
from ..ir import BaseGraph, Operation, QuantableOperation, Variable
from ..quantization.qfunction import ppq_fake_quant
from .base import (BaseGraphExecutor, QuantRuntimeHook, RuntimeHook,
                   resolve_forward)
from .ops.default import ExecContext


class QuantizeDelegator:
    """Delegate interface (reference: torch.py:43 TorchQuantizeDelegator)."""

    def __call__(self, tensor, config: TensorQuantizationConfig):
        raise NotImplementedError


class TPUExecutor(BaseGraphExecutor):
    def __init__(self, graph: BaseGraph, device: Optional[str] = None):
        super().__init__(graph)
        self._delegates: Dict[TensorQuantizationConfig, QuantizeDelegator] = {}
        self._ctx = ExecContext(graph, self._executing_order)
        self._device = device

    # -------------------------------------------------------------- delegates
    def register_quantize_delegate(self, config: TensorQuantizationConfig,
                                   delegator: QuantizeDelegator):
        self._delegates[config] = delegator

    def remove_quantize_delegate(self, config: TensorQuantizationConfig):
        self._delegates.pop(config, None)

    def quantize_function(self, tensor, config: Optional[TensorQuantizationConfig]):
        if config is None:
            return tensor
        if config in self._delegates:
            return self._delegates[config](tensor, config)
        # numpy SOI values must stay untouched integers
        if isinstance(tensor, np.ndarray) and not np.issubdtype(tensor.dtype, np.floating):
            return tensor
        if not config.is_active:
            return tensor
        return ppq_fake_quant(tensor, config)

    # ---------------------------------------------------------------- forward
    def forward(self, inputs, output_names: Optional[List[str]] = None,
                hooks: Optional[Dict[str, RuntimeHook]] = None) -> List:
        """One simulated inference (reference torch.py:365)."""
        return self.__forward(inputs, output_names, hooks)

    def __call__(self, inputs, output_names=None):
        return self.forward(inputs, output_names)

    def _feed(self, inputs) -> Dict[str, Any]:
        values: Dict[str, Any] = {}
        graph_inputs = list(self.graph.inputs.values())
        if isinstance(inputs, dict):
            for name, v in inputs.items():
                values[name] = v
        elif isinstance(inputs, (list, tuple)):
            if len(inputs) != len(graph_inputs):
                raise ValueError(
                    f'Graph expects {len(graph_inputs)} inputs '
                    f'({[v.name for v in graph_inputs]}), got {len(inputs)}')
            for var, v in zip(graph_inputs, inputs):
                values[var.name] = v
        else:
            if len(graph_inputs) != 1:
                raise ValueError(
                    f'Graph expects {len(graph_inputs)} inputs, got a single '
                    f'tensor; pass a list or dict')
            values[graph_inputs[0].name] = inputs
        return values

    def __forward(self, inputs, output_names=None,
                  hooks: Optional[Dict[str, RuntimeHook]] = None,
                  op_list: Optional[Sequence[Operation]] = None) -> List:
        values = self._feed(inputs)
        graph = self.graph
        if output_names is None:
            output_names = list(graph.outputs.keys())
        ops = list(op_list) if op_list is not None else self._executing_order

        # remaining-consumer refcount for memory reclamation
        refcount: Dict[str, int] = {}
        for op in ops:
            for var in op.inputs:
                refcount[var.name] = refcount.get(var.name, 0) + 1
        needed = set(output_names)

        # find last op index producing any requested output
        last_idx = len(ops)
        produced_by = {}
        for i, op in enumerate(ops):
            for var in op.outputs:
                produced_by[var.name] = i
        if all(name in produced_by or name in values or
               name in graph.variables and graph.variables[name].is_parameter
               for name in output_names):
            idxs = [produced_by[n] for n in output_names if n in produced_by]
            last_idx = (max(idxs) + 1) if idxs else 0

        for op in ops[:last_idx]:
            hook = hooks.get(op.name) if hooks else None
            in_vals = []
            for var in op.inputs:
                if var.name in values:
                    in_vals.append(values[var.name])
                elif var.is_parameter:
                    in_vals.append(var.value)
                else:
                    raise RuntimeError(
                        f'Executing {op.name}: input variable {var.name} has '
                        f'no value (missing feed or broken topo order)')

            q_in_vals = in_vals
            if isinstance(op, QuantableOperation):
                q_in_vals = [self.quantize_function(v, c) for v, c in
                             zip(in_vals, op.config.input_quantization_config)]

            if hook is not None:
                if isinstance(hook, QuantRuntimeHook) and isinstance(op, QuantableOperation):
                    q_in_vals = hook.pre_forward_hook(
                        in_vals, quant_inputs=q_in_vals,
                        quant_configs=op.config.input_quantization_config)
                else:
                    q_in_vals = hook.pre_forward_hook(q_in_vals)

            fn = resolve_forward(op.platform, op.type)
            outputs = fn(op, q_in_vals, self._ctx)
            if not isinstance(outputs, (tuple, list)):
                outputs = [outputs]

            q_outputs = list(outputs)
            if isinstance(op, QuantableOperation):
                q_outputs = [self.quantize_function(v, c) for v, c in
                             zip(outputs, op.config.output_quantization_config)]

            if hook is not None:
                if isinstance(hook, QuantRuntimeHook) and isinstance(op, QuantableOperation):
                    q_outputs = hook.post_forward_hook(
                        list(outputs), quant_outputs=q_outputs,
                        quant_configs=op.config.output_quantization_config)
                else:
                    q_outputs = hook.post_forward_hook(q_outputs)

            for var, v in zip(op.outputs, q_outputs):
                values[var.name] = v

            # free dead activations
            for var in op.inputs:
                if var.is_parameter:
                    continue
                refcount[var.name] -= 1
                if (refcount[var.name] <= 0 and var.name not in needed
                        and var.name in values):
                    del values[var.name]

        results = []
        for name in output_names:
            if name in values:
                results.append(values[name])
            elif name in graph.variables and graph.variables[name].is_parameter:
                results.append(graph.variables[name].value)
            else:
                raise RuntimeError(f'Requested output {name!r} was not produced')
        return results

    # ----------------------------------------------------------------- extras
    def partial_graph_forward(self, operations: Sequence[Operation],
                              feed_dict: Dict[str, Any],
                              output_names: List[str]) -> List:
        """Run a sub-block only (reference torch.py:654)."""
        return self.__forward(feed_dict, output_names, hooks=None,
                              op_list=operations)

    def tracing_operation_meta(self, inputs,
                               output_names: Optional[List[str]] = None):
        """Shape/dtype inference by execution (reference torch.py:579-613):
        runs the graph once and writes observed meta onto Variables.

        Runs pinned to the CPU backend: only shapes/dtypes matter, and eager
        per-op dispatch to a remote TPU pays seconds of compile+transfer per
        op (the accelerator path is the compiled executor, never this)."""
        try:
            cpu = jax.devices('cpu')[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                return self._tracing_operation_meta(inputs, output_names)
        return self._tracing_operation_meta(inputs, output_names)

    def _tracing_operation_meta(self, inputs,
                                output_names: Optional[List[str]] = None):
        values = self._feed(inputs)
        graph = self.graph
        for op in self._executing_order:
            in_vals = []
            for var in op.inputs:
                if var.name in values:
                    in_vals.append(values[var.name])
                elif var.is_parameter:
                    in_vals.append(var.value)
                else:
                    raise RuntimeError(f'tracing: no value for {var.name}')
            # record input meta
            for var, v in zip(op.inputs, in_vals):
                if v is not None and hasattr(v, 'shape'):
                    var.shape = list(v.shape)
                    var.dtype = _dtype_of(v)
            fn = resolve_forward(op.platform, op.type)
            outputs = fn(op, in_vals, self._ctx)
            if not isinstance(outputs, (tuple, list)):
                outputs = [outputs]
            for var, v in zip(op.outputs, outputs):
                values[var.name] = v
                if v is not None and hasattr(v, 'shape'):
                    var.shape = list(v.shape)
                    var.dtype = _dtype_of(v)

    def dummy_forward(self):
        """Zero-input forward for parameter-only calibration
        (reference torch.py:615)."""
        feed = {}
        for var in self.graph.inputs.values():
            shape = [d if d and d > 0 else 1 for d in (var.shape or [1])]
            feed[var.name] = jnp.zeros(shape, var.dtype.to_numpy())
        return self.forward(feed)

    def forward_with_gradient(self, inputs,
                              output_names: Optional[List[str]] = None):
        """Differentiable forward (reference torch.py:412, torch autograd).

        JAX is functional, so instead of taped tensors this returns
        (outputs, vjp_fn): vjp_fn(cotangents) -> (param_grads, qparam_grads)
        pulled back through the whole compiled graph — quant sites included
        via their custom-vjp STE/LSQ rules.
        """
        from .compile import CompiledGraph
        cg = CompiledGraph(self.graph, output_names=output_names)
        params = cg.init_params()
        qparams = cg.init_qparams()
        fwd = cg.build_trainable_forward()
        feed = self._feed(inputs)
        feed = {k: jnp.asarray(v) for k, v in feed.items()}
        outputs, vjp_fn = jax.vjp(lambda p, q: fwd(p, q, feed),
                                  params, qparams)
        return outputs, vjp_fn


def _dtype_of(v) -> DataType:
    try:
        return DataType.from_numpy(np.dtype(v.dtype))
    except Exception:
        return DataType.FP32
