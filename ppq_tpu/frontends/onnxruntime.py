"""QDQ ONNX exporter (redesign of ppq/parser/onnxruntime_exporter.py:41-511).

Writes a deployment-ready ONNX model in the QDQ dialect: every exportable
activation TQC becomes a QuantizeLinear→DequantizeLinear pair; weights are
stored as real int8 initializers followed by DequantizeLinear (per-channel
via the axis attribute, opset 13). Used for ONNXRuntime, TensorRT (QDQ
flavor), OpenVINO and Metax deployment.
"""

from __future__ import annotations

from typing import Dict, Optional, Set, Tuple

import numpy as np

from ..core import (DataType, QuantizationStates, TensorQuantizationConfig,
                    ppq_warning)
from ..ir import BaseGraph, GraphExporter, Operation, QuantableOperation, Variable
from ..quantization.qfunction import ppq_quant_toint
from .onnx import graph_to_model_proto
from .onnx.exporter import dump_quant_config_json


class QDQHelper:
    """Q/DQ insertion surgery over a copied BaseGraph."""

    def __init__(self, graph: BaseGraph):
        self.graph = graph
        self._n = 0

    def _mkname(self, prefix: str) -> str:
        self._n += 1
        return f'{prefix}_{self._n}_ppq'

    def _zp_dtype(self, cfg: TensorQuantizationConfig):
        if cfg.quant_min < 0:
            return np.int8, DataType.INT8
        return np.uint8, DataType.UINT8

    def _qparam_vars(self, cfg: TensorQuantizationConfig
                     ) -> Tuple[Variable, Variable]:
        scale = np.asarray(cfg.scale, np.float32)
        np_dt, _ = self._zp_dtype(cfg)
        offset = np.asarray(np.round(cfg.offset), np.int64).astype(np_dt)
        if not cfg.policy.per_channel:
            scale = scale.reshape(())
            offset = offset.reshape(())
        s_var = self.graph.create_variable(
            self._mkname('scale'), value=scale, is_parameter=True)
        z_var = self.graph.create_variable(
            self._mkname('zero_point'), value=offset, is_parameter=True)
        return s_var, z_var

    def _axis_attr(self, cfg: TensorQuantizationConfig) -> dict:
        if cfg.policy.per_channel and cfg.channel_axis is not None:
            return {'axis': int(cfg.channel_axis)}
        return {}

    def insert_qdq_on_activation(self, var: Variable,
                                 cfg: TensorQuantizationConfig):
        """var -> QuantizeLinear -> DequantizeLinear -> (old consumers)."""
        g = self.graph
        s_var, z_var = self._qparam_vars(cfg)
        attrs = self._axis_attr(cfg)

        q_out = g.create_variable(self._mkname(f'{var.name}_q'))
        dq_out = g.create_variable(self._mkname(f'{var.name}_dq'))

        old_dests = [d for d in var.dest_ops]
        q_op = g.create_operation('QuantizeLinear',
                                  name=self._mkname(f'{var.name}_QuantizeLinear'),
                                  attributes=dict(attrs),
                                  inputs=[var, s_var, z_var], outputs=[q_out])
        dq_op = g.create_operation('DequantizeLinear',
                                   name=self._mkname(f'{var.name}_DequantizeLinear'),
                                   attributes=dict(attrs),
                                   inputs=[q_out, s_var, z_var],
                                   outputs=[dq_out])
        # rewire old consumers to read dq_out
        for dest in old_dests:
            for i, v in enumerate(dest.inputs):
                if v is var:
                    dest.inputs[i] = dq_out
            dq_out.dest_ops.append(dest)
        var.dest_ops[:] = [d for d in var.dest_ops if d not in old_dests]
        # graph outputs re-point through the DQ
        if var.name in g.outputs:
            del g.outputs[var.name]
            g.mark_as_output(dq_out)

    def insert_dq_on_parameter(self, var: Variable,
                               cfg: TensorQuantizationConfig):
        """Replace fp32 weight with int initializer + DequantizeLinear."""
        g = self.graph
        int_value = ppq_quant_toint(np.asarray(var.value), cfg)
        np_dt, ir_dt = self._zp_dtype(cfg)
        if cfg.num_of_bits == 8:
            int_value = int_value.astype(np_dt)
            var.dtype = ir_dt
        else:
            int_value = int_value.astype(np.int32)
            var.dtype = DataType.INT32
        var.value = int_value

        s_var, z_var = self._qparam_vars(cfg)
        attrs = self._axis_attr(cfg)
        dq_out = g.create_variable(self._mkname(f'{var.name}_dq'))
        old_dests = [d for d in var.dest_ops]
        dq_op = g.create_operation('DequantizeLinear',
                                   name=self._mkname(f'{var.name}_DequantizeLinear'),
                                   attributes=dict(attrs),
                                   inputs=[var, s_var, z_var],
                                   outputs=[dq_out])
        for dest in old_dests:
            for i, v in enumerate(dest.inputs):
                if v is var:
                    dest.inputs[i] = dq_out
            dq_out.dest_ops.append(dest)
        var.dest_ops[:] = [d for d in var.dest_ops if d not in old_dests]


class ONNXRuntimeExporter(GraphExporter):
    """(reference: parser/onnxruntime_exporter.py ONNXRUNTIMExporter)"""

    def export(self, file_path: str, graph: BaseGraph,
               config_path: Optional[str] = None, **kwargs):
        g = graph.copy(copy_value=True)
        helper = QDQHelper(g)

        # choose one exportable cfg per variable (producer output preferred,
        # reference dedupe logic onnxruntime_exporter.py:307)
        done: Set[str] = set()
        plan_act: Dict[str, TensorQuantizationConfig] = {}
        plan_w: Dict[str, TensorQuantizationConfig] = {}

        for op in list(g.operations.values()):
            if not isinstance(op, QuantableOperation):
                continue
            for var, cfg in op.config_pairs():
                if var.name in done:
                    continue
                root = cfg.dominated_by
                state = cfg.state
                if state == QuantizationStates.OVERLAPPED:
                    continue
                if not cfg.can_export or not root.has_scale:
                    continue
                if state == QuantizationStates.FP32:
                    continue
                if var.is_parameter:
                    if state in {QuantizationStates.ACTIVATED,
                                 QuantizationStates.BAKED,
                                 QuantizationStates.PASSIVE,
                                 QuantizationStates.PASSIVE_BAKED}:
                        if state in {QuantizationStates.BAKED,
                                     QuantizationStates.PASSIVE_BAKED}:
                            # restore fp32 before re-quantizing to ints
                            if var.name in op._fp32_params:
                                var.value = op._fp32_params[var.name]
                        plan_w[var.name] = cfg
                        done.add(var.name)
                else:
                    plan_act[var.name] = cfg
                    done.add(var.name)

        for name, cfg in plan_w.items():
            helper.insert_dq_on_parameter(g.variables[name], cfg)
        for name, cfg in plan_act.items():
            helper.insert_qdq_on_activation(g.variables[name], cfg)

        model = graph_to_model_proto(g, opset_version=13)
        with open(file_path, 'wb') as f:
            f.write(model.SerializeToString())
        if config_path:
            dump_quant_config_json(graph, config_path)
