"""Quant-table exporters for table-driven backends
(redesign of ppq/parser/{ppl,ncnn,tengine,mnn,openvino,nxp,qnn,ascend}
exporters, 69-246 LoC each — each writes the backend's quant-parameter
table next to a plain ONNX model).

Every exporter here emits: (1) the fp32 ONNX model (the backend's own
converter re-quantizes it), and (2) the backend-specific quant table
derived from the exportable TQCs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core import QuantizationStates, TensorQuantizationConfig
from ..ir import BaseGraph, GraphExporter, QuantableOperation
from .onnx import graph_to_model_proto


def collect_exportable(graph: BaseGraph):
    """(var_name, is_parameter, op, cfg) for every exportable root TQC."""
    seen = set()
    out = []
    for op in graph.operations.values():
        if not isinstance(op, QuantableOperation):
            continue
        for var, cfg in op.config_pairs():
            if var.name in seen:
                continue
            if cfg.state == QuantizationStates.OVERLAPPED:
                continue
            if not cfg.can_export or not cfg.dominated_by.has_scale:
                continue
            if cfg.state == QuantizationStates.FP32:
                continue
            seen.add(var.name)
            out.append((var.name, var.is_parameter, op, cfg))
    return out


def _write_onnx(graph: BaseGraph, file_path: str):
    model = graph_to_model_proto(graph)
    with open(file_path, 'wb') as f:
        f.write(model.SerializeToString())


def _range_of(cfg: TensorQuantizationConfig) -> Tuple[np.ndarray, np.ndarray]:
    scale = np.asarray(cfg.scale, np.float64)
    offset = np.asarray(cfg.offset, np.float64)
    lo = (cfg.quant_min - offset) * scale
    hi = (cfg.quant_max - offset) * scale
    return lo, hi


class _TableExporter(GraphExporter):
    table_suffix = '.table'

    def export(self, file_path: str, graph: BaseGraph,
               config_path: Optional[str] = None, **kwargs):
        _write_onnx(graph, file_path)
        table_path = config_path or (os.path.splitext(file_path)[0]
                                     + self.table_suffix)
        self.write_table(graph, table_path)

    def write_table(self, graph: BaseGraph, path: str):
        raise NotImplementedError


class NCNNExporter(_TableExporter):
    """ncnn int8 table: `<key> <scale...>` lines; weights keyed
    `<op>_param_0`, activations keyed by op name
    (reference: ppq/parser/ncnn_exporter.py)."""

    def write_table(self, graph: BaseGraph, path: str):
        lines = []
        for name, is_param, op, cfg in collect_exportable(graph):
            scale = np.atleast_1d(np.asarray(cfg.scale, np.float64))
            inv = 1.0 / np.maximum(scale, 1e-30)
            key = f'{op.name}_param_0' if is_param else op.name
            lines.append(key + ' ' + ' '.join(f'{v:.8f}' for v in inv))
        with open(path, 'w') as f:
            f.write('\n'.join(lines) + '\n')


class TengineExporter(NCNNExporter):
    """Tengine scale table (reference: ppq/parser/tengine_exporter.py);
    same `<key> <scale>` text shape, direct scales."""

    def write_table(self, graph: BaseGraph, path: str):
        lines = []
        for name, is_param, op, cfg in collect_exportable(graph):
            scale = np.atleast_1d(np.asarray(cfg.scale, np.float64))
            offset = np.atleast_1d(np.asarray(cfg.offset, np.float64))
            lines.append(f'{name} ' +
                         ' '.join(f'{s:.8f} {int(o)}' for s, o in
                                  zip(scale, offset)))
        with open(path, 'w') as f:
            f.write('\n'.join(lines) + '\n')


class SNPEExporter(_TableExporter):
    """SNPE/DSP encodings JSON: per-tensor {min, max, scale, offset, bw}
    (reference: ppq/parser/caffe_exporter.py SNPECaffeExporter +
    utils/write_qparams_to_snpe_dlc.py)."""

    table_suffix = '_encodings.json'

    def write_table(self, graph: BaseGraph, path: str):
        acts, params = {}, {}
        for name, is_param, op, cfg in collect_exportable(graph):
            lo, hi = _range_of(cfg)
            rec = [{
                'bitwidth': cfg.num_of_bits,
                'min': float(np.min(lo)), 'max': float(np.max(hi)),
                'scale': float(np.max(np.asarray(cfg.scale))),
                'offset': int(np.round(np.mean(np.asarray(cfg.offset)))),
            }]
            (params if is_param else acts)[name] = rec
        with open(path, 'w') as f:
            json.dump({'activation_encodings': acts,
                       'param_encodings': params}, f, indent=2)


class MNNExporter(_TableExporter):
    """MNN quant json (reference: ppq/parser/mnn_exporter.py)."""

    table_suffix = '_quant.json'

    def write_table(self, graph: BaseGraph, path: str):
        recs = []
        for name, is_param, op, cfg in collect_exportable(graph):
            recs.append({
                'tensor': name, 'op': op.name, 'type': op.type,
                'bits': cfg.num_of_bits,
                'scale': np.atleast_1d(np.asarray(cfg.scale)).tolist(),
                'zero': np.atleast_1d(np.asarray(cfg.offset)).astype(int).tolist(),
                'per_channel': bool(cfg.policy.per_channel),
            })
        with open(path, 'w') as f:
            json.dump(recs, f, indent=2)


class RKNNExporter(MNNExporter):
    """RKNN quant config json (reference: ppq/parser/extension.py RKNN path)."""
    table_suffix = '_rknn_quant.json'


class AscendExporter(MNNExporter):
    """Ascend AMCT-style record file (reference: ppq/parser/ascend_exporter.py)."""
    table_suffix = '_ascend_quant.json'


class NXPExporter(_TableExporter):
    """NXP/FPGA power-of-2 table: exponent per tensor
    (reference: ppq/parser/nxp_exporter.py)."""

    table_suffix = '_po2.table'

    def write_table(self, graph: BaseGraph, path: str):
        lines = []
        for name, is_param, op, cfg in collect_exportable(graph):
            scale = np.atleast_1d(np.asarray(cfg.scale, np.float64))
            exps = np.round(np.log2(np.maximum(scale, 1e-30))).astype(int)
            lines.append(f'{name} ' + ' '.join(str(e) for e in exps))
        with open(path, 'w') as f:
            f.write('\n'.join(lines) + '\n')


class PPLExporter(_TableExporter):
    """PPL backend scale json (reference: ppq/parser/ppl.py:72)."""

    table_suffix = '_ppl_quant.json'

    def write_table(self, graph: BaseGraph, path: str):
        quant_info = {}
        for name, is_param, op, cfg in collect_exportable(graph):
            lo, hi = _range_of(cfg)
            quant_info[name] = {
                'bit_width': cfg.num_of_bits,
                'per_channel': bool(cfg.policy.per_channel),
                'quant_flag': True,
                'scale': np.atleast_1d(np.asarray(cfg.scale)).tolist(),
                'zero_point': np.atleast_1d(np.asarray(cfg.offset)).tolist(),
                'tensor_min': np.atleast_1d(lo).tolist(),
                'tensor_max': np.atleast_1d(hi).tolist(),
            }
        with open(path, 'w') as f:
            json.dump({'quant_info': quant_info}, f, indent=2)
