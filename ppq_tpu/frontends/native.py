"""Native checkpoint importer/exporter (redesign of ppq/parser/native.py:60).

The .native format is the full-state checkpoint: the whole BaseGraph — ops,
variables, parameter values, TQCs including dominator/master links — via the
core serialization layer (ppq_tpu/core/storage.py), versioned.
"""

from __future__ import annotations

from typing import Optional

from ..core import dump_native, load_native
from ..ir import BaseGraph, GraphBuilder, GraphExporter


class NativeExporter(GraphExporter):
    def export(self, file_path: str, graph: BaseGraph,
               config_path: Optional[str] = None, **kwargs):
        dump_native(graph, file_path)


class NativeImporter(GraphBuilder):
    def build(self, file_path: str, **kwargs) -> BaseGraph:
        return load_native(file_path)
