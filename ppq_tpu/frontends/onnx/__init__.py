import os as _os
import sys as _sys

# the generated module does plain `import ...` of nothing; safe to import by path
_here = _os.path.dirname(_os.path.abspath(__file__))
if _here not in _sys.path:
    _sys.path.insert(0, _here)

from . import onnx_pb2  # noqa: E402
from .parser import OnnxParser, load_onnx_graph  # noqa: E402
from .exporter import OnnxExporter, graph_to_model_proto  # noqa: E402
