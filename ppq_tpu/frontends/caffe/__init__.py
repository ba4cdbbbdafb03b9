import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
if _here not in _sys.path:
    _sys.path.insert(0, _here)

from . import caffe_pb2  # noqa: E402
from .parser import CaffeParser, load_caffe_graph  # noqa: E402
from .exporter import (CaffeExporter, PPLDSPCaffeExporter,  # noqa: E402
                       PPLDSPTICaffeExporter, SNPECaffeExporter)

__all__ = ['caffe_pb2', 'CaffeParser', 'CaffeExporter', 'load_caffe_graph',
           'PPLDSPCaffeExporter', 'PPLDSPTICaffeExporter',
           'SNPECaffeExporter']
