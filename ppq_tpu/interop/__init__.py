"""Interop layer: run OTHER quantization frameworks head-to-head against
ppq_tpu inside this (network-isolated) environment.

`onnx_shim` provides a minimal `onnx` module (built on the same vendored
protobuf descriptors our own frontend uses) sufficient to import and drive
the reference PPQ implementation on CPU torch — the basis of the
reference-parity tests (tests/test_reference_parity.py): same ONNX file,
same calibration tensors, both frameworks, compare observer scales and
layer outputs.
"""

from .onnx_shim import install_onnx_shim  # noqa: F401
