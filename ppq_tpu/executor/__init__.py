from .base import (OPERATION_FORWARD_TABLE, BaseGraphExecutor,
                   QuantRuntimeHook, RuntimeHook, register_operation_handler,
                   resolve_forward)
from .compile import CompiledGraph, compilable, compile_graph
from .executor import QuantizeDelegator, TPUExecutor
from .ops.default import DEFAULT_BACKEND_TABLE, ExecContext

# per-platform op-table overrides (NXP resize quirk et al.)
from .ops import vendor as _vendor  # noqa: F401,E402
