"""Device-mesh utilities: DP/TP shardings for quantization workloads.

The reference is single-device (SURVEY.md §2.11 — no distributed backend at
all); this module is new TPU-native capability. Design per the standard JAX
recipe: build a Mesh, annotate NamedShardings, let XLA insert ICI
collectives.

Axes:
  dp — data parallel (batch dim). Calibration sweeps and finetune batches
       shard here; gradient/stat reductions become psums over ICI/DCN.
  tp — tensor parallel (channel dim). Conv/Gemm weights shard their
       output-channel axis; per-channel quant scales shard the same axis so
       fake-quant stays local (no collective inside the quant epilogue).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Create a (dp, tp) mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is None and dp is not None and tp is not None:
        n_devices = dp * tp
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and tp is None:
        # favor tp (ICI-bandwidth-bound weights) but keep dp>1 when possible
        dp = 2 if n % 2 == 0 and n > 2 else 1
        tp = n // dp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f'dp({dp}) * tp({tp}) != devices({n})'
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=('dp', 'tp'))


def _tp_axis_for(name: str, shape: Tuple[int, ...], tp_size: int) -> Optional[int]:
    """Choose the axis to shard over tp for one parameter, or None.

    Convention: computing-op weights shard their *largest* axis that is
    divisible by tp_size and big enough to matter; biases and norm params
    stay replicated.
    """
    if len(shape) == 0 or np.prod(shape) < 1024:
        return None
    best, best_size = None, 0
    for ax, s in enumerate(shape):
        if s % tp_size == 0 and s > best_size and s >= 2 * tp_size:
            best, best_size = ax, s
    return best


def tp_param_shardings(params: Dict[str, jax.Array], mesh: Mesh
                       ) -> Dict[str, NamedSharding]:
    """NamedSharding per parameter: big weights sharded over 'tp', the rest
    replicated."""
    tp_size = mesh.shape['tp']
    out = {}
    for name, val in params.items():
        ax = _tp_axis_for(name, tuple(val.shape), tp_size)
        if ax is None:
            out[name] = NamedSharding(mesh, P())
        else:
            spec = [None] * val.ndim
            spec[ax] = 'tp'
            out[name] = NamedSharding(mesh, P(*spec))
    return out


def shard_qparams(qparams: Dict[str, Dict[str, jax.Array]], mesh: Mesh,
                  param_shardings: Optional[Dict[str, NamedSharding]] = None
                  ) -> Dict[str, Dict[str, NamedSharding]]:
    """Quant scales/offsets: replicated (they are tiny; per-channel scales
    follow their weight only when channel counts allow — replication is
    always correct and costs ~nothing)."""
    return {k: {'scale': NamedSharding(mesh, P()),
                'offset': NamedSharding(mesh, P())}
            for k in qparams}


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over 'dp'."""
    return NamedSharding(mesh, P(*(['dp'] + [None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
