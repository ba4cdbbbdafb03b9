"""Multi-host (multi-slice / DCN) runtime utilities.

The reference is single-device (SURVEY.md §2.11); ppq_tpu's multi-chip
design runs one JAX process per host, with the global device mesh spanning
all hosts. Two link classes with ~an order of magnitude bandwidth gap
shape every placement decision:

  ICI — the intra-slice torus. Fast, wired for all-to-all traffic.
  DCN — the data-center network between slices/hosts. Slower, point to
        point; fine for the small, infrequent collectives.

Axis-placement rule (the scaling-book recipe): axes whose collectives
move WEIGHT-sized or activation-sized tensors every step — 'tp'
(all-gather/reduce-scatter of activations), 'sp' (ring permutes of KV
blocks) — must ride ICI inside a slice. Axes whose collectives are small
or infrequent — 'dp' (one gradient psum per step, amortized by local
accumulation), 'pp' (microbatch boundary transfers) — tolerate DCN and go
across slices. `make_hybrid_mesh` encodes this: its `dcn_axes` default is
('dp', 'pp').

All entry points degrade gracefully to single-process: under one host
(the test/CI topology, incl. the virtual 8-CPU-device mesh) they produce
the same meshes/arrays as the flat helpers, so code written against this
module runs unchanged from a laptop to a multi-slice pod.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Axes that must stay on ICI (per-step, tensor-sized collectives).
ICI_AXES = ('tp', 'sp', 'ep')
# Axes that tolerate DCN (small/infrequent collectives).
DCN_AXES = ('dp', 'pp')


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Bring up the JAX distributed runtime for a multi-host job.

    Call once per process before any other JAX API. Arguments default to
    the standard launcher environment (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID; on Cloud TPU the TPU runtime
    autodetects all three). Returns True when a multi-process runtime was
    started, False for the single-process no-op — callers never need to
    branch on topology themselves.
    """
    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    if num_processes is None:
        env = os.environ.get('JAX_NUM_PROCESSES')
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get('JAX_PROCESS_ID')
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes in (None, 1):
        return False          # single process: nothing to initialize
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def slice_topology() -> Tuple[int, int]:
    """(num_slices, devices_per_slice) of the current platform.

    Slices are identified by device.slice_index when the runtime exposes
    it (multi-slice TPU); otherwise every device is one slice — which
    makes single-slice and CPU topologies a 1-slice 'hybrid'.
    """
    devices = jax.devices()
    slice_ids = {getattr(d, 'slice_index', 0) for d in devices}
    n_slices = len(slice_ids)
    return n_slices, len(devices) // max(n_slices, 1)


def make_hybrid_mesh(axes: Sequence[Tuple[str, int]],
                     dcn_axes: Sequence[str] = DCN_AXES) -> Mesh:
    """Build a Mesh whose named axes land on the right link class.

    axes: ordered (name, size) pairs, e.g. [('dp', 4), ('tp', 8)].
    dcn_axes: names allowed to span slices (DCN). Axes NOT listed are
    pinned inside a slice (ICI) — sizes must divide devices_per_slice.

    On a single-slice (or CPU) topology this reduces to a plain
    row-major mesh over jax.devices(), so tests and single-host runs
    exercise the same call. On multi-slice hardware the device grid comes
    from mesh_utils.create_hybrid_device_mesh, which keeps each ICI
    axis's device group inside one slice.
    """
    names = tuple(n for n, _ in axes)
    sizes = tuple(int(s) for _, s in axes)
    total = int(np.prod(sizes))
    devices = jax.devices()
    if total > len(devices):
        raise ValueError(f'mesh {dict(axes)} needs {total} devices, have '
                         f'{len(devices)}')
    for n in names:
        if n in dcn_axes and n in ICI_AXES:
            raise ValueError(f"axis '{n}' carries per-step tensor-sized "
                             f'collectives and must not span DCN')
    n_slices, per_slice = slice_topology()
    if n_slices <= 1:
        arr = np.array(devices[:total]).reshape(sizes)
        return Mesh(arr, axis_names=names)

    from jax.experimental import mesh_utils
    dcn_shape = tuple(s if n in dcn_axes else 1 for n, s in axes)
    ici_shape = tuple(1 if n in dcn_axes else s for n, s in axes)
    n_dcn = int(np.prod(dcn_shape))
    if n_dcn > n_slices:
        raise ValueError(f'DCN axes {dcn_shape} need {n_dcn} slices, '
                         f'topology has {n_slices}')
    if int(np.prod(ici_shape)) > per_slice:
        raise ValueError(f'ICI axes {ici_shape} exceed devices per slice '
                         f'({per_slice})')
    grid = mesh_utils.create_hybrid_device_mesh(
        ici_shape, dcn_shape, devices=devices)
    return Mesh(grid, axis_names=names)


def local_batch_size(global_batch: int, mesh: Mesh,
                     batch_axis: str = 'dp') -> int:
    """Per-PROCESS batch size for a dp-sharded input: each host loads
    only the rows its local devices own."""
    dp = dict(mesh.shape).get(batch_axis, 1)
    if global_batch % dp:
        raise ValueError(f'global batch {global_batch} not divisible by '
                         f'{batch_axis}={dp}')
    n_proc = jax.process_count()
    if dp % n_proc == 0:
        return global_batch // n_proc
    # dp smaller than process count (dp replicated within a process's
    # devices): every process still feeds its device-local rows
    return global_batch // dp * max(1, dp // n_proc)


def host_local_array(local_data: np.ndarray, mesh: Mesh,
                     spec: P) -> jax.Array:
    """Assemble a GLOBAL jax.Array from this process's shard of the data.

    local_data holds only this host's rows (shape = global shape with the
    sharded axes divided by the process span). Single-process: equivalent
    to device_put with the same sharding, so tests cover the call.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_data), sharding)
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(local_data))


def sync_global_devices(tag: str = 'ppq_tpu') -> None:
    """Barrier across all hosts (no-op single-process). Use around
    checkpoint writes so no host reads a half-written directory."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def broadcast_from_host0(tree):
    """Make host-0's pytree the global value on every process (e.g. the
    quantization setting dict or RNG seed picked on one host)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)
