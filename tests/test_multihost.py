"""Multi-host (DCN) utilities — exercised on the single-process virtual
8-device CPU mesh (conftest). Every helper is written to degrade to
single-process semantics, so these tests cover the exact call paths a
multi-slice job uses (SURVEY §5 distributed comms; STATUS r2 gap
'multi-host flows only exercised on virtual meshes')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ppq_tpu.parallel import (broadcast_from_host0, host_local_array,
                              initialize_multihost, local_batch_size,
                              make_hybrid_mesh, slice_topology,
                              sync_global_devices)


def test_initialize_multihost_single_process_noop(monkeypatch):
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    monkeypatch.delenv('JAX_NUM_PROCESSES', raising=False)
    assert initialize_multihost() is False


def test_slice_topology_single_slice():
    n_slices, per_slice = slice_topology()
    assert n_slices >= 1
    assert n_slices * per_slice == len(jax.devices())


def test_make_hybrid_mesh_flat_fallback():
    mesh = make_hybrid_mesh([('dp', 2), ('tp', 4)])
    assert dict(mesh.shape) == {'dp': 2, 'tp': 4}
    # all 8 devices used, row-major on a single slice
    assert mesh.devices.size == 8


def test_make_hybrid_mesh_rejects_tensor_axis_on_dcn():
    with pytest.raises(ValueError, match='must not span DCN'):
        make_hybrid_mesh([('tp', 8)], dcn_axes=('tp',))


def test_make_hybrid_mesh_rejects_oversize():
    with pytest.raises(ValueError, match='needs'):
        make_hybrid_mesh([('dp', 64)])


def test_local_batch_size_single_process():
    mesh = make_hybrid_mesh([('dp', 4), ('tp', 2)])
    # one process owns all devices: it feeds the whole global batch
    assert local_batch_size(32, mesh) == 32
    with pytest.raises(ValueError, match='not divisible'):
        local_batch_size(30, mesh)


def test_host_local_array_matches_device_put():
    mesh = make_hybrid_mesh([('dp', 4), ('tp', 2)])
    data = np.arange(64, dtype=np.float32).reshape(8, 8)
    arr = host_local_array(data, mesh, P('dp', None))
    assert arr.sharding.spec == P('dp', None)
    np.testing.assert_array_equal(np.asarray(arr), data)
    # sharded compute over it works end to end
    s = jax.jit(lambda a: a.sum())(arr)
    assert float(s) == data.sum()


def test_sync_and_broadcast_noops_single_process():
    sync_global_devices('test')          # must not raise
    tree = {'seed': 7, 'scales': jnp.ones(3)}
    out = broadcast_from_host0(tree)
    assert out['seed'] == 7
    np.testing.assert_array_equal(np.asarray(out['scales']), np.ones(3))


def test_hybrid_mesh_runs_psum_train_step():
    """A dp×tp hybrid mesh drives a real sharded computation: per-device
    partial sums reduce over 'dp' exactly as a gradient psum would."""
    from ppq_tpu.serving.ring_attention import shard_map
    mesh = make_hybrid_mesh([('dp', 8)])
    x = host_local_array(np.ones((16, 4), np.float32), mesh, P('dp'))

    def local(xl):
        return jax.lax.psum(xl.sum(), 'dp')

    total = shard_map(local, mesh=mesh, in_specs=(P('dp'),),
                      out_specs=P())(x)
    assert float(total) == 64.0
