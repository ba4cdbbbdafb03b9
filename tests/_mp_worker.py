"""Worker for the REAL two-process multi-host test (test_multiprocess.py
spawns two of these). Exercises the ppq_tpu.parallel.multihost helpers in
an actual jax.distributed runtime (Gloo over localhost — the same code
path a multi-slice DCN job takes), not the single-process degradation.

Run: python _mp_worker.py <process_id>  with JAX_COORDINATOR_ADDRESS and
JAX_NUM_PROCESSES in the environment.
"""
import os
import sys

# 4 virtual CPU devices per process BEFORE jax import; the host image's
# sitecustomize pins JAX_PLATFORMS=axon, so override through jax.config
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PROCESS_ID'] = sys.argv[1]

import jax                                                    # noqa: E402

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np                                            # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P    # noqa: E402

from ppq_tpu.parallel import (broadcast_from_host0, host_local_array,
                              initialize_multihost, local_batch_size,
                              make_hybrid_mesh,
                              sync_global_devices)            # noqa: E402

rank = int(sys.argv[1])

# 1. bring up the distributed runtime from launcher env vars
assert initialize_multihost() is True, 'expected multi-process init'
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 8

# 2. hybrid mesh: dp spans the process (DCN-class) boundary, tp stays
# within each process's devices
mesh = make_hybrid_mesh([('dp', 2), ('tp', 4)])
assert dict(mesh.shape) == {'dp': 2, 'tp': 4}

# 3. per-process input assembly: each host contributes ITS dp row
assert local_batch_size(8, mesh) == 4
local = np.full((4, 16), float(rank + 1), np.float32)
xg = host_local_array(local, mesh, P('dp'))
assert xg.shape == (8, 16)

# 4. a cross-process collective: global sum must see BOTH hosts' data
total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, P()))(xg)
expect = (1.0 + 2.0) * 4 * 16
assert float(total) == expect, (float(total), expect)

# 5. a dp-psum "gradient" step over the mesh (the train-step collective)
w = jax.device_put(jnp.ones((16,)), NamedSharding(mesh, P()))
g = jax.jit(lambda x, ww: jax.grad(
    lambda w_: jnp.mean((x @ w_) ** 2))(ww),
    out_shardings=NamedSharding(mesh, P()))(xg, w)
assert g.shape == (16,) and bool(jnp.all(jnp.isfinite(g)))

# 6. host-0 value wins on every process
seed = broadcast_from_host0(np.int64(1234 if rank == 0 else 999))
assert int(seed) == 1234, int(seed)

# 7. barrier (checkpoint-write fence)
sync_global_devices('test_ckpt')

print(f'MPOK {rank}', flush=True)
