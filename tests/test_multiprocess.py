"""REAL two-process multi-host flows (STATUS r3 gap: 'multi-host (DCN)
flows still only exercised single-process').

Spawns two separate Python processes that bring up jax.distributed over
localhost (Gloo — the CPU stand-in for DCN), build a hybrid dp x tp mesh
whose 'dp' axis spans the process boundary, assemble global arrays from
per-process shards, and run cross-process collectives. This is the exact
call sequence a multi-slice TPU job runs; only the transport differs.

The workers run OUTSIDE the conftest's in-process JAX (subprocesses with
their own platform setup), so this file needs no jax import itself.
"""
import os
import socket
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_dp_over_dcn():
    # no pytest-timeout in the image: the communicate(timeout=240) below
    # is the hang guard
    port = _free_port()
    env = dict(os.environ)
    env['JAX_COORDINATOR_ADDRESS'] = f'localhost:{port}'
    env['JAX_NUM_PROCESSES'] = '2'
    env.pop('JAX_PROCESS_ID', None)
    worker = os.path.join(_DIR, '_mp_worker.py')
    procs = [subprocess.Popen([sys.executable, worker, str(r)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for r in range(2)]
    outs = []
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f'rank {r} failed:\n{out}'
    for r in range(2):
        assert f'MPOK {r}' in outs[r], outs[r]
