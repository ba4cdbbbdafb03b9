"""Test configuration: force an 8-virtual-device CPU JAX platform so sharding
and mesh logic is testable without real multi-chip TPU hardware.

Note: the host image injects a sitecustomize that pins JAX_PLATFORMS=axon
(the TPU tunnel); plain env vars are therefore not enough — we must override
through jax.config before any backend initializes.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
