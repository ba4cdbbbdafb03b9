"""Ring (sequence-parallel) attention vs dense reference on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ppq_tpu.serving.ring_attention import (reference_attention,
                                            sequence_parallel_attention)


def make_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ('sp',))


@pytest.mark.parametrize('n_dev,T', [(2, 16), (4, 32), (8, 64)])
def test_ring_matches_dense_causal(n_dev, T):
    if len(jax.devices()) < n_dev:
        pytest.skip('not enough devices')
    rng = np.random.RandomState(0)
    B, H, Dh = 2, 4, 16
    q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
    k = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))

    want = np.asarray(reference_attention(q, k, v, causal=True))
    got = np.asarray(sequence_parallel_attention(
        q, k, v, make_mesh(n_dev), causal=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_matches_dense_full():
    if len(jax.devices()) < 4:
        pytest.skip('not enough devices')
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 32, 2, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 32, 2, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 32, 2, 8).astype(np.float32))
    want = np.asarray(reference_attention(q, k, v, causal=False))
    got = np.asarray(sequence_parallel_attention(
        q, k, v, make_mesh(4), causal=False))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ring_jit_compiles():
    if len(jax.devices()) < 2:
        pytest.skip('not enough devices')
    mesh = make_mesh(2)
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(1, 8, 2, 8).astype(np.float32))

    @jax.jit
    def fn(q):
        return sequence_parallel_attention(q, q, q, mesh)

    out = fn(q)
    assert np.isfinite(np.asarray(out)).all()
