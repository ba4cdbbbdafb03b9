"""Pipeline-parallel staged forward vs dense sequential reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ppq_tpu.serving.pipeline import pipeline_forward, stack_layer_params


def make_layers(n, d, seed=0):
    rng = np.random.RandomState(seed)
    return [{'w': jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.2),
             'b': jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)}
            for _ in range(n)]


def block_fn(lp, x):
    return jax.nn.gelu(x @ lp['w'] + lp['b'])


def dense_ref(layers, x):
    for lp in layers:
        x = block_fn(lp, x)
    return x


@pytest.mark.parametrize('n_stages,n_layers,micro', [(2, 4, 2), (4, 8, 4),
                                                     (4, 8, 8)])
def test_pipeline_matches_dense(n_stages, n_layers, micro):
    if len(jax.devices()) < n_stages:
        pytest.skip('not enough devices')
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ('pp',))
    layers = make_layers(n_layers, 16)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16).astype(np.float32))

    want = np.asarray(dense_ref(layers, x))
    stacked = stack_layer_params(layers)
    got = np.asarray(pipeline_forward(stacked, x, block_fn, mesh,
                                      microbatches=micro))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pipeline_jits():
    if len(jax.devices()) < 2:
        pytest.skip('not enough devices')
    mesh = Mesh(np.array(jax.devices()[:2]), ('pp',))
    layers = make_layers(4, 8, seed=2)
    stacked = stack_layer_params(layers)
    x = jnp.asarray(np.random.RandomState(2).randn(4, 8).astype(np.float32))

    fn = jax.jit(lambda p, x: pipeline_forward(p, x, block_fn, mesh,
                                               microbatches=2))
    out = fn(stacked, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(dense_ref(layers, x)),
                               rtol=1e-4, atol=1e-5)
