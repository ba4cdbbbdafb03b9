"""MoE FFN with expert parallelism: EP-sharded output must match single
device; routing must be top-k sparse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ppq_tpu.serving.moe import init_moe_params, moe_ffn, shard_moe_params


def test_moe_runs_and_is_routed():
    params = init_moe_params(d_model=16, d_ff=32, n_experts=4, top_k=2,
                             weight_bits=16, seed=0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16)
                    .astype(np.float32))
    y = moe_ffn(x, params)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_moe_int8_close_to_fp():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 16)
                    .astype(np.float32))
    fp = moe_ffn(x, init_moe_params(16, 32, 4, 2, weight_bits=16, seed=2))
    q8 = moe_ffn(x, init_moe_params(16, 32, 4, 2, weight_bits=8, seed=2))
    rel = float(jnp.abs(q8 - fp).max() / jnp.abs(fp).max())
    assert rel < 0.1, rel


def test_moe_ep_sharded_matches_single():
    n = min(4, len(jax.devices()))
    if n < 2:
        pytest.skip('needs multiple devices')
    params = init_moe_params(d_model=16, d_ff=32, n_experts=4, top_k=2,
                             weight_bits=8, seed=3)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 16)
                    .astype(np.float32))
    want = np.asarray(moe_ffn(x, params))

    mesh = Mesh(np.array(jax.devices()[:n]), ('ep',))
    sharded = shard_moe_params(params, mesh)
    import functools
    jit_moe = jax.jit(functools.partial(moe_ffn, top_k=2))
    sharded.pop('top_k'); sharded.pop('n_experts')
    got = np.asarray(jit_moe(x, sharded))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_topk_sparsity():
    """Perturbing a non-selected expert must not change the output."""
    params = init_moe_params(d_model=8, d_ff=16, n_experts=4, top_k=1,
                             weight_bits=16, seed=4)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 1, 8)
                    .astype(np.float32))
    y0 = np.asarray(moe_ffn(x, params))
    logits = np.asarray(jnp.einsum(
        'btd,de->bte', x.astype(jnp.float32), params['router']))
    unused = int(np.argmin(logits[0, 0]))
    w = np.array(params['w_down']['w'], copy=True)
    w[unused] = 999.0
    params['w_down']['w'] = jnp.asarray(w)
    y1 = np.asarray(moe_ffn(x, params))
    np.testing.assert_allclose(y1, y0, rtol=1e-5)
