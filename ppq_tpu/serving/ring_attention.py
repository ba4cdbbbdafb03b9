"""Ring attention — sequence/context-parallel attention over a mesh axis.

New TPU-native capability (the reference has no long-context support,
SURVEY.md §5): when a sequence exceeds one chip's HBM, shard it over the
'sp' mesh axis and compute exact causal attention by rotating K/V blocks
around the ring with `jax.lax.ppermute` while accumulating flash-style
online-softmax partials. Each step overlaps a local QK^T/PV block matmul
with the ICI transfer of the next K/V block.

All math runs in fp32 accumulation; K/V blocks may be int8 (quantized KV
cache) with their per-(token, head) scales riding the same ring.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import jax as _jax

if hasattr(_jax, 'shard_map'):           # jax >= 0.8
    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
else:                                     # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_attention_local(q, k, v, *, axis_name: str, scale: float,
                          causal: bool):
    """Body run per-device under shard_map.

    q, k, v: (B, Tc, H, Dh) local sequence chunks. Returns (B, Tc, H, Dh).
    """
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, Tc, H, Dh = q.shape

    qf = jnp.swapaxes(q.astype(jnp.float32), 1, 2)        # (B, H, Tc, Dh)

    m = jnp.full((B, H, Tc, 1), -jnp.inf, jnp.float32)    # running max
    l = jnp.zeros((B, H, Tc, 1), jnp.float32)             # running denom
    o = jnp.zeros((B, H, Tc, Dh), jnp.float32)            # running numer

    q_pos = my_idx * Tc + jnp.arange(Tc)                  # global positions

    def step(carry, step_idx):
        m, l, o, k_blk, v_blk = carry
        # k/v block currently held came from device (my_idx - step) % n
        src = (my_idx - step_idx) % n_dev
        k_pos = src * Tc + jnp.arange(Tc)

        kf = jnp.swapaxes(k_blk.astype(jnp.float32), 1, 2)
        vf = jnp.swapaxes(v_blk.astype(jnp.float32), 1, 2)
        logits = jnp.einsum('bhqd,bhkd->bhqk', qf, kf) * scale
        if causal:
            mask = q_pos[:, None] >= k_pos[None, :]       # (Tc, Tc)
            logits = jnp.where(mask[None, None], logits, -jnp.inf)

        blk_max = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, blk_max)
        # fully-masked blocks produce -inf maxima; guard the exp
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(jnp.where(jnp.isfinite(logits),
                              logits - m_safe, -jnp.inf))
        p = jnp.where(jnp.isfinite(p), p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o * corr + jnp.einsum('bhqk,bhkd->bhqd', p, vf)

        # rotate K/V one step around the ring (device i → i+1)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_new, l_new, o_new, k_next, v_next), None

    (m, l, o, _, _), _ = jax.lax.scan(
        step, (m, l, o, k, v), jnp.arange(n_dev))

    out = o / jnp.maximum(l, 1e-30)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)        # (B, Tc, H, Dh)


def sequence_parallel_attention(q, k, v, mesh: Mesh, axis_name: str = 'sp',
                                scale: Optional[float] = None,
                                causal: bool = True):
    """Exact (ring) attention with the sequence dim sharded over
    `axis_name`. q/k/v: (B, T, H, Dh) global; T must divide by the axis
    size. Returns (B, T, H, Dh) with the same sharding."""
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name,
                          scale=scale, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False)
    return fn(q, k, v)


def reference_attention(q, k, v, scale: Optional[float] = None,
                        causal: bool = True):
    """Dense single-device reference for testing."""
    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    qf = jnp.swapaxes(jnp.asarray(q, jnp.float32), 1, 2)
    kf = jnp.swapaxes(jnp.asarray(k, jnp.float32), 1, 2)
    vf = jnp.swapaxes(jnp.asarray(v, jnp.float32), 1, 2)
    logits = jnp.einsum('bhqd,bhkd->bhqk', qf, kf) * scale
    if causal:
        T = q.shape[1]
        mask = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhqk,bhkd->bhqd', probs, vf)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)
