"""Mixture-of-Experts FFN with expert parallelism.

New TPU-native capability (no reference analogue): a top-k routed MoE FFN
whose experts shard over the 'ep' mesh axis. Design follows the standard
dense-einsum MoE formulation — experts stay as one stacked (E, d, f) tensor
sharded on E, tokens are combined with router weights via einsum, and XLA
lowers the expert-parallel contraction to all-to-all-free psums (each chip
computes its local experts for every token, then psum-combines) — the
throughput-optimal layout when tokens-per-expert is large, and the simplest
correct one.

Expert weights use the same INT8 per-channel weight-only quantization as the
dense path (scales per (expert, out-channel)).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(d_model: int, d_ff: int, n_experts: int, top_k: int = 2,
                    weight_bits: int = 8, seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)

    def stack(i, o):
        w = rng.standard_normal((n_experts, i, o), dtype=np.float32) \
            * np.float32(1.0 / np.sqrt(i))
        if weight_bits >= 16:
            return {'w': jnp.asarray(w, jnp.bfloat16)}
        qmax = (1 << (weight_bits - 1)) - 1
        absmax = np.maximum(np.abs(w).max(axis=1), 1e-8)    # (E, o)
        scale = (absmax / qmax).astype(np.float32)
        q = np.clip(np.round(w / scale[:, None, :]),
                    -qmax - 1, qmax).astype(np.int8)
        return {'w_int': jnp.asarray(q), 'scale': jnp.asarray(scale)}

    return {
        'router': jnp.asarray(
            rng.standard_normal((d_model, n_experts), dtype=np.float32)
            * 0.02),
        'w_gate': stack(d_model, d_ff),
        'w_up': stack(d_model, d_ff),
        'w_down': stack(d_ff, d_model),
        'top_k': top_k,              # python ints — pop before jit tracing
        'n_experts': n_experts,
    }


def shard_moe_params(params: Dict, mesh: Mesh) -> Dict:
    """Place expert stacks with their 'ep' shardings (router replicated)."""
    axis = 'ep' if 'ep' in mesh.axis_names else 'tp'
    exp3 = NamedSharding(mesh, P(axis, None, None))
    exp2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())

    def place(d):
        out = {}
        for k, v in d.items():
            if k in ('w', 'w_int'):
                out[k] = jax.device_put(v, exp3)
            elif k == 'scale':
                out[k] = jax.device_put(v, exp2)
            else:
                out[k] = v
        return out
    return {
        'router': jax.device_put(params['router'], rep),
        'w_gate': place(params['w_gate']),
        'w_up': place(params['w_up']),
        'w_down': place(params['w_down']),
        'top_k': params['top_k'],
        'n_experts': params['n_experts'],
    }


def _deq(wq) -> jnp.ndarray:
    if 'w' in wq:
        return wq['w'].astype(jnp.float32)
    return (wq['w_int'].astype(jnp.float32)
            * wq['scale'][:, None, :].astype(jnp.float32))


def moe_ffn(x: jnp.ndarray, params: Dict,
            top_k: Optional[int] = None) -> jnp.ndarray:
    """x: (B, T, D) → (B, T, D). Dense-einsum top-k MoE. top_k must be a
    static python int (defaults to params['top_k'], which jit callers should
    pass explicitly since traced pytree leaves aren't static)."""
    B, T, D = x.shape
    E = params['router'].shape[-1]
    k = int(top_k if top_k is not None else params['top_k'])
    xf = x.astype(jnp.float32)

    logits = jnp.einsum('btd,de->bte', xf, params['router'])
    gates = jax.nn.softmax(logits, axis=-1)                  # (B, T, E)
    top_w, top_i = jax.lax.top_k(gates, k)                   # (B, T, k)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    # dense combine weights: (B, T, E) with zeros off the top-k
    combine = jnp.zeros_like(gates).at[
        jnp.arange(B)[:, None, None],
        jnp.arange(T)[None, :, None],
        top_i].set(top_w)

    wg, wu, wd = (_deq(params['w_gate']), _deq(params['w_up']),
                  _deq(params['w_down']))
    g = jnp.einsum('btd,edf->betf', xf, wg)
    u = jnp.einsum('btd,edf->betf', xf, wu)
    h = jax.nn.silu(g) * u                                   # (B, E, T, F)
    y = jnp.einsum('betf,efd->betd', h, wd)                  # (B, E, T, D)
    out = jnp.einsum('betd,bte->btd', y, combine)
    return out.astype(x.dtype)
