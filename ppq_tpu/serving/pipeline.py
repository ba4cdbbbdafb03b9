"""Pipeline parallelism: GPipe-style staged transformer forward.

New TPU-native capability (no reference analogue): decoder layers partition
into stages over the 'pp' mesh axis; microbatches stream through the ring
with `jax.lax.ppermute` carrying activations stage→stage. Each tick every
stage computes one microbatch (bubbles at fill/drain), so S stages overlap
S microbatches — the standard inference pipeline schedule.

Layer parameters are stacked on a leading layer axis and sharded over 'pp';
inside a stage `lax.scan` walks the local layers. Works with the same
quantized block weights as the serving engine (INT8 per-channel dequant
fused into the matmuls).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .ring_attention import shard_map


def stack_layer_params(layers) -> Dict:
    """[{leaf: array}] per layer → {leaf: (L, ...) stacked}. All layers must
    share a structure (true for the dense decoder)."""
    flat0, treedef = jax.tree.flatten(layers[0])
    stacked = [jnp.stack([jax.tree.flatten(l)[0][i] for l in layers])
               for i in range(len(flat0))]
    return jax.tree.unflatten(treedef, stacked)


def pipeline_forward(stacked_params, x, block_fn: Callable, mesh: Mesh,
                     axis_name: str = 'pp',
                     microbatches: Optional[int] = None) -> jnp.ndarray:
    """Run x through all stacked layers, pipelined over `axis_name`.

    stacked_params: pytree with leading layer axis L (divisible by the stage
    count); x: (B, ...) with B divisible by `microbatches`;
    block_fn(layer_params, x) -> x applies ONE layer.
    """
    S = mesh.shape[axis_name]
    M = microbatches or S
    B = x.shape[0]
    assert B % M == 0, f'batch {B} not divisible by {M} microbatches'
    mb = B // M
    x_mb = x.reshape((M, mb) + x.shape[1:])

    p_spec = jax.tree.map(lambda _: P(axis_name), stacked_params)

    def stage(local_params, x_all):
        # local_params: (L/S, ...) this stage's layers; x_all: (M, mb, ...)
        idx = jax.lax.axis_index(axis_name)
        n = jax.lax.psum(1, axis_name)

        def apply_stage(xin):
            def body(h, lp):
                return block_fn(lp, h), None
            h, _ = jax.lax.scan(body, xin, local_params)
            return h

        buf = jnp.zeros_like(x_all[0])
        out = jnp.zeros_like(x_all)
        perm = [(i, (i + 1) % S) for i in range(S)]

        for t in range(M + S - 1):
            # stage 0 ingests microbatch t; others take the ring payload
            feed = x_all[t] if t < M else jnp.zeros_like(x_all[0])
            xin = jnp.where(jnp.equal(idx, 0), feed, buf)
            y = apply_stage(xin)
            # last stage banks its finished microbatch (t - S + 1)
            done_i = t - S + 1
            if 0 <= done_i < M:
                is_last = jnp.equal(idx, n - 1)
                out = out.at[done_i].set(
                    jnp.where(is_last, y, out[done_i]))
            buf = jax.lax.ppermute(y, axis_name, perm)

        # replicate the last stage's outputs to every device
        is_last = jnp.equal(jax.lax.axis_index(axis_name), n - 1)
        out = jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)), axis_name)
        return out

    fn = shard_map(stage, mesh=mesh,
                   in_specs=(p_spec, P()), out_specs=P())
    out = fn(stacked_params, x_mb)
    return out.reshape((B,) + x.shape[1:])
