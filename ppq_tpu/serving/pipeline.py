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


# ===================================================== cache-ful serving PP =

def forward_staged(params: Dict, cache: Dict, tokens, positions, write_pos,
                   seq_lens, cfg, mesh: Mesh, axis_name: str = 'pp',
                   microbatches: Optional[int] = None, active=None):
    """Pipeline-parallel serving forward: decoder layers (with their KV
    cache slabs) partition into stages over `axis_name`; microbatches of
    the batch stream through the stage ring, activations carried by
    ppermute. Embedding / final norm / lm_head are replicated (tiny).

    Drop-in alternative to model.forward for a ServingEngine built on a
    'pp' mesh — same signature semantics, same int8 cache math (reuses
    model.decoder_layer per layer).

    params['layers'] must be a STACKED pytree (leading layer axis L,
    stack_layer_params); cache arrays are the usual (L, B, S, ...) slabs
    sharded over `axis_name` on L.
    """
    from .model import decoder_layer, rms_norm, qmatmul

    B, T = tokens.shape
    S_ctx = cache['k'].shape[2]
    n_stage = mesh.shape[axis_name]
    M = microbatches or n_stage
    assert B % M == 0, f'batch {B} not divisible by {M} microbatches'
    mb = B // M

    x = params['embed'][tokens]                              # (B, T, D)
    slot_ids = jnp.arange(S_ctx)[None, None, None, None, :]
    tok_pos = positions[:, None, None, :, None]
    causal = slot_ids <= tok_pos                             # (B,1,1,T,S)
    if active is None:
        active_all = jnp.ones((B,), bool)
    else:
        active_all = active

    x_mb = x.reshape((M, mb) + x.shape[1:])
    layers = params['layers']
    p_spec = jax.tree.map(lambda _: P(axis_name), layers)
    c_spec = jax.tree.map(lambda _: P(axis_name), cache)

    def stage(local_layers, local_cache, x_all, positions, write_pos,
              causal, active_all):
        idx = jax.lax.axis_index(axis_name)
        n = jax.lax.psum(1, axis_name)
        L_local = jax.tree.leaves(local_layers)[0].shape[0]
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

        def run_stage(xin, caches, tick):
            # microbatch handled by this stage at this tick
            mb_idx = jnp.clip(tick - idx, 0, M - 1)
            valid = jnp.logical_and(tick - idx >= 0, tick - idx < M)
            row0 = mb_idx * mb

            def rows(a):
                return jax.lax.dynamic_slice_in_dim(a, row0, mb, 0)

            pos = rows(positions)
            wp = rows(write_pos)
            cz = rows(causal)
            act = jnp.logical_and(rows(active_all), valid)
            h = xin
            new_caches = caches
            for li in range(L_local):
                layer = jax.tree.map(lambda a: a[li], local_layers)
                ck = rows(new_caches['k'][li])
                cv = rows(new_caches['v'][li])
                cks = (rows(new_caches['k_scale'][li])
                       if 'k_scale' in new_caches else None)
                cvs = (rows(new_caches['v_scale'][li])
                       if 'v_scale' in new_caches else None)
                h, ck, cv, cks, cvs = decoder_layer(
                    layer, ck, cv, cks, cvs, h, pos, wp, cfg, cz,
                    active=act)

                def put(dst, new):
                    return jax.lax.dynamic_update_slice(
                        dst, new.astype(dst.dtype)[None],
                        (li, row0) + (0,) * (dst.ndim - 2))
                new_caches = dict(new_caches)
                new_caches['k'] = put(new_caches['k'], ck)
                new_caches['v'] = put(new_caches['v'], cv)
                if cks is not None:
                    new_caches['k_scale'] = put(new_caches['k_scale'], cks)
                    new_caches['v_scale'] = put(new_caches['v_scale'], cvs)
            return h, new_caches

        buf = jnp.zeros_like(x_all[0])
        out = jnp.zeros_like(x_all)
        caches = local_cache
        for t in range(M + n_stage - 1):
            feed = x_all[t] if t < M else jnp.zeros_like(x_all[0])
            xin = jnp.where(jnp.equal(idx, 0), feed, buf)
            y, caches = run_stage(xin, caches, t)
            done_i = t - n_stage + 1
            if 0 <= done_i < M:
                is_last = jnp.equal(idx, n - 1)
                out = out.at[done_i].set(jnp.where(is_last, y, out[done_i]))
            buf = jax.lax.ppermute(y, axis_name, perm)

        is_last = jnp.equal(jax.lax.axis_index(axis_name), n - 1)
        out = jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)), axis_name)
        return out, caches

    fn = shard_map(stage, mesh=mesh,
                   in_specs=(p_spec, c_spec, P(), P(), P(), P(), P()),
                   out_specs=(P(), c_spec))
    out, new_cache = fn(layers, cache, x_mb, positions, write_pos,
                        causal, active_all)
    x = out.reshape((B, T) + out.shape[3:])

    x = rms_norm(x, params['final_norm'], cfg.rms_eps)
    logits = qmatmul(x, params['lm_head'])
    return logits.astype(jnp.float32), new_cache
