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


# ================================================== frozen-cache PP burst ==

def burst_forward_staged(params: Dict, cache: Dict, tokens, seq_lens, keys,
                         cfg, mesh: Mesh, axis_name: str = 'pp',
                         select_fn=None,
                         microbatches: Optional[int] = None):
    """n decode steps on a 'pp' mesh with each stage's cache slabs FROZEN:
    the scan carries only per-stage in-burst K/V buffers (B, n, KV, Dh)
    per local layer, merged into the big slabs once at burst end — the
    cache-carry variant copies every stage's slabs on every scan step
    because XLA cannot alias them through the staged-update chain.

    Per scan step each stage runs its microbatch ring exactly like
    forward_staged (ppermute-carried activations, fill/drain bubbles);
    attention joins the frozen slab read with the in-burst buffer in one
    softmax (same joint math as model.burst_forward's dense path, so this
    is bit-compatible with scanned staged decode up to fp reassociation).

    tokens: (B,); seq_lens: (B,); keys: (n, 2). Returns (toks (n, B),
    updated cache).
    """
    from .model import _kv_quant, mlp, qmatmul, rms_norm, rope

    B = tokens.shape[0]
    n = keys.shape[0]
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    S_ctx = cache['k'].shape[2]
    n_stage = mesh.shape[axis_name]
    M = microbatches or n_stage
    assert B % M == 0
    mb = B // M
    int8_cache = cfg.kv_cache_bits == 8
    buf_dtype = jnp.int8 if int8_cache else jnp.bfloat16
    pall = False        # pallas kernels are not GSPMD-partitionable

    layers = params['layers']
    p_spec = jax.tree.map(lambda _: P(axis_name), layers)
    c_spec = jax.tree.map(lambda _: P(axis_name), cache)

    def stage(local_layers, local_cache, tokens0, seq_lens, keys, embed,
              final_norm, lm_head):
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.psum(1, axis_name)
        L_local = jax.tree.leaves(local_layers)[0].shape[0]
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
        slot_ids = jnp.arange(S_ctx)[None, None, None, :]
        frozen_mask = slot_ids < seq_lens[:, None, None, None]  # (B,1,1,S)
        buf_ids = jnp.arange(n)[None, None, None, :]

        kbuf0 = jnp.zeros((L_local, B, n, KV, Dh), buf_dtype)
        vbuf0 = jnp.zeros((L_local, B, n, KV, Dh), buf_dtype)
        ksb0 = jnp.zeros((L_local, B, n, KV), jnp.float32)
        vsb0 = jnp.zeros((L_local, B, n, KV), jnp.float32)

        def layer_apply(li, h, bufs, pos, rows, step_i, valid):
            """One local layer on a (mb, 1, D) microbatch h; bufs updated
            at buffer column step_i for batch rows rows..rows+mb. `valid`
            gates the buffer writes: fill/drain ticks run with a CLAMPED
            microbatch index and must not overwrite real entries."""
            kbuf, vbuf, ksb, vsb = bufs
            layer = jax.tree.map(lambda a: a[li], local_layers)
            hh = rms_norm(h, layer['attn_norm'], cfg.rms_eps)
            q = qmatmul(hh, layer['wq'], pallas=pall).reshape(mb, 1, H, Dh)
            k = qmatmul(hh, layer['wk'], pallas=pall).reshape(mb, 1, KV, Dh)
            v = qmatmul(hh, layer['wv'], pallas=pall).reshape(mb, 1, KV, Dh)
            q = rope(q, pos[:, None], cfg.rope_theta)
            k = rope(k, pos[:, None], cfg.rope_theta)

            def masked_dus(buf, val, idx):
                cur = jax.lax.dynamic_slice(buf, idx, val.shape)
                return jax.lax.dynamic_update_slice(
                    buf, jnp.where(valid, val, cur), idx)

            if int8_cache:
                k_q, k_s = _kv_quant(k)
                v_q, v_s = _kv_quant(v)
                ksb = masked_dus(ksb, k_s[None], (li, rows, step_i, 0))
                vsb = masked_dus(vsb, v_s[None], (li, rows, step_i, 0))
            else:
                k_q, v_q = k.astype(buf_dtype), v.astype(buf_dtype)
            kbuf = masked_dus(kbuf, k_q[None], (li, rows, step_i, 0, 0))
            vbuf = masked_dus(vbuf, v_q[None], (li, rows, step_i, 0, 0))

            def rows_of(a):
                return jax.lax.dynamic_slice_in_dim(a, rows, mb, 0)

            ck = rows_of(local_cache['k'][li])
            cv = rows_of(local_cache['v'][li])
            kb = rows_of(kbuf[li])
            vb = rows_of(vbuf[li])
            q_g = q.reshape(mb, 1, KV, rep, Dh).astype(jnp.bfloat16)
            lf = jnp.einsum('btkrd,bskd->bkrts', q_g,
                            ck.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)[:, :, :, 0]
            lb = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                            kb.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)[:, :, :, 0]
            if int8_cache:
                cks = rows_of(local_cache['k_scale'][li])
                lf = lf * cks.transpose(0, 2, 1)[:, :, None, :]
                lb = lb * rows_of(ksb[li]).transpose(0, 2, 1)[:, :, None, :]
            fm = jax.lax.dynamic_slice_in_dim(frozen_mask, rows, mb, 0)
            lf = jnp.where(fm, lf / np.sqrt(Dh), -1e30)
            lb = jnp.where(buf_ids <= step_i, lb / np.sqrt(Dh), -1e30)
            probs = jax.nn.softmax(jnp.concatenate([lf, lb], -1), axis=-1)
            pf, pb = probs[..., :S_ctx], probs[..., S_ctx:]
            if int8_cache:
                cvs = rows_of(local_cache['v_scale'][li])
                pf = pf * cvs.transpose(0, 2, 1)[:, :, None, :]
                pb = pb * rows_of(vsb[li]).transpose(0, 2, 1)[:, :, None, :]
            ctx = jnp.einsum('bkrs,bskd->bkrd', pf.astype(jnp.bfloat16),
                             cv.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            ctx = ctx + jnp.einsum('bkrj,bjkd->bkrd', pb.astype(jnp.bfloat16),
                                   vb.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
            ctx = ctx.reshape(mb, 1, H * Dh).astype(h.dtype)
            h = h + qmatmul(ctx, layer['wo'], pallas=pall)
            hh = rms_norm(h, layer['mlp_norm'], cfg.rms_eps)
            h = h + mlp(hh, layer, cfg)
            return h, (kbuf, vbuf, ksb, vsb)

        def one_step(carry, key):
            cur_tok, bufs, step_i = carry
            pos_all = seq_lens + step_i                      # (B,)
            x_all = embed[cur_tok][:, None, :]               # (B, 1, D)
            x_mb = x_all.reshape(M, mb, 1, -1)
            buf = jnp.zeros_like(x_mb[0])
            out = jnp.zeros_like(x_mb)
            for t in range(M + n_stage - 1):
                mb_idx = jnp.clip(t - idx, 0, M - 1)
                valid = jnp.logical_and(t - idx >= 0, t - idx < M)
                rows = mb_idx * mb
                feed = x_mb[t] if t < M else jnp.zeros_like(x_mb[0])
                h = jnp.where(jnp.equal(idx, 0), feed, buf)
                pos = jax.lax.dynamic_slice_in_dim(pos_all, rows, mb, 0)
                for li in range(L_local):
                    h, bufs = layer_apply(li, h, bufs, pos, rows, step_i,
                                          valid)
                done_i = t - n_stage + 1
                if 0 <= done_i < M:
                    is_last = jnp.equal(idx, n_dev - 1)
                    out = out.at[done_i].set(
                        jnp.where(is_last, h, out[done_i]))
                buf = jax.lax.ppermute(h, axis_name, perm)
            is_last = jnp.equal(idx, n_dev - 1)
            out = jax.lax.psum(
                jnp.where(is_last, out, jnp.zeros_like(out)), axis_name)
            x = out.reshape(B, 1, -1)
            x = rms_norm(x, final_norm, cfg.rms_eps)
            logits = qmatmul(x, lm_head, pallas=pall).astype(jnp.float32)
            nxt = select_fn(logits[:, 0, :], key)
            return (nxt, bufs, step_i + 1), nxt

        (_, bufs, _), toks = jax.lax.scan(
            one_step, (tokens0, (kbuf0, vbuf0, ksb0, vsb0), jnp.int32(0)),
            keys)
        kbuf, vbuf, ksb, vsb = bufs

        # merge: one window write per local layer into the frozen slabs
        from .model import _window_write
        new_cache = dict(local_cache)
        ck_all, cv_all = local_cache['k'], local_cache['v']
        ks_all = local_cache.get('k_scale')
        vs_all = local_cache.get('v_scale')
        for li in range(L_local):
            ck_all = jax.lax.dynamic_update_index_in_dim(
                ck_all, _window_write(ck_all[li], kbuf[li], seq_lens, None),
                li, 0)
            cv_all = jax.lax.dynamic_update_index_in_dim(
                cv_all, _window_write(cv_all[li], vbuf[li], seq_lens, None),
                li, 0)
            if int8_cache:
                ks_all = jax.lax.dynamic_update_index_in_dim(
                    ks_all, _window_write(ks_all[li], ksb[li], seq_lens,
                                          None), li, 0)
                vs_all = jax.lax.dynamic_update_index_in_dim(
                    vs_all, _window_write(vs_all[li], vsb[li], seq_lens,
                                          None), li, 0)
        new_cache['k'] = ck_all
        new_cache['v'] = cv_all
        if int8_cache:
            new_cache['k_scale'] = ks_all
            new_cache['v_scale'] = vs_all
        return toks, new_cache

    fn = shard_map(stage, mesh=mesh,
                   in_specs=(p_spec, c_spec, P(), P(), P(), P(), P(),
                             jax.tree.map(lambda _: P(),
                                          params['lm_head'])),
                   out_specs=(P(), c_spec))
    return fn(layers, cache, tokens, seq_lens, keys, params['embed'],
              params['final_norm'], params['lm_head'])


# ======================================================= paged KV + PP =====
# The block pools carry a leading layer axis (L, NB, 2, BLK, KV*Dh), so a
# 'pp' mesh shards them exactly like the dense slabs: P('pp') on dim 0.
# Each stage owns its local layers' pool rows; block tables / seq_lens are
# replicated (tiny). Reads go through paged_decode_xla (GSPMD-free inside
# shard_map — each stage gathers from its LOCAL slab), writes are one
# scatter per pool array per stage at burst/prefill end.
#
# sp x pp composition: the pools additionally shard their BLOCK axis over
# 'sp' — P('pp', 'sp') — so per-chip pool memory is NB / (n_pp * n_sp).
# Activations ride the 'pp' ring exactly as before (replicated over 'sp');
# the three pool-touching ops localize block rows per sp shard the same
# way the flat sp paths do (paged.py):
#   * frozen decode reads: each (stage, sp) device computes the flash
#     triple over ITS blocks (out-of-shard table entries masked) and the
#     triples merge over 'sp' with the exact pmax/psum flash-decoding
#     combine BEFORE joining the in-burst buffer;
#   * writes: the same scatter with sp-localized rows, out-of-shard
#     updates dropped (each block lives on exactly one sp shard);
#   * chunked-prefill prefix gathers: each sp shard contributes its
#     blocks zero-filled elsewhere; a psum over 'sp' rebuilds the dense
#     prefix.


def _sp_axis(mesh) -> int:
    """Size of the optional 'sp' axis the paged pools' block dim shards
    over (sp x pp composition; 1 = pools replicated over no sp axis)."""
    return dict(mesh.shape).get('sp', 1)


def _sp_block_offset(nb_local):
    """This sp shard's first global pool row (block axis sharded 'sp')."""
    return jax.lax.axis_index('sp') * nb_local


def _sp_merge_triple(acc, m, l):
    """Exact flash-decoding combine of per-sp-shard partial-softmax
    triples (disjoint key sets): same math as paged.paged_decode_sp."""
    m_g = jax.lax.pmax(m, 'sp')
    w = jnp.exp(m - m_g)
    return jax.lax.psum(acc * w[..., None], 'sp'), m_g, jax.lax.psum(w * l,
                                                                     'sp')

def prefill_staged_paged(params: Dict, pools: Dict, tokens, lengths, tables,
                         active, cfg, mesh: Mesh, axis_name: str = 'pp',
                         microbatches: Optional[int] = None):
    """Pipeline-parallel twin of paged.prefill_paged: prompts start at
    position 0, attention is causal within the (B, T) window itself (the
    pool is written, never read), so each stage only needs its activations
    from the ring and scatters its local layers' K/V at the end.
    Returns (logits (B, T, V) f32, pools)."""
    from .model import (_kv_quant, mlp, qmatmul, rms_norm, rope_apply,
                        rope_tables)
    from .paged import scatter_kv_all

    B, T = tokens.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    int8_cache = cfg.kv_cache_bits == 8
    n_stage = mesh.shape[axis_name]
    M = microbatches or n_stage
    assert B % M == 0
    mb = B // M
    pool_dt = pools['kv'].dtype

    x = params['embed'][tokens]                              # (B, T, D)
    x_mb = x.reshape((M, mb) + x.shape[1:])
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                 (B, T))
    causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])   # (T, T)
    layers = params['layers']
    n_sp = _sp_axis(mesh)
    p_spec = jax.tree.map(lambda _: P(axis_name), layers)
    pool_spec = jax.tree.map(
        lambda _: P(axis_name, 'sp') if n_sp > 1 else P(axis_name), pools)

    def stage(local_layers, local_pools, x_all, tables, active_all):
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.psum(1, axis_name)
        L_local = jax.tree.leaves(local_layers)[0].shape[0]
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
        r_cos, r_sin = rope_tables(positions, cfg.rope_theta, Dh)

        kcol = jnp.zeros((L_local, B, T, KV, Dh), pool_dt)
        vcol = jnp.zeros((L_local, B, T, KV, Dh), pool_dt)
        kscol = jnp.zeros((L_local, B, T, KV), jnp.float32)
        vscol = jnp.zeros((L_local, B, T, KV), jnp.float32)

        def run_stage(xin, cols, tick):
            kcol, vcol, kscol, vscol = cols
            mb_idx = jnp.clip(tick - idx, 0, M - 1)
            valid = jnp.logical_and(tick - idx >= 0, tick - idx < M)
            row0 = mb_idx * mb

            def rows(a):
                return jax.lax.dynamic_slice_in_dim(a, row0, mb, 0)

            h = xin
            rc, rs = rows(r_cos), rows(r_sin)
            for li in range(L_local):
                layer = jax.tree.map(lambda a: a[li], local_layers)
                hh = rms_norm(h, layer['attn_norm'], cfg.rms_eps)
                q = qmatmul(hh, layer['wq']).reshape(mb, T, H, Dh)
                k = qmatmul(hh, layer['wk']).reshape(mb, T, KV, Dh)
                v = qmatmul(hh, layer['wv']).reshape(mb, T, KV, Dh)
                q = rope_apply(q, rc, rs)
                k = rope_apply(k, rc, rs)
                if int8_cache:
                    k_q, k_s = _kv_quant(k)
                    v_q, v_s = _kv_quant(v)
                else:
                    k_q, v_q = k.astype(pool_dt), v.astype(pool_dt)
                    k_s = v_s = None

                def masked_dus(buf, val, idx4):
                    cur = jax.lax.dynamic_slice(buf, idx4, val.shape)
                    return jax.lax.dynamic_update_slice(
                        buf, jnp.where(valid, val, cur), idx4)

                kcol = masked_dus(kcol, k_q[None], (li, row0, 0, 0, 0))
                vcol = masked_dus(vcol, v_q[None], (li, row0, 0, 0, 0))
                if int8_cache:
                    kscol = masked_dus(kscol, k_s[None], (li, row0, 0, 0))
                    vscol = masked_dus(vscol, v_s[None], (li, row0, 0, 0))
                # window attention (same quantized math as the pool read)
                q_g = q.reshape(mb, T, KV, rep, Dh).astype(jnp.bfloat16)
                s = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                               k_q.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                if int8_cache:
                    s = s * k_s.transpose(0, 2, 1)[:, :, None, None, :]
                s = jnp.where(causal[None, None, None],
                              s / np.sqrt(Dh), -1e30)
                p = jax.nn.softmax(s, axis=-1)
                if int8_cache:
                    p = p * v_s.transpose(0, 2, 1)[:, :, None, None, :]
                ctx = jnp.einsum('bkrtj,bjkd->btkrd',
                                 p.astype(jnp.bfloat16),
                                 v_q.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                ctx = ctx.reshape(mb, T, H * Dh).astype(h.dtype)
                h = h + qmatmul(ctx, layer['wo'])
                hh = rms_norm(h, layer['mlp_norm'], cfg.rms_eps)
                h = h + mlp(hh, layer, cfg)
            return h, (kcol, vcol, kscol, vscol)

        buf = jnp.zeros_like(x_all[0])
        out = jnp.zeros_like(x_all)
        cols = (kcol, vcol, kscol, vscol)
        for t in range(M + n_stage - 1):
            feed = x_all[t] if t < M else jnp.zeros_like(x_all[0])
            xin = jnp.where(jnp.equal(idx, 0), feed, buf)
            y, cols = run_stage(xin, cols, t)
            done_i = t - n_stage + 1
            if 0 <= done_i < M:
                is_last = jnp.equal(idx, n_dev - 1)
                out = out.at[done_i].set(jnp.where(is_last, y, out[done_i]))
            buf = jax.lax.ppermute(y, axis_name, perm)
        is_last = jnp.equal(idx, n_dev - 1)
        out = jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)), axis_name)

        kcol, vcol, kscol, vscol = cols
        write_pos = jnp.zeros((B,), jnp.int32)
        new_pools = scatter_kv_all(
            local_pools, kcol, vcol,
            kscol if int8_cache else None,
            vscol if int8_cache else None,
            tables, write_pos, active_all,
            blk_offset=(_sp_block_offset(local_pools['kv'].shape[1])
                        if n_sp > 1 else None))
        return out, new_pools

    fn = shard_map(stage, mesh=mesh,
                   in_specs=(p_spec, pool_spec, P(), P(), P()),
                   out_specs=(P(), pool_spec))
    if active is None:
        active = jnp.ones((B,), bool)
    out, pools = fn(layers, pools, x_mb, jnp.asarray(tables, jnp.int32),
                    active)
    from .model import qmatmul, rms_norm
    x = out.reshape((B, T) + out.shape[3:])
    x = rms_norm(x, params['final_norm'], cfg.rms_eps)
    logits = qmatmul(x, params['lm_head'])
    return logits.astype(jnp.float32), pools


def burst_forward_staged_paged(params: Dict, pools: Dict, tokens, seq_lens,
                               tables, keys, cfg, mesh: Mesh,
                               axis_name: str = 'pp', select_fn=None,
                               microbatches: Optional[int] = None):
    """Pipeline-parallel paged decode burst: per-stage pool slabs frozen
    through the scan, in-burst K/V in small per-stage buffers (merged by
    one scatter per pool array per stage at burst end). The frozen read is
    paged_decode_xla over each stage's LOCAL (L/S * NB) pool view with
    layer-offset tables; its unnormalized flash triple merges exactly with
    the in-burst buffer columns (same partial-softmax math as
    paged.burst_forward_paged).

    tokens/seq_lens: (B,); tables: (B, MB); keys: (n, 2).
    Returns (toks (n, B), pools)."""
    from .model import _kv_quant, mlp, qmatmul, rms_norm, rope
    from .paged import paged_decode_xla, scatter_kv_all
    from ..kernels.paged_attention import merge_attention

    B = tokens.shape[0]
    n = keys.shape[0]
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    int8_cache = cfg.kv_cache_bits == 8
    buf_dtype = jnp.int8 if int8_cache else jnp.bfloat16
    n_stage = mesh.shape[axis_name]
    M = microbatches or n_stage
    assert B % M == 0
    mb = B // M

    layers = params['layers']
    n_sp = _sp_axis(mesh)
    p_spec = jax.tree.map(lambda _: P(axis_name), layers)
    pool_spec = jax.tree.map(
        lambda _: P(axis_name, 'sp') if n_sp > 1 else P(axis_name), pools)

    def stage(local_layers, local_pools, tokens0, seq_lens, tables, keys,
              embed, final_norm, lm_head):
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.psum(1, axis_name)
        L_local = jax.tree.leaves(local_layers)[0].shape[0]
        NB = local_pools['kv'].shape[1]
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
        buf_ids = jnp.arange(n)[None, None, None, :]

        kv_flat = local_pools['kv'].reshape(
            (L_local * NB,) + local_pools['kv'].shape[2:])
        sc_flat = None
        if int8_cache:
            sp_ = local_pools['kv_scale']
            sc_flat = sp_.reshape((L_local * NB,) + sp_.shape[2:])

        kbuf0 = jnp.zeros((L_local, B, n, KV, Dh), buf_dtype)
        vbuf0 = jnp.zeros((L_local, B, n, KV, Dh), buf_dtype)
        ksb0 = jnp.zeros((L_local, B, n, KV), jnp.float32)
        vsb0 = jnp.zeros((L_local, B, n, KV), jnp.float32)

        def layer_apply(li, h, bufs, pos, rows, step_i, valid):
            kbuf, vbuf, ksb, vsb = bufs
            layer = jax.tree.map(lambda a: a[li], local_layers)
            hh = rms_norm(h, layer['attn_norm'], cfg.rms_eps)
            q = qmatmul(hh, layer['wq']).reshape(mb, 1, H, Dh)
            k = qmatmul(hh, layer['wk']).reshape(mb, 1, KV, Dh)
            v = qmatmul(hh, layer['wv']).reshape(mb, 1, KV, Dh)
            q = rope(q, pos[:, None], cfg.rope_theta)
            k = rope(k, pos[:, None], cfg.rope_theta)

            def masked_dus(buf, val, idxs):
                cur = jax.lax.dynamic_slice(buf, idxs, val.shape)
                return jax.lax.dynamic_update_slice(
                    buf, jnp.where(valid, val, cur), idxs)

            if int8_cache:
                k_q, k_s = _kv_quant(k)
                v_q, v_s = _kv_quant(v)
                ksb = masked_dus(ksb, k_s[None], (li, rows, step_i, 0))
                vsb = masked_dus(vsb, v_s[None], (li, rows, step_i, 0))
            else:
                k_q, v_q = k.astype(buf_dtype), v.astype(buf_dtype)
            kbuf = masked_dus(kbuf, k_q[None], (li, rows, step_i, 0, 0))
            vbuf = masked_dus(vbuf, v_q[None], (li, rows, step_i, 0, 0))

            def rows_of(a):
                return jax.lax.dynamic_slice_in_dim(a, rows, mb, 0)

            q_g = q.reshape(mb, 1, KV, rep, Dh).astype(jnp.bfloat16)
            # frozen pool part: gather this layer's blocks from the LOCAL
            # flattened pool (layer-offset tables); on an sp x pp mesh
            # each sp shard reads only ITS blocks (out-of-shard entries
            # masked) and the partial triples flash-merge over 'sp'
            if n_sp > 1:
                loc = rows_of(tables) - _sp_block_offset(NB)
                inb = (loc >= 0) & (loc < NB)
                loc = jnp.where(inb, loc, 0)
                acc_f, m_f, l_f = paged_decode_xla(
                    q_g[:, 0], kv_flat, sc_flat, loc + li * NB,
                    rows_of(seq_lens), entry_mask=inb)
                acc_f, m_f, l_f = _sp_merge_triple(acc_f, m_f, l_f)
            else:
                acc_f, m_f, l_f = paged_decode_xla(
                    q_g[:, 0], kv_flat, sc_flat,
                    rows_of(tables) + li * NB, rows_of(seq_lens))
            # in-burst buffer part (current column already written)
            kb = rows_of(kbuf[li])
            vb = rows_of(vbuf[li])
            lb = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                            kb.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)[:, :, :, 0]
            if int8_cache:
                lb = lb * rows_of(ksb[li]).transpose(0, 2, 1)[:, :, None, :]
            lb = jnp.where(buf_ids <= step_i, lb / np.sqrt(Dh), -1e30)
            m_b = jnp.max(lb, axis=-1)
            p_b = jnp.exp(lb - m_b[..., None])
            l_b = jnp.sum(p_b, axis=-1)
            if int8_cache:
                p_b = p_b * rows_of(vsb[li]).transpose(0, 2, 1)[:, :, None, :]
            acc_b = jnp.einsum('bkrj,bjkd->bkrd', p_b.astype(jnp.bfloat16),
                               vb.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
            ctx = merge_attention([(acc_f, m_f, l_f), (acc_b, m_b, l_b)])
            ctx = ctx.reshape(mb, 1, H * Dh).astype(h.dtype)
            h = h + qmatmul(ctx, layer['wo'])
            hh = rms_norm(h, layer['mlp_norm'], cfg.rms_eps)
            h = h + mlp(hh, layer, cfg)
            return h, (kbuf, vbuf, ksb, vsb)

        def one_step(carry, key):
            cur_tok, bufs, step_i = carry
            pos_all = seq_lens + step_i
            x_all = embed[cur_tok][:, None, :]
            x_mb = x_all.reshape(M, mb, 1, -1)
            buf = jnp.zeros_like(x_mb[0])
            out = jnp.zeros_like(x_mb)
            for t in range(M + n_stage - 1):
                mb_idx = jnp.clip(t - idx, 0, M - 1)
                valid = jnp.logical_and(t - idx >= 0, t - idx < M)
                rows = mb_idx * mb
                feed = x_mb[t] if t < M else jnp.zeros_like(x_mb[0])
                h = jnp.where(jnp.equal(idx, 0), feed, buf)
                pos = jax.lax.dynamic_slice_in_dim(pos_all, rows, mb, 0)
                for li in range(L_local):
                    h, bufs = layer_apply(li, h, bufs, pos, rows, step_i,
                                          valid)
                done_i = t - n_stage + 1
                if 0 <= done_i < M:
                    is_last = jnp.equal(idx, n_dev - 1)
                    out = out.at[done_i].set(
                        jnp.where(is_last, h, out[done_i]))
                buf = jax.lax.ppermute(h, axis_name, perm)
            is_last = jnp.equal(idx, n_dev - 1)
            out = jax.lax.psum(
                jnp.where(is_last, out, jnp.zeros_like(out)), axis_name)
            x = out.reshape(B, 1, -1)
            x = rms_norm(x, final_norm, cfg.rms_eps)
            logits = qmatmul(x, lm_head).astype(jnp.float32)
            nxt = select_fn(logits[:, 0, :], key)
            return (nxt, bufs, step_i + 1), nxt

        (_, bufs, _), toks = jax.lax.scan(
            one_step, (tokens0, (kbuf0, vbuf0, ksb0, vsb0), jnp.int32(0)),
            keys)
        kbuf, vbuf, ksb, vsb = bufs
        new_pools = scatter_kv_all(
            local_pools, kbuf, vbuf,
            ksb if int8_cache else None,
            vsb if int8_cache else None,
            tables, seq_lens, None,
            blk_offset=(_sp_block_offset(NB) if n_sp > 1 else None))
        return toks, new_pools

    fn = shard_map(stage, mesh=mesh,
                   in_specs=(p_spec, pool_spec, P(), P(), P(), P(), P(),
                             P(), jax.tree.map(lambda _: P(),
                                               params['lm_head'])),
                   out_specs=(P(), pool_spec))
    return fn(layers, pools, tokens, seq_lens,
              jnp.asarray(tables, jnp.int32), keys, params['embed'],
              params['final_norm'], params['lm_head'])


def prefill_chunk_staged_paged(params: Dict, pools: Dict, tokens, write_pos,
                               tables, active, prefix_blocks: int, cfg,
                               mesh: Mesh, axis_name: str = 'pp',
                               microbatches: Optional[int] = None):
    """Pipeline-parallel twin of paged.prefill_chunk_paged: continuation
    prefill writing `chunk` tokens at per-slot offsets write_pos while
    attending over the already-written prefix. The prefix gather is
    STAGE-LOCAL — pools shard the layer axis over 'pp', and each stage
    only reads its own layers' slabs — so no cross-stage pool traffic is
    needed beyond the activation ring.

    tokens (B, chunk); write_pos (B,); active (B,) bool;
    prefix_blocks: static bound on the gathered prefix width.
    Returns (logits (B, chunk, vocab) f32, pools)."""
    from .model import (_kv_quant, mlp, qmatmul, rms_norm, rope_apply,
                        rope_tables)
    from .paged import pool_block_size, scatter_kv_all

    B, T = tokens.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    int8_cache = cfg.kv_cache_bits == 8
    n_stage = mesh.shape[axis_name]
    M = microbatches or n_stage
    assert B % M == 0
    mb = B // M
    pool_dt = pools['kv'].dtype
    BLK = pool_block_size(pools)
    Sp = prefix_blocks * BLK

    x = params['embed'][tokens]                              # (B, T, D)
    x_mb = x.reshape((M, mb) + x.shape[1:])
    positions = write_pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])  # (T, T)
    slot_ids = jnp.arange(Sp)[None, None, None, None, :]
    # every chunk query sees exactly the prefix [0, write_pos); the
    # chunk's own tokens join via the within-chunk causal term
    pfx_mask = slot_ids < write_pos[:, None, None, None, None]  # (B,1,1,1,Sp)
    tbl_p = jnp.asarray(tables, jnp.int32)[:, :prefix_blocks]   # (B, P)
    layers = params['layers']
    n_sp = _sp_axis(mesh)
    p_spec = jax.tree.map(lambda _: P(axis_name), layers)
    pool_spec = jax.tree.map(
        lambda _: P(axis_name, 'sp') if n_sp > 1 else P(axis_name), pools)

    def stage(local_layers, local_pools, x_all, tbl_p, tables, write_pos,
              active_all):
        idx = jax.lax.axis_index(axis_name)
        n_dev = jax.lax.psum(1, axis_name)
        L_local = jax.tree.leaves(local_layers)[0].shape[0]
        perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]
        r_cos, r_sin = rope_tables(positions, cfg.rope_theta, Dh)

        kcol = jnp.zeros((L_local, B, T, KV, Dh), pool_dt)
        vcol = jnp.zeros((L_local, B, T, KV, Dh), pool_dt)
        kscol = jnp.zeros((L_local, B, T, KV), jnp.float32)
        vscol = jnp.zeros((L_local, B, T, KV), jnp.float32)

        def run_stage(xin, cols, tick):
            kcol, vcol, kscol, vscol = cols
            mb_idx = jnp.clip(tick - idx, 0, M - 1)
            valid = jnp.logical_and(tick - idx >= 0, tick - idx < M)
            row0 = mb_idx * mb

            def rows(a):
                return jax.lax.dynamic_slice_in_dim(a, row0, mb, 0)

            h = xin
            rc, rs = rows(r_cos), rows(r_sin)
            tbl_rows = rows(tbl_p)                        # (mb, P)
            pm_rows = rows(pfx_mask)                      # (mb,1,1,1,Sp)
            for li in range(L_local):
                layer = jax.tree.map(lambda a: a[li], local_layers)
                hh = rms_norm(h, layer['attn_norm'], cfg.rms_eps)
                q = qmatmul(hh, layer['wq']).reshape(mb, T, H, Dh)
                k = qmatmul(hh, layer['wk']).reshape(mb, T, KV, Dh)
                v = qmatmul(hh, layer['wv']).reshape(mb, T, KV, Dh)
                q = rope_apply(q, rc, rs)
                k = rope_apply(k, rc, rs)
                if int8_cache:
                    k_q, k_s = _kv_quant(k)
                    v_q, v_s = _kv_quant(v)
                else:
                    k_q, v_q = k.astype(pool_dt), v.astype(pool_dt)
                    k_s = v_s = None

                def masked_dus(buf, val, idx4):
                    cur = jax.lax.dynamic_slice(buf, idx4, val.shape)
                    return jax.lax.dynamic_update_slice(
                        buf, jnp.where(valid, val, cur), idx4)

                kcol = masked_dus(kcol, k_q[None], (li, row0, 0, 0, 0))
                vcol = masked_dus(vcol, v_q[None], (li, row0, 0, 0, 0))
                if int8_cache:
                    kscol = masked_dus(kscol, k_s[None], (li, row0, 0, 0))
                    vscol = masked_dus(vscol, v_s[None], (li, row0, 0, 0))

                # stage-local prefix gather (pre-chunk pool state: all
                # scatters defer to the stage end); on an sp x pp mesh
                # each sp shard contributes its blocks (zeros elsewhere)
                # and a psum over 'sp' rebuilds the dense prefix — every
                # block lives on exactly one sp shard
                if n_sp > 1:
                    nb_local = local_pools['kv'].shape[1]
                    loc = tbl_rows - _sp_block_offset(nb_local)
                    inb = (loc >= 0) & (loc < nb_local)
                    loc = jnp.where(inb, loc, 0)
                    kvp = local_pools['kv'][li][loc]
                    kvp = jnp.where(inb[:, :, None, None, None], kvp, 0)
                    kvp = jax.lax.psum(
                        kvp.astype(jnp.int32)
                        if kvp.dtype == jnp.int8 else kvp, 'sp'
                    ).astype(local_pools['kv'].dtype)
                    if int8_cache:
                        scp = local_pools['kv_scale'][li][loc]
                        scp = jnp.where(inb[:, :, None, None, None],
                                        scp, 0.0)
                        scp = jax.lax.psum(scp, 'sp')
                else:
                    kvp = local_pools['kv'][li][tbl_rows]
                    if int8_cache:
                        scp = local_pools['kv_scale'][li][tbl_rows]
                kp = kvp[:, :, 0].reshape(mb, Sp, KV, Dh)
                vp = kvp[:, :, 1].reshape(mb, Sp, KV, Dh)
                if int8_cache:
                    kps = scp[:, :, 0].transpose(0, 2, 1, 3).reshape(
                        mb, KV, Sp)
                    vps = scp[:, :, 1].transpose(0, 2, 1, 3).reshape(
                        mb, KV, Sp)

                q_g = q.reshape(mb, T, KV, rep, Dh).astype(jnp.bfloat16)
                lp = jnp.einsum('btkrd,bskd->bkrts', q_g,
                                kp.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                if int8_cache:
                    lp = lp * kps[:, :, None, None, :]
                lp = jnp.where(pm_rows, lp / np.sqrt(Dh), -1e30)
                lc = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                                k_q.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                if int8_cache:
                    lc = lc * k_s.transpose(0, 2, 1)[:, :, None, None, :]
                lc = jnp.where(causal[None, None, None],
                               lc / np.sqrt(Dh), -1e30)
                probs = jax.nn.softmax(
                    jnp.concatenate([lp, lc], axis=-1), axis=-1)
                pp_, pc = probs[..., :Sp], probs[..., Sp:]
                if int8_cache:
                    pp_ = pp_ * vps[:, :, None, None, :]
                    pc = pc * v_s.transpose(0, 2, 1)[:, :, None, None, :]
                ctx = jnp.einsum('bkrts,bskd->btkrd',
                                 pp_.astype(jnp.bfloat16),
                                 vp.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                ctx = ctx + jnp.einsum('bkrtj,bjkd->btkrd',
                                       pc.astype(jnp.bfloat16),
                                       v_q.astype(jnp.bfloat16),
                                       preferred_element_type=jnp.float32)
                ctx = ctx.reshape(mb, T, H * Dh).astype(h.dtype)
                h = h + qmatmul(ctx, layer['wo'])
                hh = rms_norm(h, layer['mlp_norm'], cfg.rms_eps)
                h = h + mlp(hh, layer, cfg)
            return h, (kcol, vcol, kscol, vscol)

        buf = jnp.zeros_like(x_all[0])
        out = jnp.zeros_like(x_all)
        cols = (kcol, vcol, kscol, vscol)
        for t in range(M + n_stage - 1):
            feed = x_all[t] if t < M else jnp.zeros_like(x_all[0])
            xin = jnp.where(jnp.equal(idx, 0), feed, buf)
            y, cols = run_stage(xin, cols, t)
            done_i = t - n_stage + 1
            if 0 <= done_i < M:
                is_last = jnp.equal(idx, n_dev - 1)
                out = out.at[done_i].set(jnp.where(is_last, y, out[done_i]))
            buf = jax.lax.ppermute(y, axis_name, perm)
        is_last = jnp.equal(idx, n_dev - 1)
        out = jax.lax.psum(
            jnp.where(is_last, out, jnp.zeros_like(out)), axis_name)

        kcol, vcol, kscol, vscol = cols
        new_pools = scatter_kv_all(
            local_pools, kcol, vcol,
            kscol if int8_cache else None,
            vscol if int8_cache else None,
            tables, write_pos, active_all,
            blk_offset=(_sp_block_offset(local_pools['kv'].shape[1])
                        if n_sp > 1 else None))
        return out, new_pools

    fn = shard_map(stage, mesh=mesh,
                   in_specs=(p_spec, pool_spec, P(), P(), P(), P(), P()),
                   out_specs=(P(), pool_spec))
    if active is None:
        active = jnp.ones((B,), bool)
    out, pools = fn(layers, pools, x_mb, tbl_p,
                    jnp.asarray(tables, jnp.int32),
                    jnp.asarray(write_pos, jnp.int32), active)
    x = out.reshape((B, T) + out.shape[3:])
    x = rms_norm(x, params['final_norm'], cfg.rms_eps)
    logits = qmatmul(x, params['lm_head'])
    return logits.astype(jnp.float32), pools
