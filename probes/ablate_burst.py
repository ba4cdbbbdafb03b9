"""Ablate the decode burst step to localize the non-matmul overhead.

Variants (cumulative subtraction from the full step):
  full       — production burst_forward path (ragged kernel)
  no_attn    — frozen read + in-burst einsums + merge replaced by zeros ctx
               (K/V quant + buffer banking still run)
  no_bank    — additionally skip K/V quant + buffer banking (no kbuf/vbuf
               writes; buffers stay in the carry)
  no_layers  — skip the whole layer loop (embed + final norm + lm_head +
               sampling + scan machinery only)
  no_merge   — full, but skip the burst-end cache merge (outside scan)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params
from ppq_tpu.serving import model as M

B = 64
c = LlamaConfig(d_model=2048, n_layers=16, n_heads=16, n_kv_heads=8,
                d_ff=5632, vocab_size=32000, max_seq_len=1024, max_batch=B,
                weight_bits=8)
c.prefill_buckets = (128,)
eng = ServingEngine(c, init_llama_params(c, seed=0))
params = eng.params
cfg = eng.cfg
cache = eng._new_cache()
fill = 16
n = 32
tokens = jnp.zeros((B,), jnp.int32)
seq_lens = jnp.full((B,), fill, jnp.int32)
keys = jax.random.split(jax.random.PRNGKey(0), n)
s_limit = 64


def select_fn(logits, key):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def burst(params, cache, tokens, seq_lens, keys, skip):
    """Copy of model.burst_forward with ablation switches."""
    cfg_l = cfg
    L = len(params['layers'])
    KV, Dh, H = cfg_l.n_kv_heads, cfg_l.head_dim, cfg_l.n_heads
    rep = H // KV
    pall = bool(getattr(cfg_l, 'use_pallas_matmul', False))
    from ppq_tpu.kernels.paged_attention import (
        blockmajor_window, grouped_group_size, merge_attention,
        paged_attention_decode_grouped)
    Sf = cache['k'].shape[2]
    cap = min(-(-s_limit // 128) * 128, Sf)
    RBLK = max(128, min(512, cap // 2))
    G = grouped_group_size(B, RBLK)
    kv_pools, sc_pools = [], []
    if 'attn' not in skip:
        for li in range(L):
            kv_bm, sc_bm = blockmajor_window(
                cache['k'][li], cache['v'][li], cache['k_scale'][li],
                cache['v_scale'][li], cap, RBLK)
            kv_pools.append(kv_bm)
            sc_pools.append(sc_bm)

    nbufs = 0 if 'carry' in skip else L
    kbuf0 = tuple(jnp.zeros((B, n, KV, Dh), jnp.int8) for _ in range(nbufs))
    vbuf0 = tuple(jnp.zeros((B, n, KV, Dh), jnp.int8) for _ in range(nbufs))
    ksb0 = tuple(jnp.zeros((B, KV, n), jnp.float32) for _ in range(nbufs))
    vsb0 = tuple(jnp.zeros((B, KV, n), jnp.float32) for _ in range(nbufs))
    buf_ids = jnp.arange(n)[None, None, None, :]

    def step(carry, inp):
        cur_tok, kbuf, vbuf, ksb, vsb, i = carry
        kbuf, vbuf = list(kbuf), list(vbuf)
        ksb, vsb = list(ksb), list(vsb)
        key = inp
        pos = seq_lens + i
        x = params['embed'][cur_tok][:, None, :]
        r_cos, r_sin = M.rope_tables(pos[:, None], cfg_l.rope_theta, Dh)
        if 'layers' not in skip:
            for li, layer in enumerate(params['layers']):
                h = M.rms_norm(x, layer['attn_norm'], cfg_l.rms_eps)
                q, k, v = M.project_qkv(h, layer, cfg_l, pall)
                q = M.rope_apply(q, r_cos, r_sin)
                k = M.rope_apply(k, r_cos, r_sin)
                if 'bank' not in skip:
                    k_q, k_s = M._kv_quant(k)
                    v_q, v_s = M._kv_quant(v)
                    ksb[li] = jax.lax.dynamic_update_slice(
                        ksb[li], k_s.transpose(0, 2, 1), (0, 0, i))
                    vsb[li] = jax.lax.dynamic_update_slice(
                        vsb[li], v_s.transpose(0, 2, 1), (0, 0, i))
                    kbuf[li] = jax.lax.dynamic_update_slice(
                        kbuf[li], k_q, (0, i, 0, 0))
                    vbuf[li] = jax.lax.dynamic_update_slice(
                        vbuf[li], v_q, (0, i, 0, 0))
                if 'attn' not in skip and 'dense' in skip:
                    # dense bucketed frozen read (the ragged=False branch)
                    Sb = s_limit
                    q_g = q.reshape(B, 1, KV, rep, Dh).astype(jnp.bfloat16)
                    slot_ids = jnp.arange(Sb)[None, None, None, :]
                    frozen_mask = slot_ids < seq_lens[:, None, None, None]
                    lf = jnp.einsum('btkrd,bskd->bkrts', q_g,
                                    cache['k'][li][:, :Sb]
                                    .astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                    lf = lf[:, :, :, 0, :]
                    lf = lf * cache['k_scale'][li][:, :Sb] \
                        .transpose(0, 2, 1)[:, :, None, :]
                    lf = jnp.where(frozen_mask, lf / np.sqrt(Dh), -1e30)
                    lb = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                                    kbuf[li].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                    lb = lb[:, :, :, 0, :]
                    lb = lb * ksb[li][:, :, None, :]
                    lb = jnp.where(buf_ids[:, :, 0] <= i,
                                   lb / np.sqrt(Dh), -1e30)
                    joint = jnp.concatenate([lf, lb], axis=-1)
                    probs = jax.nn.softmax(joint, axis=-1)
                    pf, pb = probs[..., :Sb], probs[..., Sb:]
                    pf = pf * cache['v_scale'][li][:, :Sb] \
                        .transpose(0, 2, 1)[:, :, None, :]
                    pb = pb * vsb[li][:, :, None, :]
                    ctx = jnp.einsum('bkrs,bskd->bkrd',
                                     pf.astype(jnp.bfloat16),
                                     cache['v'][li][:, :Sb]
                                     .astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
                    ctx = ctx + jnp.einsum('bkrj,bjkd->bkrd',
                                           pb.astype(jnp.bfloat16),
                                           vbuf[li].astype(jnp.bfloat16),
                                           preferred_element_type=jnp.float32)
                elif 'attn' not in skip and 'buf' in skip:
                    q_g = q.reshape(B, 1, KV, rep, Dh).astype(jnp.bfloat16)
                    acc_f, m_f, l_f = paged_attention_decode_grouped(
                        q_g[:, 0], kv_pools[li], sc_pools[li], seq_lens,
                        block_size=RBLK, group=G)
                    ctx = acc_f / jnp.maximum(l_f, 1e-30)[..., None]
                elif 'attn' not in skip:
                    q_g = q.reshape(B, 1, KV, rep, Dh).astype(jnp.bfloat16)
                    lb = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                                    kbuf[li].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                    lb = lb[:, :, :, 0, :]
                    lb = lb * ksb[li][:, :, None, :]
                    lb = jnp.where(buf_ids[:, :, 0] <= i,
                                   lb / np.sqrt(Dh), -1e30)
                    acc_f, m_f, l_f = paged_attention_decode_grouped(
                        q_g[:, 0], kv_pools[li], sc_pools[li], seq_lens,
                        block_size=RBLK, group=G)
                    m_b = jnp.max(lb, axis=-1)
                    p_b = jnp.exp(lb - m_b[..., None])
                    l_b = jnp.sum(p_b, axis=-1)
                    p_b = p_b * vsb[li][:, :, None, :]
                    acc_b = jnp.einsum('bkrj,bjkd->bkrd',
                                       p_b.astype(jnp.bfloat16),
                                       vbuf[li].astype(jnp.bfloat16),
                                       preferred_element_type=jnp.float32)
                    ctx = merge_attention([(acc_f, m_f, l_f),
                                           (acc_b, m_b, l_b)])
                else:
                    ctx = jnp.zeros((B, KV, rep, Dh), jnp.float32) \
                        + q.reshape(B, KV, rep, Dh).astype(jnp.float32) * 0
                ctx = ctx.reshape(B, 1, H * Dh).astype(x.dtype)
                x = x + M.qmatmul(ctx, layer['wo'], pallas=pall)
                h = M.rms_norm(x, layer['mlp_norm'], cfg_l.rms_eps)
                x = x + M.mlp(h, layer, cfg_l)
        x = M.rms_norm(x, params['final_norm'], cfg_l.rms_eps)
        logits = M.qmatmul(x, params['lm_head'],
                           pallas=pall).astype(jnp.float32)
        nxt = select_fn(logits[:, 0, :], key)
        return (nxt, tuple(kbuf), tuple(vbuf), tuple(ksb), tuple(vsb),
                i + 1), nxt

    (_, kbuf, vbuf, ksb, vsb, _), toks = jax.lax.scan(
        step, (tokens, kbuf0, vbuf0, ksb0, vsb0, jnp.int32(0)), keys)

    if 'merge' in skip or 'layers' in skip:
        return toks, cache
    new_cache = dict(cache)
    ck_all, cv_all = cache['k'], cache['v']
    ks_all, vs_all = cache['k_scale'], cache['v_scale']
    for li in range(L):
        ck_all = jax.lax.dynamic_update_index_in_dim(
            ck_all, M._window_write(ck_all[li], kbuf[li], seq_lens, None),
            li, 0)
        cv_all = jax.lax.dynamic_update_index_in_dim(
            cv_all, M._window_write(cv_all[li], vbuf[li], seq_lens, None),
            li, 0)
        ks_all = jax.lax.dynamic_update_index_in_dim(
            ks_all, M._window_write(ks_all[li], ksb[li].transpose(0, 2, 1),
                                    seq_lens, None), li, 0)
        vs_all = jax.lax.dynamic_update_index_in_dim(
            vs_all, M._window_write(vs_all[li], vsb[li].transpose(0, 2, 1),
                                    seq_lens, None), li, 0)
    new_cache.update(k=ck_all, v=cv_all, k_scale=ks_all, v_scale=vs_all)
    return toks, new_cache


def run(skip):
    fn = jax.jit(functools.partial(burst, skip=skip),
                 donate_argnums=(1,))
    cc = jax.tree.map(lambda x: x.copy(), cache)
    toks, cc = fn(params, cc, tokens, seq_lens, keys)
    np.asarray(toks)
    best = 1e9
    for _ in range(3):
        cc2 = jax.tree.map(lambda x: x.copy(), cache)
        t0 = time.perf_counter()
        toks, cc2 = fn(params, cc2, tokens, seq_lens, keys)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3  # ms per step


import sys
sel = sys.argv[1:] or None
base = None      # lazily measured: selective runs skip the full-path cost
for name, skip in (('full', ()),
                   ('dense_bucket', ('dense',)),
                   ('kernel_only_attn', ('buf',)),
                   ('no_merge', ('merge',)),
                   ('no_attn', ('attn',)),
                   ('no_attn_bank', ('attn', 'bank')),
                   ('no_layers', ('layers',)),
                   ('no_layers_carry', ('layers', 'merge', 'carry')),
                   ('engine_bench', ('ENGINE',))):
    if sel and name not in sel:
        continue
    if 'ENGINE' in skip:
        d = eng.benchmark_decode(steps=96, burst=32)
        print(f"{name:17s} {d['ms_per_step']:7.3f} ms/step  "
              f"({d['tokens_per_sec']:.0f} tok/s)", flush=True)
        continue
    ms = run(skip)
    if name == 'full':
        base = ms                     # reuse: 'full' is not timed twice
    delta = f'{base - ms:+7.3f}' if base is not None else '    n/a'
    print(f'{name:14s} {ms:7.3f} ms/step   (delta vs full '
          f'{delta})', flush=True)
