"""Llama-class decoder: pure-functional JAX with quantized weights + KV cache.

TPU-native design decisions:
  * weights live as INT8/INT4 integers + per-output-channel fp scales; the
    dequant `w_int.astype(bf16) * scale` sits directly before each matmul so
    XLA fuses it into the MXU operand read — HBM traffic is the int tensor,
    which is the whole point of weight-only quantization for serving
    (memory-bandwidth-bound decode).
  * INT4 packs two nibbles per int8 byte; unpack is a shift/mask fused the
    same way.
  * KV cache stores int8 + per-(token, kv-head) scales; quantize-on-write,
    dequant-on-read fused into the attention matmuls.
  * activations run bf16; attention logits/softmax in fp32.
  * all weight tensors carry TP-shardable layouts: qkv/gate/up are
    column-parallel (shard output dim), o/down row-parallel (shard input
    dim) — annotated in engine.py via NamedSharding; XLA inserts the psums.

The per-channel weight quantization reuses the framework's TQC machinery
(quantize_llama_params), so serving consumes the same quant math the PTQ
pipeline validates.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig

Params = Dict[str, Any]


# ============================================================ weight quant ==

def _mse_weight_scale(w: np.ndarray, qmax: int, n_grid: int = 32,
                      shrink: float = 0.5) -> np.ndarray:
    """Per-channel MSE-optimal symmetric scale: grid-search shrink
    factors of the absmax range and keep each channel's reconstruction-
    MSE minimizer (the toolkit's DirectMSEObserver recipe applied to
    weights — clipping a heavy tail trades saturation error for finer
    resolution everywhere else; biggest payoff at 4 bits)."""
    absmax = np.maximum(np.abs(w).max(axis=0), 1e-8)        # (out,)
    best_s = absmax / qmax
    best_err = np.full(w.shape[1], np.inf)
    for g in range(n_grid):
        f = 1.0 - shrink * g / n_grid                       # 1.0 → 0.5+
        s = absmax * f / qmax
        q = np.clip(np.round(w / s), -qmax - 1, qmax)
        err = np.mean((q * s - w) ** 2, axis=0)
        take = err < best_err
        best_err = np.where(take, err, best_err)
        best_s = np.where(take, s, best_s)
    return best_s


def quantize_weight(w: np.ndarray, bits: int,
                    method: str = 'minmax') -> Dict[str, np.ndarray]:
    """Per-output-channel symmetric weight quantization. w: (in, out).
    method: 'minmax' (absmax range) or 'mse' (per-channel grid search
    for the reconstruction-MSE-optimal clipped range)."""
    if bits >= 16:
        return {'w': jnp.asarray(w, jnp.bfloat16)}
    qmax = (1 << (bits - 1)) - 1
    if method == 'mse':
        scale = _mse_weight_scale(w, qmax).astype(np.float32)
    elif method == 'minmax':
        absmax = np.maximum(np.abs(w).max(axis=0), 1e-8)    # (out,)
        scale = (absmax / qmax).astype(np.float32)
    else:
        raise ValueError(f'unknown weight quant method {method!r}')
    q = np.clip(np.round(w / scale), -qmax - 1, qmax).astype(np.int8)
    if bits == 4:
        # split-half packing (kernels/qmm.py): byte row r holds w[r] in the
        # low nibble and w[r + in/2] in the high nibble — unpacks with two
        # shifts and no sublane interleave, in both XLA and Pallas paths
        from ..kernels.qmm import pack_int4_splithalf
        return {'w_packed': jnp.asarray(pack_int4_splithalf(q)),
                'scale': jnp.asarray(scale)}
    return {'w_int': jnp.asarray(q), 'scale': jnp.asarray(scale)}


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(in//2, out) int8 → (in, out) int8 in [-8, 7] (split-half layout)."""
    from ..kernels.qmm import unpack_int4_splithalf
    return unpack_int4_splithalf(packed)


# x-rows cap for the fused kernels: the activation block must stay a small
# VMEM resident (decode / small-batch serving); prefill matmuls are
# compute-bound and keep the XLA path
_PALLAS_QMM_MAX_X_BYTES = 2 * 1024 * 1024


def _a8_quant(x: jnp.ndarray):
    """Per-token (last-axis) symmetric int8 activation quantization."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                 -127, 127).astype(jnp.int8)
    return q, s


def qmatmul(x: jnp.ndarray, wq: Dict[str, jnp.ndarray],
            pallas: bool = False, a8: bool = False,
            row_scale: Optional[jnp.ndarray] = None,
            residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x @ dequant(w).

    pallas=True routes supported shapes through the fused dequant-matmul
    kernels (kernels/qmm.py): the integer weight bytes stream HBM→VMEM and
    dequantize on-chip. The XLA fallback writes the dequant next to the
    dot — but inside a decode burst XLA hoists it out of the scan and
    re-reads a materialized bf16 copy every step (2x the weight traffic;
    measured ~2x slower per matmul on v5e at decode batch sizes).

    a8=True (W8A8): per-token int8 activation quant and an int8 x int8 →
    int32 dot — the MXU's int8 pipe runs at 2x bf16 peak on v5e, the win
    for COMPUTE-BOUND prefill (decode is HBM-bound and keeps the
    weight-only path). Output rescales by row_scale x per-channel weight
    scale; engine paths enable it via cfg.act_bits == 8 on windows with
    more than one token (the decision is shape-static, so each jitted
    program picks one path).

    row_scale (lead-shaped, or (..., 1)): per-row f32 multiplier fused
    into the kernel epilogue — the folded-rms_norm rsqrt factor (a row
    scalar commutes with the dot). residual (same shape as the output):
    fused post-scale add — decode's per-layer `x + f(x)`.
    """
    lead = x.shape[:-1]
    D = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1

    def _epilogue(out):
        if row_scale is not None:
            out = out * row_scale.astype(jnp.float32).reshape(R, 1)
        if residual is not None:
            out = out + residual.reshape(R, -1).astype(jnp.float32)
        return out

    if a8 and 'w' not in wq and x.shape[-2] > 1:
        q, sx = _a8_quant(x)
        w_int = (wq['w_int'] if 'w_int' in wq
                 else _unpack_int4(wq['w_packed']))
        acc = jax.lax.dot_general(
            q, w_int, (((q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * sx \
            * wq['scale'].astype(jnp.float32)
        out = _epilogue(out.reshape(R, -1)).reshape(out.shape)
        return out.astype(x.dtype)
    if pallas and 'w' not in wq and R * D * 2 <= _PALLAS_QMM_MAX_X_BYTES:
        from ..kernels import qmm
        x2 = x.reshape(R, D)
        rs = None if row_scale is None \
            else row_scale.reshape(R, 1).astype(jnp.float32)
        if 'w_int' in wq:
            F = wq['w_int'].shape[1]
            if qmm.supports(D, F, R):
                out = qmm.qmm_int8(
                    x2, wq['w_int'], wq['scale'], out_dtype=jnp.float32,
                    row_scale=rs,
                    residual=None if residual is None
                    else residual.reshape(R, F))
                return out.reshape(*lead, F).astype(x.dtype)
        else:
            F = wq['w_packed'].shape[1]
            if D % 2 == 0 and qmm.supports_int4(D // 2, F, R):
                out = qmm.qmm_int4(
                    x2, wq['w_packed'], wq['scale'], out_dtype=jnp.float32,
                    row_scale=rs,
                    residual=None if residual is None
                    else residual.reshape(R, F))
                return out.reshape(*lead, F).astype(x.dtype)
    if 'w' in wq:
        w = wq['w']
    elif 'w_int' in wq:
        w = wq['w_int'].astype(jnp.bfloat16) * wq['scale'].astype(jnp.bfloat16)
    else:
        w = (_unpack_int4(wq['w_packed']).astype(jnp.bfloat16)
             * wq['scale'].astype(jnp.bfloat16))
    out = jnp.dot(x.astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    out = _epilogue(out.reshape(R, -1)).reshape(out.shape)
    return out.astype(x.dtype)


# =============================================================== init ======

def init_llama_params(cfg: LlamaConfig, seed: int = 0,
                      quantized: bool = True) -> Params:
    """Random-initialized (optionally quantized) parameter pytree."""
    rng = np.random.default_rng(seed)
    D, H, KV, Dh, F = (cfg.d_model, cfg.n_heads, cfg.n_kv_heads,
                       cfg.head_dim, cfg.d_ff)
    bits = cfg.weight_bits if quantized else 16
    method = getattr(cfg, 'weight_quant_method', 'minmax')

    def dense(i, o, b=None):
        w = rng.standard_normal((i, o), dtype=np.float32) \
            * np.float32(1.0 / np.sqrt(i))
        return quantize_weight(w, b if b is not None else bits,
                               method=method)

    params: Params = {
        'embed': jnp.asarray(
            rng.standard_normal((cfg.vocab_size, D), dtype=np.float32) * 0.02,
            jnp.bfloat16),
        'final_norm': jnp.ones((D,), jnp.float32),
        # mixed-precision head (cfg.lm_head_bits): int4 models keep an
        # int8 head by default — the unpack is VPU-serialized against
        # the MXU at decode batch >= 64 (probes/int4_pipe.py) and the
        # head is the largest single matmul
        'lm_head': dense(D, cfg.vocab_size,
                         cfg.resolved_lm_head_bits if quantized else 16),
        'layers': [],
    }
    for li in range(cfg.n_layers):
        layer = {
            'attn_norm': jnp.ones((D,), jnp.float32),
            'mlp_norm': jnp.ones((D,), jnp.float32),
            'wq': dense(D, H * Dh),
            'wk': dense(D, KV * Dh),
            'wv': dense(D, KV * Dh),
            'wo': dense(H * Dh, D),
        }
        if cfg.n_experts > 0:
            from .moe import init_moe_params
            moe = init_moe_params(D, F, cfg.n_experts, cfg.top_k,
                                  weight_bits=bits, seed=seed * 1000 + li)
            moe.pop('top_k'); moe.pop('n_experts')
            layer['moe'] = moe
        else:
            layer['w_gate'] = dense(D, F)
            layer['w_up'] = dense(D, F)
            layer['w_down'] = dense(F, D)
        params['layers'].append(layer)
    return params


def _concat_qweights(parts):
    """Concatenate quantized-weight dicts along the OUTPUT axis. Column
    dequant `w_int[:, c] * scale[c]` is independent per column, so the
    concatenated matmul is numerically identical to the separate ones."""
    keys = set(parts[0])
    assert all(set(p) == keys for p in parts), 'mixed weight formats'
    out = {}
    for k in ('w', 'w_int', 'w_packed', 'scale'):
        if k in keys:
            out[k] = jnp.concatenate([p[k] for p in parts], axis=-1)
    return out


def fold_norm_gamma(params: Params) -> bool:
    """Fold each rms_norm's gamma into the row scaling of the matmul it
    feeds (attn_norm → wq/wk/wv|wqkv, mlp_norm → gate/up|gateup,
    final_norm → lm_head), setting the stored gamma to ones. After this,
    rms_norm(x, ones, eps) @ W' is EXACTLY the original math — every
    path stays correct — and hot paths may instead use the fused
    row_rsqrt epilogue (one fewer rounding, no (B, D) norm
    materialization). MUTATES params in place.

    Folding needs fp weights ('w' present, pre-quantization); gammas
    that are already all-ones (fresh-initialized models) fold trivially.
    Weight dicts are copied before scaling (no aliasing back into the
    caller's original tree). Returns True only if EVERY norm folded —
    callers set params['norm_folded'] on success."""
    def fold(owner, gkey, wkeys):
        g = np.asarray(owner[gkey], np.float32)
        if np.all(g == 1.0):
            return True
        wqs = [owner.get(k) for k in wkeys]
        if not all(wq is not None and 'w' in wq for wq in wqs):
            return False
        gj = jnp.asarray(g)[:, None]
        for k, wq in zip(wkeys, wqs):
            new = dict(wq)
            new['w'] = (new['w'].astype(jnp.float32) * gj) \
                .astype(jnp.asarray(new['w']).dtype)
            owner[k] = new
        owner[gkey] = jnp.ones_like(jnp.asarray(owner[gkey]))
        return True

    ok = True
    for layer in params['layers']:
        if 'moe' in layer:
            ok = False      # router/expert folding not attempted
            continue
        ok &= fold(layer, 'attn_norm',
                   ('wqkv',) if 'wqkv' in layer else ('wq', 'wk', 'wv'))
        ok &= fold(layer, 'mlp_norm',
                   ('w_gateup',) if 'w_gateup' in layer
                   else ('w_gate', 'w_up'))
    ok &= fold(params, 'final_norm', ('lm_head',))
    return ok


def fuse_decode_params(params: Params, cfg: LlamaConfig) -> Params:
    """Fuse per-layer projections for the decode hot loop: wq|wk|wv →
    'wqkv' and w_gate|w_up → 'w_gateup' (one matmul dispatch instead of
    three/two — decode steps are launch-overhead-bound, measured ~7.6µs
    per small matmul dispatch vs ~2.4µs of bytes). SINGLE-DEVICE layout:
    the concatenated output axis interleaves q/k/v per layer, which a
    Megatron 'tp' column shard would split incorrectly — the engine only
    applies this when the mesh is absent or size 1. Model code uses the
    fused keys when present and falls back to the separate ones."""
    out = dict(params)
    layers = []
    for layer in params['layers']:
        lay = dict(layer)
        if 'wq' in lay:
            lay['wqkv'] = _concat_qweights(
                [lay.pop('wq'), lay.pop('wk'), lay.pop('wv')])
        if 'w_gate' in lay:
            lay['w_gateup'] = _concat_qweights(
                [lay.pop('w_gate'), lay.pop('w_up')])
        layers.append(lay)
    out['layers'] = layers
    # norm-gamma folding: lets the decode hot loop replace each rms_norm
    # with a per-row rsqrt fused into the following qmm kernel epilogue.
    # The marker lives on cfg (static under jit), NOT in the params
    # pytree (a bool leaf would trace).
    if fold_norm_gamma(out):
        cfg.norm_folded = True
    # pad the lm_head output axis to a multiple of 1024: 32000-class
    # vocabs only tile at TF=256 (125 grid steps per call); padded to
    # 32768 the panel reaches TF=2048 (16 steps) — measured 84.3 → 51.6
    # us per call on v5e (probes/qmm_lmhead_ab.py). Padded columns carry
    # zero weights ⇒ exactly-zero logits; every consumer slices logits
    # to cfg.vocab_size before sampling.
    lm = out.get('lm_head', {})
    F = next(iter(lm.values())).shape[-1] if lm else 0
    pad = (-F) % 1024
    if pad and 'w' not in lm:
        padded = {}
        if 'w_int' in lm:
            padded['w_int'] = jnp.pad(lm['w_int'], ((0, 0), (0, pad)))
        else:
            padded['w_packed'] = jnp.pad(lm['w_packed'],
                                         ((0, 0), (0, pad)))
        padded['scale'] = jnp.pad(lm['scale'], (0, pad),
                                  constant_values=1.0)
        out['lm_head'] = padded
    return out


def project_qkv(h, layer, cfg: LlamaConfig, pall: bool, row_scale=None):
    """(B, T, D) → q (B,T,H,Dh), k/v (B,T,KV,Dh) via the fused 'wqkv'
    weight when present, else the separate projections. row_scale: the
    folded-attn_norm rsqrt factor (pass raw x as h in that case)."""
    B, T, _ = h.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    a8 = getattr(cfg, 'act_bits', 16) == 8
    if 'wqkv' in layer:
        qkv = qmatmul(h, layer['wqkv'], pallas=pall, a8=a8,
                      row_scale=row_scale)
        q = qkv[..., :H * Dh].reshape(B, T, H, Dh)
        k = qkv[..., H * Dh:(H + KV) * Dh].reshape(B, T, KV, Dh)
        v = qkv[..., (H + KV) * Dh:].reshape(B, T, KV, Dh)
        return q, k, v
    q = qmatmul(h, layer['wq'], pallas=pall, a8=a8,
                row_scale=row_scale).reshape(B, T, H, Dh)
    k = qmatmul(h, layer['wk'], pallas=pall, a8=a8,
                row_scale=row_scale).reshape(B, T, KV, Dh)
    v = qmatmul(h, layer['wv'], pallas=pall, a8=a8,
                row_scale=row_scale).reshape(B, T, KV, Dh)
    return q, k, v


def quantize_llama_params(params: Params, cfg: LlamaConfig,
                          method: str = None) -> Params:
    """PTQ an existing bf16 param tree through the framework's weight-quant
    math (per-channel symmetric, framework TQC semantics). method:
    'minmax' | 'mse' (defaults to cfg.weight_quant_method)."""
    method = method or getattr(cfg, 'weight_quant_method', 'minmax')

    def q(wq, bits=None):
        if 'w' not in wq:
            return wq
        return quantize_weight(np.asarray(wq['w'], np.float32),
                               bits or cfg.weight_bits, method=method)
    out = dict(params)
    out['lm_head'] = q(params['lm_head'], cfg.resolved_lm_head_bits)
    out['layers'] = [{k: (q(v) if isinstance(v, dict) else v)
                      for k, v in layer.items()}
                     for layer in params['layers']]
    return out


# ============================================================ components ===

def rms_norm(x, gamma, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
            * gamma).astype(x.dtype)


def row_rsqrt(x, eps):
    """The data-dependent half of rms_norm: rsqrt(mean(x^2) + eps) as a
    per-row f32 scalar, shape = x.shape[:-1]. With the norm's gamma
    folded into the following matmul's weights (fold_norm_gamma), the
    full pre-norm matmul is  row_rsqrt(x) * (x @ W')  — the row scalar
    commutes with the dot and rides the qmm kernel epilogue."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1)
    return jax.lax.rsqrt(var + eps)


def rope_tables(positions, theta, Dh):
    """cos/sin tables for `rope_apply`: positions (B, T) → (B, T, 1, Dh/2).
    Position-only, so decode loops compute them ONCE per step instead of
    once per layer (they are identical across the L layers)."""
    half = Dh // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs   # (B,T,half)
    return jnp.cos(angles)[:, :, None, :], jnp.sin(angles)[:, :, None, :]


def rope_apply(x, cos, sin):
    """x: (B, T, H, Dh); cos/sin from rope_tables."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([
        x1 * cos - x2 * sin,
        x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


def rope(x, positions, theta):
    """x: (B, T, H, Dh); positions: (B, T)."""
    cos, sin = rope_tables(positions, theta, x.shape[-1])
    return rope_apply(x, cos, sin)


# ======================================================== KV cache (int8) ==

def init_kv_cache(cfg: LlamaConfig, batch: int) -> Dict[str, jnp.ndarray]:
    KV, Dh, T, L = cfg.n_kv_heads, cfg.head_dim, cfg.max_seq_len, cfg.n_layers
    if cfg.kv_cache_bits == 8:
        return {
            'k': jnp.zeros((L, batch, T, KV, Dh), jnp.int8),
            'v': jnp.zeros((L, batch, T, KV, Dh), jnp.int8),
            'k_scale': jnp.zeros((L, batch, T, KV), jnp.float32),
            'v_scale': jnp.zeros((L, batch, T, KV), jnp.float32),
        }
    return {
        'k': jnp.zeros((L, batch, T, KV, Dh), jnp.bfloat16),
        'v': jnp.zeros((L, batch, T, KV, Dh), jnp.bfloat16),
    }


def _kv_quant(x):
    """Per-(token, head) int8 quantization of K or V: (B,T,KV,Dh)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)      # (B,T,KV)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -128, 127).astype(jnp.int8)
    return q, scale


def _kv_dequant(q, scale):
    return q.astype(jnp.float32) * scale[..., None]


# ============================================================== forward ====

def _window_write(cache_slab, new, write_pos, active):
    """Write a (B, T, ...) window into a (B, S, ...) cache slab at per-slot
    offsets. Inactive slots write their current window back (no-op) —
    O(T) traffic, never an O(S) merge."""
    def upd(c, n, p, a):
        n = n.astype(c.dtype)
        if a is not None:
            cur = jax.lax.dynamic_slice(
                c, (p,) + (0,) * (c.ndim - 1), n.shape)
            n = jnp.where(a, n, cur)
        return jax.lax.dynamic_update_slice(
            c, n, (p,) + (0,) * (c.ndim - 1))
    if active is None:
        return jax.vmap(lambda c, n, p: upd(c, n, p, None))(
            cache_slab, new, write_pos)
    return jax.vmap(upd)(cache_slab, new, write_pos, active)


def attention(x, layer, cache_k, cache_v, cache_ks, cache_vs,
              positions, write_pos, cfg: LlamaConfig, causal_mask,
              active=None):
    """One attention block over an int8 KV cache layer slab.

    x: (B, T, D); positions: (B, T) absolute positions of the T new tokens;
    write_pos: (B,) first cache slot to write; active: optional (B,) bool —
    slots with active=False keep their cache rows untouched (masked
    read-modify-write over the T-token window only, NOT a full-cache merge).
    Returns (out, updated layer slabs) — the caller splices the slabs back
    with `lax.dynamic_update_index_in_dim`, which XLA aliases in place
    (donated buffers / scan carries); a `jnp.stack` rebuild would copy the
    whole cache every decode step instead.

    The HBM-critical reads stay int8: QK^T runs as a grouped-GQA einsum
    directly against the int8 K cache (per-(token,head) scales applied to
    the (T, S) logits afterwards — associativity moves the scale out of the
    contraction), and the V readout folds its scales into the probabilities
    before an int8 einsum. Nothing materializes a dequantized or
    head-repeated copy of the cache.
    """
    B, T, D = x.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    pall = bool(getattr(cfg, 'use_pallas_matmul', False))
    a8 = getattr(cfg, 'act_bits', 16) == 8

    q, k, v = project_qkv(x, layer, cfg, pall)
    q = rope(q, positions, cfg.rope_theta)
    k = rope(k, positions, cfg.rope_theta)

    # ---- write new K/V into the cache (quantize-on-write) ----------------
    if cfg.kv_cache_bits == 8:
        k_q, k_s = _kv_quant(k)
        v_q, v_s = _kv_quant(v)
    else:
        k_q, v_q, k_s, v_s = (k.astype(jnp.bfloat16),
                              v.astype(jnp.bfloat16), None, None)

    cache_k = _window_write(cache_k, k_q, write_pos, active)
    cache_v = _window_write(cache_v, v_q, write_pos, active)
    if cfg.kv_cache_bits == 8:
        cache_ks = _window_write(cache_ks, k_s, write_pos, active)
        cache_vs = _window_write(cache_vs, v_s, write_pos, active)

    # ---- GQA attention: grouped einsum straight off the (int8) cache -----
    # q heads regroup as (KV, rep): head h = k*rep + r
    q_g = q.reshape(B, T, KV, rep, Dh).astype(jnp.bfloat16)
    logits = jnp.einsum('btkrd,bskd->bkrts', q_g,
                        cache_k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    if cfg.kv_cache_bits == 8:
        logits = logits * cache_ks.transpose(0, 2, 1)[:, :, None, None, :]
    logits = logits / np.sqrt(Dh)
    logits = jnp.where(causal_mask, logits, -1e30)   # mask: (B,1,1,T,S)
    probs = jax.nn.softmax(logits, axis=-1)
    if cfg.kv_cache_bits == 8:
        probs = probs * cache_vs.transpose(0, 2, 1)[:, :, None, None, :]
    ctx = jnp.einsum('bkrts,bskd->btkrd', probs.astype(jnp.bfloat16),
                     cache_v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    ctx = ctx.reshape(B, T, H * Dh).astype(x.dtype)
    out = qmatmul(ctx, layer['wo'], pallas=pall, a8=a8)
    return out, cache_k, cache_v, cache_ks, cache_vs


def mlp(x, layer, cfg=None, row_scale=None, residual=None):
    """SwiGLU FFN. row_scale: folded-norm rsqrt factor (see
    fold_norm_gamma); residual: fused into the down-projection epilogue.
    On the Pallas decode path gate/up/silu/mul run inside ONE kernel
    (kernels/qmm.py qmm_gateup) — the (B, 2*d_ff) projection never
    round-trips HBM."""
    if 'moe' in layer:
        # fold_norm_gamma refuses MoE models, so no caller should reach
        # here with a folded-norm row_scale; enforce the invariant rather
        # than silently dropping the factor.
        assert row_scale is None, \
            'row_scale (folded norm) is not supported on the MoE branch'
        from .moe import moe_ffn
        out = moe_ffn(x, layer['moe'],
                      top_k=cfg.top_k if cfg is not None else 2)
        return out if residual is None else residual + out
    pall = bool(getattr(cfg, 'use_pallas_matmul', False)) \
        if cfg is not None else False
    a8 = (getattr(cfg, 'act_bits', 16) == 8) if cfg is not None else False
    lead = x.shape[:-1]
    D = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    if (pall and not a8 and 'w_gateup' in layer
            and 'w' not in layer['w_gateup']
            and R * D * 2 <= _PALLAS_QMM_MAX_X_BYTES):
        from ..kernels import qmm
        wgu = layer['w_gateup']
        wkey = 'w_int' if 'w_int' in wgu else 'w_packed'
        bits = 8 if wkey == 'w_int' else 4
        if qmm.supports_gateup(D, wgu[wkey].shape[1], R, bits):
            act = qmm.qmm_gateup(
                x.reshape(R, D), wgu[wkey], wgu['scale'],
                row_scale=None if row_scale is None
                else row_scale.reshape(R, 1))
            act = act.reshape(*lead, act.shape[-1]).astype(x.dtype)
            return qmatmul(act, layer['w_down'], pallas=pall, a8=a8,
                           residual=residual)
    if 'w_gateup' in layer:
        gu = qmatmul(x, layer['w_gateup'], pallas=pall, a8=a8,
                     row_scale=row_scale)
        F = gu.shape[-1] // 2
        g, u = gu[..., :F], gu[..., F:]
    else:
        g = qmatmul(x, layer['w_gate'], pallas=pall, a8=a8,
                    row_scale=row_scale)
        u = qmatmul(x, layer['w_up'], pallas=pall, a8=a8,
                    row_scale=row_scale)
    return qmatmul(jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u,
                   layer['w_down'], pallas=pall, a8=a8, residual=residual)


def decoder_layer(layer, ck, cv, cks, cvs, x, positions, write_pos, cfg,
                  causal, active=None):
    """One decoder layer over its cache slabs: pre-norm attention + MLP.
    x: (B, T, D); slabs: (B, S, KV, Dh) / (B, S, KV). Returns
    (x, ck, cv, cks, cvs). Shared by the flat forward below and the
    pipeline-parallel staged forward (pipeline.py)."""
    h = rms_norm(x, layer['attn_norm'], cfg.rms_eps)
    attn_out, ck, cv, cks, cvs = attention(
        h, layer, ck, cv, cks, cvs, positions, write_pos, cfg, causal,
        active=active)
    x = x + attn_out
    h = rms_norm(x, layer['mlp_norm'], cfg.rms_eps)
    x = x + mlp(h, layer, cfg)
    return x, ck, cv, cks, cvs


def burst_forward(params: Params, cache: Dict[str, jnp.ndarray],
                  tokens: jnp.ndarray, seq_lens: jnp.ndarray,
                  keys: jnp.ndarray, cfg: LlamaConfig, select_fn,
                  s_limit: Optional[int] = None, ragged: bool = False,
                  ragged_interpret: bool = False,
                  prefer_grouped: bool = True,
                  chunk: Optional[int] = None):
    """n consecutive decode steps with the big KV cache FROZEN: in-burst
    K/V live in small per-layer (B, CH, KV, Dh) chunk buffers carried
    through a lax.scan (CH-column chunks; finished chunks ride the next
    chunk's scan as invariant operands — see the chunked-carry comment
    below); the cache is written ONCE at burst end (quantize + per-slot
    window write).

    s_limit bounds the frozen-cache READ to the first s_limit slots (a
    static bucket the engine picks as the smallest power of two covering
    max(seq_lens) + n): decode is HBM-bound and the dense attention read
    otherwise touches all max_seq_len slots even when sequences are short —
    at seq 16 of 1024 that is 64x wasted cache traffic. Writes still land
    in the full cache.

    ragged=True goes further: the frozen read runs through the Pallas
    paged-attention kernel (kernels/paged_attention.py) with an identity
    block table over the cache — per-slot traffic is ceil(seq_len/BLK)
    blocks instead of a batch-wide bucket, and the partial-softmax triple
    merges exactly with the in-burst buffer. The fill lengths ride as
    device values, so one compiled program serves every fill. The kernel's
    measured cost driver is DMA transactions, so the cache window [0,
    s_limit) is repacked ONCE per burst into the kernel's fused layout
    (K+V in one array, both scale sets in another — half the DMAs) at an
    adaptive block size (bigger blocks at bigger fills): the repack is an
    O(window) copy amortized over the whole burst.

    Why: a scan whose carry includes the full cache double-buffers
    hundreds of MB every iteration — XLA cannot prove in-place aliasing
    through the slab-update chain, so each burst step paid ~2 cache copies
    (~16x slower than a single decode dispatch). With the cache as a
    closed-over constant and only the tiny buffer as carry, a burst step
    costs the same HBM traffic as a plain decode step (weights + one
    frozen-cache read), and the whole burst is still one host dispatch.

    tokens: (B,) current token per slot; seq_lens: (B,) cache fill;
    keys: (n, 2) PRNG keys per step; select_fn(logits, key) -> (B,) int32.
    Returns (toks (n, B), updated cache).
    """
    L = len(params['layers'])
    B = tokens.shape[0]
    n = keys.shape[0]
    KV, Dh, H = cfg.n_kv_heads, cfg.head_dim, cfg.n_heads
    rep = H // KV
    S = cache['k'].shape[2]
    if s_limit is not None:
        S = min(s_limit, S)
    int8_cache = cfg.kv_cache_bits == 8
    pall = bool(getattr(cfg, 'use_pallas_matmul', False))
    a8 = getattr(cfg, 'act_bits', 16) == 8

    buf_dtype = jnp.int8 if int8_cache else jnp.bfloat16
    # Chunked banked carry: the scan carries only the CURRENT CH-column
    # chunk of the in-burst buffer; finished chunks ride as scan-invariant
    # operands through a statically unrolled outer loop over chunks. XLA
    # never aliases a DUS'd carry leaf in place (probes/bank_dus.py), so
    # per-step rewrite traffic is proportional to the carried LEAF bytes —
    # chunking cuts the rewrite n/CH x, and the in-burst attention reads
    # only the WRITTEN prefix (finished chunks + current) instead of all n
    # buffer columns every step.
    # MEASURED NEGATIVE (probes/chunk_ab.py, v5e, B=128 L=16 d2048 n=32):
    # chunking LOSES end-to-end — 24,788 tok/s single-chunk vs 24,126 at
    # CH=8 and 23,376 at CH=4. The smaller carry rewrite saves ~0.3 ms/step
    # but the extra per-chunk einsum+concat ops (avg (NCH+1)/2 buffer
    # parts x 2 einsums x L layers) cost more. Default stays single-chunk;
    # the machinery remains for configs where the buffer dominates
    # (cfg.burst_chunk).
    if chunk is not None:
        CH = chunk if (n > chunk and n % chunk == 0) else n
    else:
        CH = n
    NCH = n // CH
    # banked-code column writes go through the aliased Pallas kernel
    # whenever the buffer shape is DMA-legal (see bank_write.py); the
    # XLA-DUS fallback keeps odd head dims working
    from ..kernels.bank_write import bank_write_inplace, supports_bank
    bank_kernel = supports_bank((B, CH, KV, Dh))
    bank_interpret = jax.default_backend() == 'cpu'
    # per-layer buffer LEAVES (not one stacked array): inside the scan only
    # the touched leaf is rewritten per layer — a stacked (L, ...) buffer
    # makes XLA copy the whole thing on every layer's update
    kbuf0 = tuple(jnp.zeros((B, CH, KV, Dh), buf_dtype) for _ in range(L))
    vbuf0 = tuple(jnp.zeros((B, CH, KV, Dh), buf_dtype) for _ in range(L))
    # buffer scales live TRANSPOSED (B, KV, CH): columns on lanes is what
    # both the fused kernel and the logits broadcast want — no per-step
    # transposes
    ksb0 = tuple(jnp.zeros((B, KV, CH), jnp.float32) for _ in range(L))
    vsb0 = tuple(jnp.zeros((B, KV, CH), jnp.float32) for _ in range(L))
    slot_ids = jnp.arange(S)[None, None, None, :]            # (1,1,1,S)
    buf_ids = jnp.arange(CH)[None, None, None, :]            # (1,1,1,CH)

    frozen_mask = slot_ids < seq_lens[:, None, None, None]   # (B,1,1,S)

    if ragged:
        from ..kernels.paged_attention import (blockmajor_window,
                                               grouped_group_size,
                                               identity_block_tables,
                                               merge_attention,
                                               paged_attention_decode_fused,
                                               paged_attention_decode_grouped)
        Sf = cache['k'].shape[2]
        assert Sf % 128 == 0 and Dh % 128 == 0, (Sf, Dh)
        # only the window [0, cap) can hold tokens this burst — repack just
        # it; at fill 16 of 2048 the repack (and the kernel grid) touches
        # 1/16 of the cache
        cap = Sf if s_limit is None else min(-(-s_limit // 32) * 32, Sf)
        # adaptive fused-block size: DMA transactions dominate the kernel
        # cost, so bigger windows use bigger blocks (same bytes, fewer
        # transactions); per-slot read granularity stays <= cap/2 so
        # shallow slots skip unfilled blocks.
        # prefer_grouped=False is the engine's DEEP-fill signal (every
        # active slot past 3/4 of the bucket): over-read is then bounded
        # by 4/3 and the grid's per-step fixed cost dominates — one
        # cap-sized block per slot halves the grid (fill-512 profile:
        # 309 us/call at RBLK=cap/2 vs a 164 us byte floor).
        if cap <= 64:
            # sub-128 caps (fill-bucketed windows): the whole window is
            # shallow — always the grouped kernel (the fused per-slot
            # kernel's scale specs assume BLK >= 128), one block per slot
            prefer_grouped = True
        if prefer_grouped:
            RBLK = cap if cap <= 64 else max(32, min(512, cap // 2))
        else:
            # one read-block covers a deep slot's whole fill up to 512;
            # NOT cap when cap > 512 — a 1024-block would read the empty
            # half of a fill-512 slot (the gate guarantees fills >= 3/4
            # of their block-granular extent at THIS block size). Engine
            # buckets are powers of two so 512 tiles them; arbitrary
            # s_limit callers fall back to the half-cap tiling.
            if cap <= 512:
                RBLK = cap
            elif cap % 512 == 0:
                RBLK = 512
            else:
                RBLK = max(128, min(512, cap // 2))
        NBp = cap // RBLK
        # grouped kernel: one grid step DMAs G slots' blocks from a
        # BLOCK-MAJOR window — the per-grid-step fixed cost (the kernel's
        # dominant cost at small fills) drops by G
        # prefer_grouped=False forces the per-slot fused kernel: at
        # uniformly-deep fills the grouped slab (G*RBLK tokens, VMEM
        # double-buffered) measured ~19% slower than per-slot blocks,
        # while at small/mixed fills grouping wins 1.3-2x
        # (probes/grouped_skew.py, grouped_g16.py) — the ENGINE gates on
        # its host-known fills
        G = grouped_group_size(B, RBLK, kv_dh=KV * Dh,
                               itemsize=1 if int8_cache else 2) \
            if prefer_grouped else 1
        # Build ONE stacked (L, ...) pool and let the kernels index the
        # layer via their `layer=` scalar: a per-layer python loop over
        # `cache['k'][li]` makes XLA materialize every full (B, S, KV, Dh)
        # slab as a separate buffer — measured 12.8 ms/burst (0.40 ms/
        # step) of pure slab copies at the 1B/B=128 config — while the
        # stacked repack touches only the O(L*window) bytes.
        if G > 1:
            kv_pool_l, sc_pool_l = blockmajor_window(
                cache['k'], cache['v'],
                cache['k_scale'] if int8_cache else None,
                cache['v_scale'] if int8_cache else None,
                cap, RBLK)
        else:
            tbl = identity_block_tables(B, cap, RBLK)
            k2 = cache['k'][:, :, :cap] \
                .reshape(L, B * NBp, RBLK, KV * Dh)
            v2 = cache['v'][:, :, :cap] \
                .reshape(L, B * NBp, RBLK, KV * Dh)
            kv_pool_l = jnp.stack([k2, v2], axis=2)
            if int8_cache:
                ks2 = cache['k_scale'][:, :, :cap] \
                    .reshape(L, B * NBp, RBLK, KV).transpose(0, 1, 3, 2)
                vs2 = cache['v_scale'][:, :, :cap] \
                    .reshape(L, B * NBp, RBLK, KV).transpose(0, 1, 3, 2)
                sc_pool_l = jnp.stack([ks2, vs2], axis=2)
            else:
                sc_pool_l = None

    def make_step(fin_k, fin_v, fin_ks, fin_vs, c0):
        """Scan body for the chunk starting at burst column c0. fin_*:
        per-layer tuples of FINISHED chunk buffers (scan-invariant)."""

        def step(carry, inp):
            cur_tok, kbuf, vbuf, ksb, vsb, i = carry
            kbuf, vbuf = list(kbuf), list(vbuf)
            ksb, vsb = list(ksb), list(vsb)
            key = inp
            pos = seq_lens + i                               # (B,)
            ic = i - c0                                      # column in chunk
            x = params['embed'][cur_tok][:, None, :]         # (B,1,D)
            # rope tables depend only on pos — ONE build per step
            r_cos, r_sin = rope_tables(pos[:, None], cfg.rope_theta, Dh)
            folded = bool(getattr(cfg, 'norm_folded', False))
            newk, newv = [], []       # per-layer (B,1,KV,Dh) banked codes
            for li, layer in enumerate(params['layers']):
                if folded:
                    # fused pre-norm: gamma lives in the weights
                    # (fold_norm_gamma); the rsqrt factor rides the qmm
                    # kernel epilogue as a row scale
                    q, k, v = project_qkv(
                        x, layer, cfg, pall,
                        row_scale=row_rsqrt(x, cfg.rms_eps))
                else:
                    h = rms_norm(x, layer['attn_norm'], cfg.rms_eps)
                    q, k, v = project_qkv(h, layer, cfg, pall)
                q = rope_apply(q, r_cos, r_sin)
                k = rope_apply(k, r_cos, r_sin)
                # quantize this step's K/V exactly like the cache so
                # burst == step-by-step. The CODES bank into the buffers
                # ONCE per step (all layers, one aliased Pallas column
                # write at end of step — an XLA DUS on a scan carry
                # rewrites each whole leaf every step: 32 x 16.3 us =
                # 0.52 ms/step profiled; kernels/bank_write.py holds it
                # to the column bytes). The current token attends via an
                # inline 1-wide chunk built from the same codes.
                if int8_cache:
                    k_q, k_s = _kv_quant(k)
                    v_q, v_s = _kv_quant(v)
                    ks_cur = k_s.transpose(0, 2, 1)          # (B,KV,1)
                    vs_cur = v_s.transpose(0, 2, 1)
                    ksb[li] = jax.lax.dynamic_update_slice(
                        ksb[li], ks_cur, (0, 0, ic))
                    vsb[li] = jax.lax.dynamic_update_slice(
                        vsb[li], vs_cur, (0, 0, ic))
                else:
                    k_q, v_q = k.astype(buf_dtype), v.astype(buf_dtype)
                    ks_cur = vs_cur = None
                if bank_kernel:
                    newk.append(k_q)
                    newv.append(v_q)
                else:
                    kbuf[li] = jax.lax.dynamic_update_slice(
                        kbuf[li], k_q, (0, ic, 0, 0))
                    vbuf[li] = jax.lax.dynamic_update_slice(
                        vbuf[li], v_q, (0, ic, 0, 0))

                q_g = q.reshape(B, 1, KV, rep, Dh).astype(jnp.bfloat16)

                def buf_logits(buf, scales, masked):
                    t = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                                   buf.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
                    t = t[:, :, :, 0, :]                # (B,KV,rep,cols)
                    if int8_cache:
                        t = t * scales[:, :, None, :]
                    if masked:
                        # current chunk: causal over banked columns. With
                        # the bank kernel the write is deferred to end of
                        # step, so column ic is stale — mask it strictly
                        # and let the current token ride its own chunk.
                        lim = ic if bank_kernel else ic + 1
                        return jnp.where(buf_ids < lim,
                                         t / np.sqrt(Dh), -1e30)
                    return t / np.sqrt(Dh)                   # fully written
                # in-burst logits: finished chunks (fully valid) + the
                # masked current chunk (+ the current token as a 1-wide
                # chunk from this step's codes — identical einsum
                # formulation, so the math matches the banked read)
                lb_parts = [buf_logits(fk, fks, False)
                            for fk, fks in zip(fin_k[li], fin_ks[li])]
                lb_parts.append(buf_logits(kbuf[li], ksb[li], True))
                v_chunks = list(fin_v[li]) + [vbuf[li]]
                vs_chunks = list(fin_vs[li]) + [vsb[li]]
                if bank_kernel:
                    lb_parts.append(buf_logits(k_q, ks_cur, False))
                    v_chunks.append(v_q)
                    vs_chunks.append(vs_cur)
                lb = jnp.concatenate(lb_parts, axis=-1) \
                    if len(lb_parts) > 1 else lb_parts[0]

                def buf_readout(pb):
                    """Σ_chunks einsum(probs_chunk · v_scale, v_chunk)."""
                    acc = None
                    off = 0
                    for vc, vs in zip(v_chunks, vs_chunks):
                        w = vc.shape[1]
                        p = pb[..., off:off + w]
                        off += w
                        if int8_cache:
                            p = p * vs[:, :, None, :]
                        t = jnp.einsum('bkrj,bjkd->bkrd',
                                       p.astype(jnp.bfloat16),
                                       vc.astype(jnp.bfloat16),
                                       preferred_element_type=jnp.float32)
                        acc = t if acc is None else acc + t
                    return acc

                if ragged:
                    # frozen part via the paged kernel (only filled blocks
                    # read); the in-burst buffer joins via an exact partial-
                    # softmax merge. NOTE: the fully-fused kernel variant
                    # (paged_attention_decode_buffered) measured ~6-10%
                    # SLOWER end-to-end on v5e and degraded O(n) with burst
                    # length — the XLA buffer einsum + merge is the faster
                    # composition.
                    if G > 1:
                        acc_f, m_f, l_f = paged_attention_decode_grouped(
                            q_g[:, 0], kv_pool_l, sc_pool_l, seq_lens,
                            layer=li, block_size=RBLK, group=G,
                            interpret=ragged_interpret)
                    else:
                        acc_f, m_f, l_f = paged_attention_decode_fused(
                            q_g[:, 0], kv_pool_l, sc_pool_l, tbl,
                            seq_lens, layer=li, block_size=RBLK,
                            interpret=ragged_interpret)
                    m_b = jnp.max(lb, axis=-1)               # (B,KV,rep)
                    p_b = jnp.exp(lb - m_b[..., None])
                    l_b = jnp.sum(p_b, axis=-1)
                    acc_b = buf_readout(p_b)
                    ctx = merge_attention([(acc_f, m_f, l_f),
                                           (acc_b, m_b, l_b)])
                else:
                    # frozen-cache logits (int8 read, scales folded
                    # post-dot)
                    lf = jnp.einsum('btkrd,bskd->bkrts', q_g,
                                    cache['k'][li][:, :S]
                                    .astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                    lf = lf[:, :, :, 0, :]                   # (B,KV,rep,S)
                    if int8_cache:
                        lf = lf * cache['k_scale'][li][:, :S] \
                            .transpose(0, 2, 1)[:, :, None, :]
                    lf = jnp.where(frozen_mask, lf / np.sqrt(Dh), -1e30)

                    joint = jnp.concatenate([lf, lb], axis=-1)
                    probs = jax.nn.softmax(joint, axis=-1)
                    pf, pb = probs[..., :S], probs[..., S:]
                    if int8_cache:
                        pf = pf * cache['v_scale'][li][:, :S] \
                            .transpose(0, 2, 1)[:, :, None, :]
                    ctx = jnp.einsum('bkrs,bskd->bkrd',
                                     pf.astype(jnp.bfloat16),
                                     cache['v'][li][:, :S]
                                     .astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
                    ctx = ctx + buf_readout(pb)
                ctx = ctx.reshape(B, 1, H * Dh).astype(x.dtype)
                if folded:
                    # residual adds + norms fused into kernel epilogues
                    x = qmatmul(ctx, layer['wo'], pallas=pall, a8=a8,
                                residual=x)
                    x = mlp(x, layer, cfg,
                            row_scale=row_rsqrt(x, cfg.rms_eps),
                            residual=x)
                else:
                    x = x + qmatmul(ctx, layer['wo'], pallas=pall, a8=a8)
                    h = rms_norm(x, layer['mlp_norm'], cfg.rms_eps)
                    x = x + mlp(h, layer, cfg)
            if bank_kernel:
                # one aliased column write banks every layer's codes in
                # place (kernels/bank_write.py) — the buffers never pay
                # the scan-carry DUS rewrite
                upd = bank_write_inplace(
                    tuple(kbuf) + tuple(vbuf), tuple(newk) + tuple(newv),
                    ic, interpret=bank_interpret)
                kbuf, vbuf = list(upd[:L]), list(upd[L:])
            if folded:
                logits = qmatmul(x, params['lm_head'], pallas=pall, a8=a8,
                                 row_scale=row_rsqrt(x, cfg.rms_eps)
                                 ).astype(jnp.float32)
            else:
                x = rms_norm(x, params['final_norm'], cfg.rms_eps)
                logits = qmatmul(x, params['lm_head'],
                                 pallas=pall, a8=a8).astype(jnp.float32)
            nxt = select_fn(logits[:, 0, :cfg.vocab_size], key)
            return (nxt, tuple(kbuf), tuple(vbuf), tuple(ksb), tuple(vsb),
                    i + 1), nxt

        return step

    # statically unrolled loop over chunks: each chunk's scan carries only
    # its own CH columns; completed chunks join the next scan as invariant
    # operands (no per-step copy)
    fin_k = tuple([] for _ in range(L))
    fin_v = tuple([] for _ in range(L))
    fin_ks = tuple([] for _ in range(L))
    fin_vs = tuple([] for _ in range(L))
    carry = (tokens, kbuf0, vbuf0, ksb0, vsb0, jnp.int32(0))
    toks_chunks = []
    for c in range(NCH):
        snap = [tuple(tuple(per_layer) for per_layer in f)
                for f in (fin_k, fin_v, fin_ks, fin_vs)]
        step = make_step(*snap, c * CH)
        (cur_tok, kbuf, vbuf, ksb, vsb, i), toks_c = jax.lax.scan(
            step, carry, keys[c * CH:(c + 1) * CH])
        for li in range(L):
            fin_k[li].append(kbuf[li])
            fin_v[li].append(vbuf[li])
            fin_ks[li].append(ksb[li])
            fin_vs[li].append(vsb[li])
        toks_chunks.append(toks_c)
        carry = (cur_tok, kbuf0, vbuf0, ksb0, vsb0, i)
    toks = (jnp.concatenate(toks_chunks, axis=0) if NCH > 1
            else toks_chunks[0])
    # full burst buffers for the merge: chunks concatenated on the column
    # axis (scales keep their transposed (B, KV, n) layout)
    kbuf = tuple(jnp.concatenate(fin_k[li], axis=1) if NCH > 1
                 else fin_k[li][0] for li in range(L))
    vbuf = tuple(jnp.concatenate(fin_v[li], axis=1) if NCH > 1
                 else fin_v[li][0] for li in range(L))
    ksb = tuple(jnp.concatenate(fin_ks[li], axis=2) if NCH > 1
                else fin_ks[li][0] for li in range(L))
    vsb = tuple(jnp.concatenate(fin_vs[li], axis=2) if NCH > 1
                else fin_vs[li][0] for li in range(L))

    # merge the burst buffer into the cache. The k/v code slabs go through
    # the Pallas in-place window writer (kernels/window_write.py): the XLA
    # lowering of the vmapped per-slot window write materializes every
    # (B, S, KV, Dh) layer slab in full — two 16-slab fusions, 12.8 ms per
    # burst = 0.40 ms/step measured at the 1B/B=128 config — while the
    # kernel DMAs exactly the O(L*B*n) window (0.5 ms/burst measured,
    # probes/merge_kernel_ab.py). The small f32 scale slabs stay on the
    # XLA path: Mosaic rejects lane-width-8 DMA slices, and their XLA
    # merge is ~1.7 ms/burst (0.05 ms/step) — acceptable.
    def _merge(slabs, new):
        return jax.vmap(
            lambda s, nn: _window_write(s, nn, seq_lens, None))(slabs, new)

    new_cache = dict(cache)
    from ..kernels.window_write import window_write_inplace, supports_dense
    if supports_dense(cache['k'].shape):
        new_cache['k'], new_cache['v'] = window_write_inplace(
            (cache['k'], cache['v']),
            (jnp.stack(kbuf), jnp.stack(vbuf)), seq_lens,
            interpret=jax.default_backend() == 'cpu')
    else:
        new_cache['k'] = _merge(cache['k'], jnp.stack(kbuf))
        new_cache['v'] = _merge(cache['v'], jnp.stack(vbuf))
    if int8_cache:
        new_cache['k_scale'] = _merge(
            cache['k_scale'], jnp.stack(ksb).transpose(0, 1, 3, 2))
        new_cache['v_scale'] = _merge(
            cache['v_scale'], jnp.stack(vsb).transpose(0, 1, 3, 2))
    return toks, new_cache


def forward(params: Params, cache: Dict[str, jnp.ndarray],
            tokens: jnp.ndarray, positions: jnp.ndarray,
            write_pos: jnp.ndarray, seq_lens: jnp.ndarray,
            cfg: LlamaConfig, active: Optional[jnp.ndarray] = None,
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """tokens: (B, T) int32; positions: (B, T); write_pos/seq_lens: (B,);
    active: optional (B,) bool — False slots leave their cache untouched.
    Returns (logits (B, T, vocab), updated cache)."""
    B, T = tokens.shape
    S = cache['k'].shape[2]
    x = params['embed'][tokens]

    # causal mask over cache slots: token t (absolute pos positions[b,t])
    # attends to cache slots [0, positions[b,t]]; shape broadcasts against
    # grouped-GQA logits (B, KV, rep, T, S)
    slot_ids = jnp.arange(S)[None, None, None, None, :]      # (1,1,1,1,S)
    tok_pos = positions[:, None, None, :, None]              # (B,1,1,T,1)
    causal = slot_ids <= tok_pos                             # (B,1,1,T,S)

    # per-layer slab updates spliced back with dynamic_update_index_in_dim:
    # XLA aliases these in place on donated buffers AND inside lax.scan
    # carries — a jnp.stack rebuild would copy the entire cache every
    # decode step (the round-1 burst was 16x slower per step than single
    # decode precisely because of that copy).
    ck_all, cv_all = cache['k'], cache['v']
    ks_all = cache.get('k_scale')
    vs_all = cache.get('v_scale')
    for li, layer in enumerate(params['layers']):
        x, ck, cv, cks, cvs = decoder_layer(
            layer, ck_all[li], cv_all[li],
            ks_all[li] if ks_all is not None else None,
            vs_all[li] if vs_all is not None else None,
            x, positions, write_pos, cfg, causal, active=active)
        ck_all = jax.lax.dynamic_update_index_in_dim(ck_all, ck, li, 0)
        cv_all = jax.lax.dynamic_update_index_in_dim(cv_all, cv, li, 0)
        if cks is not None:
            ks_all = jax.lax.dynamic_update_index_in_dim(ks_all, cks, li, 0)
            vs_all = jax.lax.dynamic_update_index_in_dim(vs_all, cvs, li, 0)

    new_cache = {'k': ck_all, 'v': cv_all}
    if ks_all is not None:
        new_cache['k_scale'] = ks_all
        new_cache['v_scale'] = vs_all

    x = rms_norm(x, params['final_norm'], cfg.rms_eps)
    logits = qmatmul(x, params['lm_head'],
                     pallas=bool(getattr(cfg, 'use_pallas_matmul', False)))
    # lm_head may be padded for panel tiling (fuse_decode_params)
    return logits[..., :cfg.vocab_size].astype(jnp.float32), new_cache
