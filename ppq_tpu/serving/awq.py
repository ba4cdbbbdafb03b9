"""Activation-aware weight quantization (AWQ) for the serving engine.

Weight-only int4/int8 error is dominated by the channels where LARGE
activations meet quantization noise: quantizing w alone minimizes
||w - Q(w)|| when what matters is ||x @ w - x @ Q(w)||. AWQ (Lin et al.,
2023 — public method) rebalances per-INPUT-channel: scale weights up by
s and activations down by 1/s before quantizing, with s derived from the
calibration activations' channel magnitudes. The 1/s on activations is
FREE at runtime here because every affected linear group reads an
rms_norm output with a learnable per-channel gamma — s folds into gamma
exactly (no extra op, bf16 math identical up to rounding):

    rms(x) * (gamma / s)  @  Q(w * s[:, None])   ==  rms(x)*gamma @ w

Groups: {wq, wk, wv} share attn_norm's gamma; {w_gate, w_up} share
mlp_norm's. The per-group exponent alpha in s = m^alpha (m = channel
abs-mean) is grid-searched on the REAL objective — the group's linear
output reconstruction error on captured activations. wo / w_down have no
preceding foldable affine and keep plain (mse) quantization.

No reference analogue (PPQ has no LLM weight-only pipeline); composes
with quantize_weight's per-output-channel mse scale search.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig
from .model import (Params, mlp, qmatmul, quantize_weight, rms_norm,
                    rope_apply, rope_tables)


def capture_norm_inputs(params: Params, cfg: LlamaConfig, tokens,
                        full: bool = False
                        ) -> List[Dict[str, np.ndarray]]:
    """Run a float forward over a (B, T) token sample and capture each
    layer's attn_norm / mlp_norm OUTPUTS (the linear groups' inputs).
    Causal within the window (prefill semantics, no cache).

    full=True additionally captures the wo input ('ctx': attention
    context) and the w_down input ('act': silu(gate)*up) — GPTQ needs
    every linear's input statistics, not just the foldable groups."""
    B, T = tokens.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    x = params['embed'][jnp.asarray(tokens)]
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                 (B, T))
    r_cos, r_sin = rope_tables(positions, cfg.rope_theta, Dh)
    causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])
    caps = []
    for layer in params['layers']:
        h = rms_norm(x, layer['attn_norm'], cfg.rms_eps)
        cap = {'attn': np.asarray(h, np.float32).reshape(-1, x.shape[-1])}
        q = qmatmul(h, layer['wq']).reshape(B, T, H, Dh)
        k = qmatmul(h, layer['wk']).reshape(B, T, KV, Dh)
        v = qmatmul(h, layer['wv']).reshape(B, T, KV, Dh)
        q = rope_apply(q, r_cos, r_sin)
        k = rope_apply(k, r_cos, r_sin)
        qg = q.reshape(B, T, KV, rep, Dh)
        s = jnp.einsum('btkrd,bjkd->bkrtj', qg, k,
                       preferred_element_type=jnp.float32)
        s = jnp.where(causal[None, None, None],
                      s / np.sqrt(Dh), -1e30)
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum('bkrtj,bjkd->btkrd', p.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, T, H * Dh).astype(x.dtype)
        if full:
            cap['ctx'] = np.asarray(ctx, np.float32).reshape(-1,
                                                             H * Dh)
        x = x + qmatmul(ctx, layer['wo'])
        h = rms_norm(x, layer['mlp_norm'], cfg.rms_eps)
        cap['mlp'] = np.asarray(h, np.float32).reshape(-1, x.shape[-1])
        if full:
            g = qmatmul(h, layer['w_gate'])
            u = qmatmul(h, layer['w_up'])
            act = jax.nn.silu(g.astype(jnp.float32)) * u
            cap['act'] = np.asarray(act, np.float32).reshape(
                -1, act.shape[-1])
        x = x + mlp(h, layer, cfg)
        caps.append(cap)
    return caps


def _group_scale(xs: np.ndarray, weights: List[np.ndarray], bits: int,
                 alphas=(0.0, 0.25, 0.5, 0.75, 1.0),
                 max_rows: int = 512) -> Tuple[np.ndarray, float]:
    """Grid-search s = m^alpha minimizing the group's output
    reconstruction error sum_w ||(x/s) @ Q(w*s) - x @ w||^2."""
    if xs.shape[0] > max_rows:
        xs = xs[np.linspace(0, xs.shape[0] - 1, max_rows).astype(int)]
    m = np.abs(xs).mean(axis=0) + 1e-8                  # (D,)
    m = m / np.exp(np.mean(np.log(m)))                  # geo-mean 1
    qmax = (1 << (bits - 1)) - 1

    def recon(w):
        absmax = np.maximum(np.abs(w).max(axis=0), 1e-8)
        sc = absmax / qmax
        return np.clip(np.round(w / sc), -qmax - 1, qmax) * sc

    best_s, best_err, best_a = np.ones_like(m), np.inf, 0.0
    for a in alphas:
        s = m ** a
        err = 0.0
        for w in weights:
            ref = xs @ w
            got = (xs / s) @ recon(w * s[:, None])
            err += float(np.mean((got - ref) ** 2))
        if err < best_err:
            best_s, best_err, best_a = s, err, a
    return best_s.astype(np.float32), best_a


def awq_quantize_llama_params(params_fp: Params, cfg: LlamaConfig,
                              tokens: np.ndarray,
                              alphas=(0.0, 0.25, 0.5, 0.75, 1.0)
                              ) -> Params:
    """AWQ-fold and quantize a FLOAT param tree (init_llama_params
    quantized=False layout: every linear is {'w': bf16}).

    tokens: (B, T) int32 calibration sample. Returns a quantized tree in
    the engine's standard format (scales folded into the norm gammas —
    runtime cost is zero; wo/w_down use plain mse quantization)."""
    caps = capture_norm_inputs(params_fp, cfg, tokens)
    bits = cfg.weight_bits
    out = dict(params_fp)
    layers = []
    for layer, cap in zip(params_fp['layers'], caps):
        lay = dict(layer)
        for key, gamma_key, wkeys in (
                ('attn', 'attn_norm', ('wq', 'wk', 'wv')),
                ('mlp', 'mlp_norm', ('w_gate', 'w_up'))):
            if not all(k in lay and 'w' in lay[k] for k in wkeys):
                continue
            ws = [np.asarray(lay[k]['w'], np.float32) for k in wkeys]
            s, _ = _group_scale(cap[key], ws, bits, alphas)
            lay[gamma_key] = jnp.asarray(
                np.asarray(lay[gamma_key], np.float32) / s)
            for k, w in zip(wkeys, ws):
                lay[k] = quantize_weight(w * s[:, None], bits,
                                         method='mse')
        for k in ('wo', 'w_down'):
            if k in lay and 'w' in lay[k]:
                lay[k] = quantize_weight(
                    np.asarray(lay[k]['w'], np.float32), bits,
                    method='mse')
        layers.append(lay)
    out['layers'] = layers
    if 'w' in out['lm_head']:
        out['lm_head'] = quantize_weight(
            np.asarray(out['lm_head']['w'], np.float32),
            cfg.resolved_lm_head_bits, method='mse')
    return out


def smoothquant_llama_params(params_fp: Params, cfg: LlamaConfig,
                             tokens: np.ndarray,
                             alpha: float = 0.5) -> Params:
    """SmoothQuant (Xiao et al., 2022 — public method) for the W8A8
    path (cfg.act_bits == 8): migrate activation outliers into the
    weights with s_j = max|X_j|^alpha / max|W_j|^(1-alpha), folded
    exactly into the preceding rms_norm gamma (same zero-cost fold as
    AWQ — the difference is the objective: AWQ protects WEIGHT
    quantization, SmoothQuant balances ACTIVATION quantization
    difficulty against it). Weights then quantize with the mse scale
    search; wo/w_down have no foldable predecessor and quantize plain.
    """
    caps = capture_norm_inputs(params_fp, cfg, tokens)
    bits = cfg.weight_bits
    out = dict(params_fp)
    layers = []
    for layer, cap in zip(params_fp['layers'], caps):
        lay = dict(layer)
        for key, gamma_key, wkeys in (
                ('attn', 'attn_norm', ('wq', 'wk', 'wv')),
                ('mlp', 'mlp_norm', ('w_gate', 'w_up'))):
            if not all(k in lay and 'w' in lay[k] for k in wkeys):
                continue
            xs = cap[key]
            ws = [np.asarray(lay[k]['w'], np.float32) for k in wkeys]
            x_max = np.abs(xs).max(axis=0) + 1e-8              # (D,)
            w_max = np.max([np.abs(w).max(axis=1) for w in ws],
                           axis=0) + 1e-8                      # (D,)
            s = (x_max ** alpha) / (w_max ** (1.0 - alpha))
            s = np.maximum(s / np.exp(np.mean(np.log(s))), 1e-4)
            lay[gamma_key] = jnp.asarray(
                np.asarray(lay[gamma_key], np.float32) / s)
            for k, w in zip(wkeys, ws):
                lay[k] = quantize_weight(w * s[:, None], bits,
                                         method='mse')
        for k in ('wo', 'w_down'):
            if k in lay and 'w' in lay[k]:
                lay[k] = quantize_weight(
                    np.asarray(lay[k]['w'], np.float32), bits,
                    method='mse')
        layers.append(lay)
    out['layers'] = layers
    if 'w' in out['lm_head']:
        out['lm_head'] = quantize_weight(
            np.asarray(out['lm_head']['w'], np.float32),
            cfg.resolved_lm_head_bits, method='mse')
    return out
