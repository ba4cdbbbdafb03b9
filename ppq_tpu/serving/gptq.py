"""GPTQ weight-only quantization for the serving engine.

GPTQ (Frantar et al., 2022 — public method) quantizes each linear's
weight columns sequentially under the layer's input second-moment
(Hessian H = X^T X): after rounding input-row i, the residual is
propagated into the not-yet-quantized rows through H^-1, so the LAYER
OUTPUT error — not the weight error — is what gets minimized. Per-output
-channel scales come from quantize_weight's grid search ('mse') and stay
fixed through the sweep, so the result drops straight into the engine's
standard {w_int|w_packed, scale} format (and the int4 Pallas qmm path).

Composes with the AWQ gamma-fold (serving/awq.py): fold first, then
GPTQ the rebalanced weights with the rebalanced activations.

No reference analogue (PPQ has no LLM weight-only pipeline).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig
from .awq import capture_norm_inputs
from .model import Params, quantize_weight


def gptq_quantize_linear(w: np.ndarray, xs: np.ndarray, bits: int,
                         percdamp: float = 0.01,
                         scale_method: str = 'mse') -> Dict:
    """GPTQ one linear. w: (in, out); xs: (N, in) calibration inputs.
    Returns the engine weight dict ({w_int|w_packed, scale})."""
    w = np.asarray(w, np.float64).copy()
    din = w.shape[0]
    qmax = (1 << (bits - 1)) - 1

    # fixed per-output-channel scales from the original weights
    ref = quantize_weight(np.asarray(w, np.float32), bits,
                          method=scale_method)
    scale = np.asarray(ref['scale'], np.float64)          # (out,)

    H = (xs.astype(np.float64).T @ xs.astype(np.float64))
    H /= max(1, xs.shape[0])
    # dead inputs (H_ii = 0) can't be compensated — pin them
    dead = np.diag(H) == 0
    H[dead, dead] = 1.0
    w[dead, :] = 0.0
    H[np.diag_indices(din)] += percdamp * float(np.mean(np.diag(H)))

    # Hinv's UPPER Cholesky factor (standard GPTQ recurrence):
    # L L^T = inv(H) → U = L^T satisfies U^T U = inv(H)
    Hinv = np.linalg.cholesky(np.linalg.inv(H)).T

    q_all = np.zeros_like(w)
    for i in range(din):
        d = Hinv[i, i]
        qi = np.clip(np.round(w[i] / scale), -qmax - 1, qmax)
        q_all[i] = qi
        err = (w[i] - qi * scale) / d
        if i + 1 < din:
            w[i + 1:] -= np.outer(Hinv[i, i + 1:], err)

    q8 = q_all.astype(np.int8)
    if bits == 4:
        from ..kernels.qmm import pack_int4_splithalf
        return {'w_packed': jnp.asarray(pack_int4_splithalf(q8)),
                'scale': jnp.asarray(scale.astype(np.float32))}
    return {'w_int': jnp.asarray(q8),
            'scale': jnp.asarray(scale.astype(np.float32))}


def gptq_quantize_llama_params(params_fp: Params, cfg: LlamaConfig,
                               tokens: np.ndarray,
                               percdamp: float = 0.01,
                               max_rows: int = 1024) -> Params:
    """GPTQ a FLOAT param tree (init_llama_params quantized=False
    layout) against a (B, T) calibration token sample. Every layer
    linear is quantized under ITS OWN captured input Hessian; lm_head
    uses plain mse quantization (its input spans the whole final-norm
    distribution and the sweep gains little there)."""
    caps = capture_norm_inputs(params_fp, cfg, tokens, full=True)
    bits = cfg.weight_bits
    out = dict(params_fp)
    layers: List[Dict] = []
    for layer, cap in zip(params_fp['layers'], caps):
        lay = dict(layer)
        groups = (('attn', ('wq', 'wk', 'wv')), ('ctx', ('wo',)),
                  ('mlp', ('w_gate', 'w_up')), ('act', ('w_down',)))
        for key, wkeys in groups:
            xs = cap[key]
            if xs.shape[0] > max_rows:
                xs = xs[np.linspace(0, xs.shape[0] - 1,
                                    max_rows).astype(int)]
            for k in wkeys:
                if k in lay and 'w' in lay[k]:
                    lay[k] = gptq_quantize_linear(
                        np.asarray(lay[k]['w'], np.float32), xs, bits,
                        percdamp=percdamp)
        layers.append(lay)
    out['layers'] = layers
    if 'w' in out['lm_head']:
        out['lm_head'] = quantize_weight(
            np.asarray(out['lm_head']['w'], np.float32),
            cfg.resolved_lm_head_bits, method='mse')
    return out
