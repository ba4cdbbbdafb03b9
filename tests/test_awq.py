"""AWQ weight-only quantization for the serving engine (serving/awq.py):
gamma-folding exactness, logits-error reduction vs plain quantization on
outlier activations, end-to-end generation."""

import numpy as np
import pytest

import jax.numpy as jnp

from ppq_tpu.serving import (LlamaConfig, ServingEngine,
                             awq_quantize_llama_params,
                             init_llama_params, quantize_llama_params)
from ppq_tpu.serving.engine import Request
from ppq_tpu.serving.model import forward, init_kv_cache


def _cfg(bits=4, **kw):
    base = dict(vocab_size=97, d_model=64, n_layers=2, n_heads=4,
                n_kv_heads=2, d_ff=128, max_seq_len=64, max_batch=2,
                weight_bits=bits, prefill_buckets=(16,))
    base.update(kw)
    return LlamaConfig(**base)


def _outlier_params(cfg, seed=0, boost=20.0, channels=(3, 17, 40)):
    """Float tree with a few HUGE embedding channels — the activation
    outliers AWQ exists for (every layer's norm output inherits them)."""
    fp = init_llama_params(cfg, seed=seed, quantized=False)
    emb = np.asarray(fp['embed'], np.float32)
    emb[:, list(channels)] *= boost
    fp = dict(fp)
    fp['embed'] = jnp.asarray(emb)
    return fp


def _logits(params, cfg, toks):
    cache = init_kv_cache(cfg, toks.shape[0])
    B, T = toks.shape
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    logits, _ = forward(params, cache, jnp.asarray(toks), pos,
                        jnp.zeros((B,), jnp.int32),
                        jnp.full((B,), T, jnp.int32), cfg)
    return np.asarray(logits, np.float32)


def test_awq_reduces_int4_logits_error_on_outliers():
    cfg = _cfg(bits=4)
    fp = _outlier_params(cfg)
    rng = np.random.RandomState(0)
    calib = rng.randint(1, 96, (4, 16)).astype(np.int32)
    test = rng.randint(1, 96, (2, 12)).astype(np.int32)

    ref = _logits(fp, cfg, test)
    e_plain = np.mean((_logits(quantize_llama_params(fp, cfg), cfg, test)
                       - ref) ** 2)
    awq = awq_quantize_llama_params(fp, cfg, calib)
    e_awq = np.mean((_logits(awq, cfg, test) - ref) ** 2)
    assert e_awq < e_plain * 0.9, (e_awq, e_plain)


def test_awq_gamma_fold_is_exact_at_16bit():
    """With quantization OFF (16-bit path keeps bf16 weights), the
    gamma/weight rebalancing must be numerically neutral — the fold is
    an identity transform, not an approximation."""
    cfg = _cfg(bits=16)
    fp = _outlier_params(cfg, seed=1)
    rng = np.random.RandomState(1)
    calib = rng.randint(1, 96, (2, 12)).astype(np.int32)
    test = rng.randint(1, 96, (2, 10)).astype(np.int32)
    ref = _logits(fp, cfg, test)
    folded = awq_quantize_llama_params(fp, cfg, calib)
    got = _logits(folded, cfg, test)
    scale = max(1.0, float(np.abs(ref).max()))
    assert float(np.abs(got - ref).max()) < 5e-2 * scale


def test_awq_engine_generates():
    cfg = _cfg(bits=4)
    fp = _outlier_params(cfg, seed=2)
    rng = np.random.RandomState(2)
    calib = rng.randint(1, 96, (2, 16)).astype(np.int32)
    params = awq_quantize_llama_params(fp, cfg, calib)
    eng = ServingEngine(cfg, params)
    reqs = [Request(0, [3, 1, 4, 1, 5], max_new_tokens=4)]
    eng.run(reqs)
    assert reqs[0].done and len(reqs[0].generated) == 4


# ------------------------------------------------------------- GPTQ -------

def test_gptq_reduces_int4_logits_error():
    """GPTQ's Hessian error compensation must beat round-to-nearest at
    the same scales on the logits objective. Hessian compensation only
    has room when inputs are CORRELATED (H non-diagonal) — real
    embeddings are low-rank-ish, so the test model uses a rank-8
    embedding (an isotropic random embedding makes H ~ diagonal and
    GPTQ degenerates to RTN by construction)."""
    from ppq_tpu.serving import gptq_quantize_llama_params
    cfg = _cfg(bits=4)
    rng = np.random.RandomState(3)
    fp = dict(init_llama_params(cfg, seed=3, quantized=False))
    lowrank = (rng.randn(cfg.vocab_size, 8) @
               rng.randn(8, cfg.d_model)).astype(np.float32) * 0.3
    fp['embed'] = jnp.asarray(lowrank)
    calib = rng.randint(1, 96, (4, 16)).astype(np.int32)
    test = rng.randint(1, 96, (2, 12)).astype(np.int32)
    ref = _logits(fp, cfg, test)
    e_rtn = np.mean((_logits(
        quantize_llama_params(fp, cfg, method='mse'), cfg, test)
        - ref) ** 2)
    gptq = gptq_quantize_llama_params(fp, cfg, calib)
    e_gptq = np.mean((_logits(gptq, cfg, test) - ref) ** 2)
    assert e_gptq < e_rtn, (e_gptq, e_rtn)


def test_gptq_linear_beats_round_to_nearest():
    """Direct objective check on one linear: ||XW - X Q(W)||^2 under the
    calibration inputs is LOWER with GPTQ than round-to-nearest at the
    same scales."""
    from ppq_tpu.serving.gptq import gptq_quantize_linear
    from ppq_tpu.serving.model import quantize_weight, _unpack_int4
    rng = np.random.RandomState(0)
    din, dout, n = 64, 48, 256
    # correlated inputs: where Hessian compensation actually matters
    base = rng.randn(n, 8).astype(np.float32)
    xs = base @ rng.randn(8, din).astype(np.float32) \
        + 0.1 * rng.randn(n, din).astype(np.float32)
    w = rng.randn(din, dout).astype(np.float32)

    def recon(d):
        q = np.asarray(_unpack_int4(d['w_packed']), np.float32) \
            if 'w_packed' in d else np.asarray(d['w_int'], np.float32)
        return q * np.asarray(d['scale'])

    rtn = recon(quantize_weight(w, 4, method='mse'))
    gpt = recon(gptq_quantize_linear(w, xs, 4))
    e_rtn = np.mean((xs @ rtn - xs @ w) ** 2)
    e_gpt = np.mean((xs @ gpt - xs @ w) ** 2)
    assert e_gpt < e_rtn * 0.9, (e_gpt, e_rtn)


def test_gptq_engine_generates():
    from ppq_tpu.serving import gptq_quantize_llama_params
    cfg = _cfg(bits=4)
    fp = _outlier_params(cfg, seed=4)
    rng = np.random.RandomState(4)
    params = gptq_quantize_llama_params(fp, cfg,
                                        rng.randint(1, 96, (2, 16)))
    eng = ServingEngine(cfg, params)
    reqs = [Request(0, [8, 6, 7], max_new_tokens=4)]
    eng.run(reqs)
    assert reqs[0].done and len(reqs[0].generated) == 4


# ------------------------------------------------------- SmoothQuant ------

def test_smoothquant_reduces_w8a8_logits_error():
    """With W8A8 activations (cfg.act_bits=8) and outlier activation
    channels, SmoothQuant's outlier migration must reduce logits error
    vs quantizing the unsmoothed weights."""
    from ppq_tpu.serving import smoothquant_llama_params
    cfg = _cfg(bits=8, act_bits=8)
    fp = _outlier_params(cfg, seed=5, boost=25.0)
    rng = np.random.RandomState(5)
    calib = rng.randint(1, 96, (4, 16)).astype(np.int32)
    test = rng.randint(1, 96, (2, 12)).astype(np.int32)

    cfg_ref = _cfg(bits=16)                    # bf16 weights + acts
    ref = _logits(fp, cfg_ref, test)
    plain = quantize_llama_params(fp, cfg, method='mse')
    e_plain = np.mean((_logits(plain, cfg, test) - ref) ** 2)
    sq = smoothquant_llama_params(fp, cfg, calib, alpha=0.5)
    e_sq = np.mean((_logits(sq, cfg, test) - ref) ** 2)
    assert e_sq < e_plain, (e_sq, e_plain)


def test_smoothquant_engine_generates_w8a8():
    from ppq_tpu.serving import smoothquant_llama_params
    cfg = _cfg(bits=8, act_bits=8)
    fp = _outlier_params(cfg, seed=6)
    rng = np.random.RandomState(6)
    params = smoothquant_llama_params(fp, cfg,
                                      rng.randint(1, 96, (2, 16)))
    eng = ServingEngine(cfg, params)
    reqs = [Request(0, [11, 22, 33], max_new_tokens=4)]
    eng.run(reqs)
    assert reqs[0].done and len(reqs[0].generated) == 4
