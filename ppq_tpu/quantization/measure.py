"""Similarity / error metrics (reference: ppq/quantization/measure/)."""

from __future__ import annotations

import jax.numpy as jnp


def _flatten_batch(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 0:
        return x.reshape(1, 1)
    return x.reshape(x.shape[0], -1)


def torch_mean_square_error(a, b, reduction: str = 'mean') -> jnp.ndarray:
    """(measure/norm.py:3)"""
    a, b = _flatten_batch(a), _flatten_batch(b)
    mse = jnp.mean((a - b) ** 2, axis=-1)
    return jnp.mean(mse) if reduction == 'mean' else mse


def torch_snr_error(pred, real, reduction: str = 'mean') -> jnp.ndarray:
    """Noise-to-signal power ratio per sample (measure/norm.py:52);
    lower is better, 0 = identical."""
    pred, real = _flatten_batch(pred), _flatten_batch(real)
    noise = jnp.sum((pred - real) ** 2, axis=-1)
    signal = jnp.sum(real ** 2, axis=-1) + 1e-7
    snr = noise / signal
    return jnp.mean(snr) if reduction == 'mean' else snr


def torch_cosine_similarity(a, b, reduction: str = 'mean') -> jnp.ndarray:
    """(measure/cosine.py:6)"""
    a, b = _flatten_batch(a), _flatten_batch(b)
    num = jnp.sum(a * b, axis=-1)
    den = (jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)) + 1e-7
    cos = num / den
    return jnp.mean(cos) if reduction == 'mean' else cos


def torch_KL_divergence(p, q, eps: float = 1e-7) -> jnp.ndarray:
    """(measure/statistic.py:3)"""
    p, q = _flatten_batch(p), _flatten_batch(q)
    p = p / (jnp.sum(p, axis=-1, keepdims=True) + eps)
    q = q / (jnp.sum(q, axis=-1, keepdims=True) + eps)
    return jnp.mean(jnp.sum(p * jnp.log((p + eps) / (q + eps)), axis=-1))


# aliases without the legacy torch_ prefix
mean_square_error = torch_mean_square_error
snr_error = torch_snr_error
cosine_similarity = torch_cosine_similarity
kl_divergence = torch_KL_divergence
