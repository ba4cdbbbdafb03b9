"""Quantization-aware training layers
(redesign of ppq/qat/core.py:1-102 — QConv1d/2d/3d + QATController).

The torch reference wraps nn.Conv modules with fake-quant on weights and
activations plus a calibration-mode switch. The JAX-native equivalent is a
set of flax linen modules whose fake-quant sites use the framework's
qfunction (same custom-vjp STE/LSQ math as the PTQ pipeline), plus a
QATController managing the calibrate→train mode flip and scale extraction.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    _HAS_FLAX = True
except Exception:                                      # pragma: no cover
    _HAS_FLAX = False

from .core import RoundingPolicy
from .quantization.qfunction import linear_fake_quant

CALIBRATE = 'calibrate'
TRAIN = 'train'


def _fake_quant_act(x, scale, bits=8):
    qmax = (1 << (bits - 1)) - 1
    return linear_fake_quant(x, scale, jnp.zeros_like(scale),
                             -qmax - 1, qmax,
                             RoundingPolicy.ROUND_HALF_EVEN)


def _fake_quant_weight(w, bits=8, channel_axis=None):
    """Per-channel symmetric weight fake-quant with on-the-fly scales (QAT
    weights move every step, so scales track the live range)."""
    qmax = (1 << (bits - 1)) - 1
    if channel_axis is not None:
        axes = tuple(i for i in range(w.ndim) if i != channel_axis)
        absmax = jnp.max(jnp.abs(w), axis=axes)
    else:
        absmax = jnp.max(jnp.abs(w))
    scale = jnp.maximum(absmax / qmax, 1e-8)
    return linear_fake_quant(w, scale, jnp.zeros_like(scale),
                             -qmax - 1, qmax,
                             RoundingPolicy.ROUND_HALF_EVEN, channel_axis)


if _HAS_FLAX:

    class QATState(nn.Module):
        """Mixin-free helper: activation scale as trainable LSQ parameter,
        with running-absmax calibration in CALIBRATE mode."""

        @staticmethod
        def act_quant(module, x, mode: str, bits: int = 8):
            qmax = (1 << (bits - 1)) - 1
            absmax = module.variable(
                'qat_stats', 'absmax',
                lambda: jnp.asarray(0.0, jnp.float32))
            scale = module.param(
                'act_scale', lambda key: jnp.asarray(1.0, jnp.float32))
            if mode == CALIBRATE:
                absmax.value = jnp.maximum(absmax.value,
                                           jnp.max(jnp.abs(x)))
                return x
            # train/eval: LSQ-trainable scale (seeded from calibration by
            # QATController.seed_scales)
            return _fake_quant_act(x, jnp.maximum(scale, 1e-8), bits)

    class QConv(nn.Module):
        """Quantized conv (reference QConv1d/2d/3d, qat/core.py:18-60).

        NHWC layout (TPU-native); weight per-out-channel fake-quant, input
        activation fake-quant with trainable scale.
        """

        features: int
        kernel_size: Tuple[int, ...] = (3, 3)
        strides: Optional[Tuple[int, ...]] = None
        padding: str = 'SAME'
        bits: int = 8
        mode: str = TRAIN

        @nn.compact
        def __call__(self, x):
            x = QATState.act_quant(self, x, self.mode, self.bits)
            conv = nn.Conv(self.features, self.kernel_size,
                           strides=self.strides, padding=self.padding,
                           use_bias=True, name='conv')
            # fake-quant the kernel around the underlying conv apply
            def fq_kernel(m, *args, **kw):
                return m(*args, **kw)
            y = conv(x)
            # re-apply with quantized kernel: flax keeps params in scope
            kernel = self.get_variable('params', 'conv')['kernel']
            bias = self.get_variable('params', 'conv')['bias']
            kq = _fake_quant_weight(kernel, self.bits,
                                    channel_axis=kernel.ndim - 1)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kq.shape, ('NHWC', 'HWIO', 'NHWC'))
            strides = self.strides or (1,) * len(self.kernel_size)
            y = jax.lax.conv_general_dilated(
                x, kq, window_strides=strides, padding=self.padding,
                dimension_numbers=dn) + bias
            return y

    class QDense(nn.Module):
        """Quantized dense layer."""

        features: int
        bits: int = 8
        mode: str = TRAIN

        @nn.compact
        def __call__(self, x):
            x = QATState.act_quant(self, x, self.mode, self.bits)
            kernel = self.param(
                'kernel', nn.initializers.lecun_normal(),
                (x.shape[-1], self.features))
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,))
            kq = _fake_quant_weight(kernel, self.bits, channel_axis=1)
            return jnp.matmul(x, kq) + bias


class QATController:
    """Mode management + calibration seeding
    (reference qat/core.py QATController + ENABLE_CALIBRATION ctx)."""

    def __init__(self, bits: int = 8):
        self.bits = bits

    def calibrate(self, apply_fn, variables, batches) -> dict:
        """Run batches in CALIBRATE mode collecting absmax stats; returns
        variables with act_scale params seeded from the stats."""
        qat_stats = variables.get('qat_stats', {})
        for batch in batches:
            _, mutated = apply_fn(variables, batch, mutable=['qat_stats'])
            qat_stats = mutated['qat_stats']
            variables = {**variables, 'qat_stats': qat_stats}
        return self.seed_scales(variables)

    def seed_scales(self, variables) -> dict:
        qmax = (1 << (self.bits - 1)) - 1

        def walk(params, stats):
            out = {}
            for k, v in params.items():
                if isinstance(v, dict):
                    out[k] = walk(v, stats.get(k, {})) \
                        if isinstance(stats, dict) else v
                elif k == 'act_scale' and isinstance(stats, dict) \
                        and 'absmax' in stats:
                    out[k] = jnp.maximum(stats['absmax'] / qmax, 1e-8)
                else:
                    out[k] = v
            return out

        params = variables.get('params', {})
        stats = variables.get('qat_stats', {})
        return {**variables, 'params': walk(params, stats)}
