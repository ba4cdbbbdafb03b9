"""Sharded quantization-aware training step (DP x TP over a device mesh).

The quantization framework's 'training' is blockwise/graphwise finetuning of
weights and quant scales (LSQ, AdaRound, bias correction) against fp32
reference outputs. This module compiles that step over a Mesh: batch sharded
over 'dp', large weights over 'tp', gradients psum-reduced by XLA's sharding
propagation — no hand-written collectives (SURVEY.md §5 distributed-comm
design note).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..executor.compile import CompiledGraph
from .mesh import (batch_sharding, replicate, shard_qparams,
                   tp_param_shardings)


def make_sharded_train_step(cg: CompiledGraph, mesh,
                            lr: float = 1e-4,
                            train_weights: bool = True,
                            train_scales: bool = True
                            ) -> Tuple[Callable, Dict]:
    """Build a jitted DP×TP training step minimizing MSE between the
    quantized forward and provided fp32 target outputs.

    Returns (step, state) where
      step(state, batch, target) -> (state, loss)
      state = {'params', 'qparams', 'opt'}
    All arrays in state are placed with their mesh shardings; batch/target
    must be fed with the 'dp' batch sharding (see parallel.mesh).
    """
    fwd = cg.build_trainable_forward()
    input_name = list(cg.graph.inputs.keys())[0]

    params = cg.init_params()
    qparams = cg.init_qparams()
    p_shard = tp_param_shardings(params, mesh)
    q_shard = shard_qparams(qparams, mesh)

    params = jax.tree.map(lambda v, s: jax.device_put(v, s), params, p_shard)
    qparams = jax.tree.map(lambda v, s: jax.device_put(v, s), qparams, q_shard,
                           is_leaf=lambda x: not isinstance(x, dict))

    opt = optax.adam(lr)

    def loss_fn(trainable, frozen, x, target):
        p = trainable.get('params', frozen.get('params'))
        q = trainable.get('qparams', frozen.get('qparams'))
        out = fwd(p, q, {input_name: x})[0]
        return jnp.mean((out - target) ** 2)

    trainable0 = {}
    frozen0 = {}
    (trainable0 if train_weights else frozen0)['params'] = params
    (trainable0 if train_scales else frozen0)['qparams'] = qparams
    opt_state = opt.init(trainable0)

    @jax.jit
    def step(state, x, target):
        trainable, frozen, opt_state = (state['trainable'], state['frozen'],
                                        state['opt'])
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, x, target)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return {'trainable': trainable, 'frozen': frozen,
                'opt': opt_state}, loss

    state = {'trainable': trainable0, 'frozen': frozen0, 'opt': opt_state}
    return step, state


def shard_batch(mesh, x):
    """Place a host batch with its dp sharding."""
    return jax.device_put(jnp.asarray(x), batch_sharding(mesh, jnp.ndim(x)))
