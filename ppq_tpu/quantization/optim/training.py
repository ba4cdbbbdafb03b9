"""Training-based optimization passes: bias correction, LSQ, AdaRound
(redesign of ppq/quantization/optim/training.py + legacy.py).

All finetuning is blockwise (BlockBuilder) and compiles each block's fwd+bwd
into ONE jitted XLA program (CompiledGraph op_span mode) — the TPU-native
replacement for the reference's partial_graph_forward interpreter loop
(executor/torch.py:654) + CUDA LSQ kernels (csrc/cuda/train.cu).

Protocol per block (reference training.py:569-864):
  1. cache the block's quantized inputs and fp32 reference outputs over the
     calibration set (two compiled sweeps for ALL blocks at once);
  2. optimize {weights, quant scales} (LSQ) or {rounding direction}
     (AdaRound) against MSE to the fp32 outputs;
  3. accept the update only if the block loss improved (check/rollback,
     reference TrainingBasedPass.check training.py:62-120).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...core import (COMPUTING_OP, QuantizationStates, ppq_info, ppq_warning)
from ...executor.compile import CompiledGraph
from ...ir import BaseGraph, QuantableOperation
from ..algorithm.blocks import BlockBuilder, TrainableBlock
from .base import QuantizationOptimizationPass


def _batches(dataloader, collate_fn, limit):
    n = 0
    for batch in dataloader:
        if collate_fn is not None:
            batch = collate_fn(batch)
        yield batch
        n += 1
        if n >= limit:
            break


class _unbaked_parameters:
    """Context: temporarily restore BAKED/PASSIVE_BAKED parameters to their
    fp32 values with live (ACTIVATED/PASSIVE) configs, re-baking on exit.

    Training passes may legally run after ParameterBakingPass (manop flows);
    training must see quantization applied at runtime — and any weight the
    pass writes must flow into the fp32 shadows so exporters re-quantize
    the *trained* values (stale shadows broke the deploy==sim guarantee).
    """

    def __init__(self, graph: BaseGraph):
        self.graph = graph
        self.had_baked = False

    def __enter__(self):
        for op in self.graph.operations.values():
            if not isinstance(op, QuantableOperation):
                continue
            for var, cfg in zip(op.inputs,
                                op.config.input_quantization_config):
                if not var.is_parameter:
                    continue
                if cfg.state == QuantizationStates.BAKED:
                    if var.name in op._fp32_params:
                        var.value = np.array(op._fp32_params[var.name],
                                             copy=True)
                    cfg.state = QuantizationStates.ACTIVATED
                    self.had_baked = True
                elif cfg.state == QuantizationStates.PASSIVE_BAKED:
                    if var.name in op._fp32_params:
                        var.value = np.array(op._fp32_params[var.name],
                                             copy=True)
                    cfg.state = QuantizationStates.PASSIVE
                    self.had_baked = True
        return self

    def __exit__(self, *exc):
        if self.had_baked:
            from .baking import ParameterBakingPass
            ParameterBakingPass().optimize(self.graph)


def _sync_fp32_shadow(graph: BaseGraph, var_name: str, value: np.ndarray):
    """Write a trained parameter into the IR and its owners' fp32 shadows."""
    var = graph.variables[var_name]
    var.value = np.asarray(value)
    for dest in var.dest_ops:
        if isinstance(dest, QuantableOperation) and \
                var_name in dest._fp32_params:
            dest._fp32_params[var_name] = np.array(var.value, copy=True)


def _feed(graph: BaseGraph, batch) -> dict:
    names = list(graph.inputs.keys())
    if isinstance(batch, dict):
        return batch
    if isinstance(batch, (list, tuple)):
        return dict(zip(names, batch))
    return {names[0]: batch}


class TrainingBasedPass(QuantizationOptimizationPass):
    """Shared machinery (reference optim/training.py:18)."""

    def __init__(self, name: str, block_size: int = 4, steps: int = 500,
                 lr: float = 1e-4, calib_steps: int = 8):
        super().__init__(name)
        self.block_size = block_size
        self.steps = steps
        self.lr = lr
        self.calib_steps = calib_steps

    # ---------------------------------------------------------- data caches
    def collect_caches(self, graph: BaseGraph, blocks: List[TrainableBlock],
                       dataloader, collate_fn
                       ) -> Tuple[List[dict], List[dict]]:
        """Two compiled sweeps: quantized values of every block input,
        fp32 (dequantized graph) values of every block output."""
        in_names = sorted({n for b in blocks for n in b.input_names})
        out_names = sorted({n for b in blocks for n in b.output_names})

        qt_cache: List[dict] = []
        cg_q = CompiledGraph(graph, output_names=in_names)
        fwd_q = cg_q.build_forward()
        params = cg_q.init_params()
        for batch in _batches(dataloader, collate_fn, self.calib_steps):
            vals = fwd_q(params, _feed(graph, batch))
            qt_cache.append({n: np.asarray(v)
                             for n, v in zip(in_names, vals)})

        # fp32 reference: disable quantization graph-wide, run, restore
        from ...ir import dequantize_graph, restore_graph_quantization
        dequantize_graph(graph)
        try:
            cg_f = CompiledGraph(graph, output_names=out_names)
            fwd_f = cg_f.build_forward()
            params_f = cg_f.init_params()
            fp_cache: List[dict] = []
            for batch in _batches(dataloader, collate_fn, self.calib_steps):
                vals = fwd_f(params_f, _feed(graph, batch))
                fp_cache.append({n: np.asarray(v)
                                 for n, v in zip(out_names, vals)})
        finally:
            restore_graph_quantization(graph)
        return qt_cache, fp_cache

    @staticmethod
    def block_loss(fwd, params, qparams, block: TrainableBlock,
                   qt_cache, fp_cache) -> float:
        total = 0.0
        for qt, fp in zip(qt_cache, fp_cache):
            outs = fwd(params, qparams,
                       {n: jnp.asarray(qt[n]) for n in block.input_names})
            for name, out in zip(block.output_names, outs):
                total += float(jnp.mean((out - jnp.asarray(fp[name])) ** 2))
        return total / max(len(qt_cache), 1)


class LearnedStepSizePass(TrainingBasedPass):
    """Blockwise LSQ finetuning (reference optim/training.py:569;
    Esser et al.). Trains weights and (optionally) quant scales of each
    block to minimize MSE vs the fp32 reference."""

    def __init__(self, block_size: int = 4, lr: float = 1e-5,
                 steps: int = 500, gamma: float = 0.0,
                 is_scale_trainable: bool = True, calib_steps: int = 8):
        super().__init__('Learned Step Size Pass (LSQ)', block_size, steps,
                         lr, calib_steps)
        self.gamma = gamma
        self.is_scale_trainable = is_scale_trainable

    def optimize(self, graph: BaseGraph, dataloader=None, executor=None,
                 collate_fn=None, **kwargs):
        assert dataloader is not None, 'LSQ requires a dataloader'
        blocks = BlockBuilder(graph).build(self.block_size)
        if not blocks:
            return
        with _unbaked_parameters(graph):
            qt_cache, fp_cache = self.collect_caches(graph, blocks,
                                                     dataloader, collate_fn)
            for block in blocks:
                self._finetune_block(graph, block, qt_cache, fp_cache)

    def _finetune_block(self, graph, block, qt_cache, fp_cache):
        cg = CompiledGraph(graph, op_span=block.rps,
                           input_names=block.input_names,
                           output_names=block.output_names)
        fwd = cg.build_trainable_forward()
        params0 = cg.init_params()
        qparams0 = cg.init_qparams()
        if not params0 and not qparams0:
            return
        pre_loss = self.block_loss(fwd, params0, qparams0, block,
                                   qt_cache, fp_cache)

        trainable0 = {'params': {k: v for k, v in params0.items()
                                 if jnp.issubdtype(v.dtype, jnp.floating)}}
        if self.is_scale_trainable:
            trainable0['qparams'] = qparams0
        frozen_params = {k: v for k, v in params0.items()
                         if k not in trainable0['params']}

        opt = optax.adam(self.lr)
        opt_state = opt.init(trainable0)

        def loss_fn(trainable, x_feed, targets):
            p = dict(frozen_params, **trainable['params'])
            q = trainable.get('qparams', qparams0)
            outs = fwd(p, q, x_feed)
            loss = 0.0
            for name, out in zip(block.output_names, outs):
                loss = loss + jnp.mean((out - targets[name]) ** 2)
            return loss

        @jax.jit
        def step(trainable, opt_state, x_feed, targets):
            loss, grads = jax.value_and_grad(loss_fn)(trainable, x_feed,
                                                      targets)
            updates, opt_state = opt.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss

        trainable = trainable0
        n_cache = len(qt_cache)
        for it in range(self.steps):
            qt = qt_cache[it % n_cache]
            fp = fp_cache[it % n_cache]
            x_feed = {n: jnp.asarray(qt[n]) for n in block.input_names}
            targets = {n: jnp.asarray(fp[n]) for n in block.output_names}
            trainable, opt_state, _ = step(trainable, opt_state, x_feed,
                                           targets)

        post_params = dict(frozen_params, **trainable['params'])
        post_qparams = trainable.get('qparams', qparams0)
        post_loss = self.block_loss(fwd, post_params, post_qparams, block,
                                    qt_cache, fp_cache)
        if post_loss < pre_loss:   # accept (reference check, training.py:115)
            for name, value in trainable['params'].items():
                _sync_fp32_shadow(graph, name, np.asarray(value))
            if self.is_scale_trainable:
                cg.write_back_qparams(post_qparams)
            ppq_info(f'LSQ {block}: loss {pre_loss:.3e} → {post_loss:.3e} '
                     f'(accepted)')
        else:
            ppq_info(f'LSQ {block}: loss {pre_loss:.3e} → {post_loss:.3e} '
                     f'(rolled back)')


class BiasCorrectionPass(TrainingBasedPass):
    """Blockwise bias correction (reference optim/training.py:338):
    per block, shift each computing op's bias by the channel mean of
    [dequantized-block output − quantized-block output], BOTH evaluated
    on the QUANTIZED net's block inputs — the correction targets the
    error the block itself introduces, not the accumulated upstream
    error (a whole-net fp32-vs-quant comparison double-counts: every
    downstream op's correction re-absorbs upstream error that upstream
    corrections already fixed; the r5 reference-parity harness measured
    that variant WORSENING Δ 1.75e-4 → 2.9e-4 on a 3-conv net while the
    reference improved to 9.9e-5). Corrections are kept only if the
    block's MSE against the fp32 reference improves (reference
    check/rollback, training.py:521-526)."""

    def __init__(self, block_size: int = 4, steps: int = 32,
                 calib_steps: Optional[int] = None):
        super().__init__('Bias Correction Pass', block_size, steps,
                         0.0, calib_steps or min(steps, 16))

    def optimize(self, graph: BaseGraph, dataloader=None, executor=None,
                 collate_fn=None, **kwargs):
        assert dataloader is not None
        blocks = BlockBuilder(graph).build(self.block_size)
        if not blocks:
            return
        from ...ir import dequantize_graph, restore_graph_quantization
        with _unbaked_parameters(graph):
            # compile the two sweep programs ONCE; params are call
            # arguments, so per-block cache refreshes (which must see the
            # biases corrected so far — the reference re-collects per
            # block, training.py:556) only re-read graph values
            in_names = sorted({n for b in blocks for n in b.input_names})
            out_names = sorted({n for b in blocks for n in b.output_names})
            batches = [_feed(graph, b) for b in
                       _batches(dataloader, collate_fn, self.calib_steps)]
            cg_q = CompiledGraph(graph, output_names=in_names)
            fwd_q = cg_q.build_forward()
            dequantize_graph(graph)
            try:
                cg_f = CompiledGraph(graph, output_names=out_names)
                fwd_f = cg_f.build_forward()
            finally:
                restore_graph_quantization(graph)

            def sweep_q():
                p = cg_q.init_params()
                return [dict(zip(in_names,
                                 [np.asarray(v) for v in fwd_q(p, b)]))
                        for b in batches]

            def sweep_f():
                dequantize_graph(graph)
                try:
                    p = cg_f.init_params()
                    return [dict(zip(out_names,
                                     [np.asarray(v) for v in fwd_f(p, b)]))
                            for b in batches]
                finally:
                    restore_graph_quantization(graph)

            for block in blocks:
                self._correct_block(graph, block, sweep_q(), sweep_f())

    @staticmethod
    def _channel_mean(v: np.ndarray, op_type: str) -> np.ndarray:
        # Conv/ConvTranspose add bias on axis 1; Gemm on the last axis
        # (reference collect_bias, training.py:438-448)
        axis = 1 if op_type in ('Conv', 'ConvTranspose') else v.ndim - 1
        red = tuple(i for i in range(v.ndim) if i != axis)
        return np.asarray(v, np.float64).mean(axis=red)

    def _correct_block(self, graph, block, qt_cache, fp_cache):
        targets = [op for op in block.rps
                   if isinstance(op, QuantableOperation)
                   and op.type in ('Conv', 'ConvTranspose', 'Gemm')
                   and len(op.inputs) == 3
                   and op.inputs[-1].is_parameter]
        if not targets:
            return
        t_outs = [op.outputs[0].name for op in targets]
        cg_out = list(dict.fromkeys(list(block.output_names) + t_outs))
        cg = CompiledGraph(graph, op_span=block.rps,
                           input_names=block.input_names,
                           output_names=cg_out)
        fwd = cg.build_trainable_forward()
        params0 = cg.init_params()
        qparams0 = cg.init_qparams()

        def run(params, dequant):
            """Block outputs over the cache; dequant=True disables the
            block's quantization (the fp term of the correction)."""
            if dequant:
                for op in block.rps:
                    if isinstance(op, QuantableOperation):
                        op.dequantize(parameter_only=False)
                cg_f = CompiledGraph(graph, op_span=block.rps,
                                     input_names=block.input_names,
                                     output_names=cg_out)
                fwd_f = cg_f.build_forward()
                pf = cg_f.init_params()
                try:
                    return [fwd_f(pf, {n: jnp.asarray(qt[n])
                                       for n in block.input_names})
                            for qt in qt_cache]
                finally:
                    for op in block.rps:
                        if isinstance(op, QuantableOperation):
                            op.restore_quantize_state()
            return [fwd(params, qparams0,
                        {n: jnp.asarray(qt[n])
                         for n in block.input_names})
                    for qt in qt_cache]

        fp_vals = run(params0, dequant=True)
        qt_vals = run(params0, dequant=False)

        def loss_of(vals):
            total = 0.0
            for outs, fp in zip(vals, fp_cache):
                for name, out in zip(cg_out, outs):
                    if name in block.output_names:
                        total += float(jnp.mean(
                            (out - jnp.asarray(fp[name])) ** 2))
            return total / max(len(vals), 1)

        pre_loss = loss_of(qt_vals)
        corrections = {}
        for op in targets:
            name = op.outputs[0].name
            idx = cg_out.index(name)
            err = np.mean(
                [self._channel_mean(np.asarray(f[idx]), op.type)
                 - self._channel_mean(np.asarray(q[idx]), op.type)
                 for f, q in zip(fp_vals, qt_vals)], axis=0)
            corrections[op.inputs[-1].name] = err

        params_new = dict(params0)
        for bname, err in corrections.items():
            if bname in params_new:
                params_new[bname] = params_new[bname] + \
                    jnp.asarray(err, params_new[bname].dtype)
        post_vals = run(params_new, dequant=False)
        post_loss = loss_of(post_vals)
        if post_loss < pre_loss:   # accept (reference training.py:521)
            for bname, err in corrections.items():
                var = graph.variables[bname]
                _sync_fp32_shadow(graph, bname,
                                  (np.asarray(var.value, np.float64)
                                   + err).astype(np.float32))
            ppq_info(f'BiasCorrection {block}: loss {pre_loss:.3e} → '
                     f'{post_loss:.3e} (accepted)')
        else:
            ppq_info(f'BiasCorrection {block}: loss {pre_loss:.3e} → '
                     f'{post_loss:.3e} (rolled back)')


class AdaroundPass(TrainingBasedPass):
    """Blockwise AdaRound (reference optim/legacy.py:138; Nagel et al.):
    learn each weight element's rounding direction h ∈ {0,1} by optimizing
    a rectified-sigmoid soft rounding variable against block MSE + a
    regularizer annealing h to binary."""

    ZETA, GAMMA = 1.1, -0.1

    def __init__(self, block_size: int = 4, steps: int = 1000,
                 lr: float = 1e-3, gamma: float = 1.0, beta_anneal=(20.0, 2.0),
                 calib_steps: int = 8):
        super().__init__('AdaRound Pass', block_size, steps, lr, calib_steps)
        self.reg_gamma = gamma
        self.beta_anneal = beta_anneal

    # h(v) = clip(sigmoid(v)(zeta-gamma)+gamma, 0, 1)
    @classmethod
    def _h(cls, v):
        return jnp.clip(jax.nn.sigmoid(v) * (cls.ZETA - cls.GAMMA)
                        + cls.GAMMA, 0.0, 1.0)

    @classmethod
    def _init_v(cls, frac):
        frac = np.clip(frac, 1e-4, 1 - 1e-4)
        p = (frac - cls.GAMMA) / (cls.ZETA - cls.GAMMA)
        return np.log(p / (1 - p)).astype(np.float32)

    @staticmethod
    def _weight_targets(block) -> List[Tuple[QuantableOperation, int]]:
        out = []
        for op in block.rps:
            if not isinstance(op, QuantableOperation):
                continue
            if op.type not in COMPUTING_OP:
                continue
            if len(op.inputs) < 2:
                continue
            cfg = op.config.input_quantization_config[1]
            if cfg.state == QuantizationStates.ACTIVATED and cfg.has_scale:
                out.append((op, 1))
        return out

    def optimize(self, graph: BaseGraph, dataloader=None, executor=None,
                 collate_fn=None, **kwargs):
        assert dataloader is not None, 'AdaRound requires a dataloader'
        blocks = BlockBuilder(graph).build(self.block_size)
        if not blocks:
            return
        with _unbaked_parameters(graph):
            qt_cache, fp_cache = self.collect_caches(graph, blocks,
                                                     dataloader, collate_fn)
            for block in blocks:
                self._tune_block(graph, block, qt_cache, fp_cache)

    def _tune_block(self, graph, block, qt_cache, fp_cache):
        targets = self._weight_targets(block)
        if not targets:
            return
        # soft-round the weights manually; suspend the runtime weight quant
        saved_states = []
        winfo = {}
        for op, idx in targets:
            cfg = op.config.input_quantization_config[idx]
            saved_states.append((cfg, cfg.state))
            cfg.state = QuantizationStates.FP32
            w_var = op.inputs[idx]
            w0 = np.asarray(w_var.value, np.float32)
            scale = np.asarray(cfg.scale, np.float32)
            if cfg.policy.per_channel and cfg.channel_axis is not None:
                shape = [1] * w0.ndim
                shape[cfg.channel_axis] = -1
                s_b = scale.reshape(shape)
            else:
                s_b = scale
            floor = np.floor(w0 / s_b)
            frac = w0 / s_b - floor
            winfo[w_var.name] = {
                'floor': jnp.asarray(floor), 's': jnp.asarray(s_b),
                'qmin': float(cfg.quant_min), 'qmax': float(cfg.quant_max),
                'v0': jnp.asarray(self._init_v(frac)),
            }

        try:
            cg = CompiledGraph(graph, op_span=block.rps,
                               input_names=block.input_names,
                               output_names=block.output_names)
            fwd = cg.build_trainable_forward()
            params0 = cg.init_params()
            qparams0 = cg.init_qparams()

            def soft_weights(vs):
                out = dict(params0)
                for name, v in vs.items():
                    wi = winfo[name]
                    q = jnp.clip(wi['floor'] + self._h(v),
                                 wi['qmin'], wi['qmax'])
                    out[name] = q * wi['s']
                return out

            def loss_fn(vs, x_feed, fp_targets, beta):
                p = soft_weights(vs)
                outs = fwd(p, qparams0, x_feed)
                loss = 0.0
                for name, out in zip(block.output_names, outs):
                    loss = loss + jnp.mean((out - fp_targets[name]) ** 2)
                reg = 0.0
                for v in vs.values():
                    h = self._h(v)
                    reg = reg + jnp.sum(1.0 - jnp.abs(2.0 * h - 1.0) ** beta)
                return loss + self.reg_gamma * 1e-3 * reg

            opt = optax.adam(self.lr)
            vs = {n: wi['v0'] for n, wi in winfo.items()}
            opt_state = opt.init(vs)

            @jax.jit
            def step(vs, opt_state, x_feed, fp_targets, beta):
                loss, grads = jax.value_and_grad(loss_fn)(
                    vs, x_feed, fp_targets, beta)
                updates, opt_state = opt.update(grads, opt_state, vs)
                return optax.apply_updates(vs, updates), opt_state, loss

            n_cache = len(qt_cache)
            b_hi, b_lo = self.beta_anneal
            for it in range(self.steps):
                beta = b_hi + (b_lo - b_hi) * (it / max(self.steps - 1, 1))
                qt, fp = qt_cache[it % n_cache], fp_cache[it % n_cache]
                x_feed = {n: jnp.asarray(qt[n]) for n in block.input_names}
                fp_t = {n: jnp.asarray(fp[n]) for n in block.output_names}
                vs, opt_state, _ = step(vs, opt_state, x_feed, fp_t,
                                        jnp.float32(beta))

            # finalize: hard rounding decision written into the weight
            for op, idx in targets:
                w_var = op.inputs[idx]
                wi = winfo[w_var.name]
                h = np.asarray(self._h(vs[w_var.name]))
                q = np.clip(np.asarray(wi['floor']) + (h > 0.5),
                            wi['qmin'], wi['qmax'])
                w_var.value = (q * np.asarray(wi['s'])).astype(np.float32)
                if w_var.name in op._fp32_params:
                    op._fp32_params[w_var.name] = np.array(w_var.value,
                                                           copy=True)
        finally:
            for cfg, state in saved_states:
                cfg.state = state


class RoundTuningPass(AdaroundPass):
    """AdaRound-lite (reference optim/training.py:866): fewer steps, rounding
    variables only."""

    def __init__(self, steps: int = 200, lr: float = 1e-3, **kwargs):
        super().__init__(steps=steps, lr=lr, **kwargs)
        self.name = 'Round Tuning Pass'
