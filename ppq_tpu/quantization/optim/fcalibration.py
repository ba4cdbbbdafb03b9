"""Compiled (functional) calibration — the TPU-native fast path.

The reference calibrates by hooking a per-op eager interpreter
(optim/calibration.py:19 + observer hooks): every batch pays the full
Python-dispatch cost per op. Here the whole graph AND the stat reductions
compile into one XLA program per batch (executor/compile.py
build_calibration_forward): activations never leave the device, min/max /
quantile / histogram reductions fuse into the producing ops, and batches
stream through a single jitted call — this is the "orders faster
calibration" capability of BASELINE.json.

Semantics match the eager observers exactly:
  minmax     — global min/max fold            (observers.MinMaxObserver)
  percentile — per-batch quantile, averaged   (observers.PercentileObserver)
  kl / mse   — ONE fused program ('absmax_hist') run twice: sweep 1
               learns absmax, sweep 2 fills histograms at the final
               scale, then the host clip search
               (observers.KLObserver/MSEObserver + solvers)
Isotone/other algorithms fall back to the eager pass automatically.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

from ...core import (OBSERVER_KL_HIST_BINS, OBSERVER_MIN_SCALE,
                     OBSERVER_MSE_HIST_BINS, OBSERVER_PERCENTILE,
                     OBSERVER_PERCENTILE_MANUL_OVERRIDE, QuantizationStates,
                     TensorQuantizationConfig, ppq_info, ppq_warning)
from ...executor.compile import CompiledGraph, compilable
from ...ir import BaseGraph, QuantableOperation
from ..observers import minmax_to_scale_offset
from ..solvers import kl_threshold_search, mse_threshold_search
from .base import QuantizationOptimizationPass

COMPILED_ALGOS = {'minmax', 'percentile', 'kl', 'mse'}

# profile of the most recent compiled calibration run (read by bench.py):
# {'batches', 'images', 'compile_s', 'run_s'}
LAST_CALIBRATION_PROFILE = {}


def _make_fold(kinds: Dict[str, str]):
    """Jitted ON-DEVICE stat combiner. Folding on host cost ~40 small
    device→host reads per batch — ~2 s/batch once the remote-TPU tunnel
    path degrades (see the upload note in optimize); folding on device
    keeps the sweep at dispatch speed with ONE readback at the end."""
    import jax
    import jax.numpy as jnp

    def comb(kind, a, s):
        if kind == 'minmax':
            return (jnp.minimum(a[0], s[0]), jnp.maximum(a[1], s[1]))
        if kind in ('percentile', 'quantile_bisect'):
            # per-batch quantiles are AVERAGED (eager-observer
            # semantics): running sum here, divided by n_batches at
            # readback
            return (a[0] + s[0], a[1] + s[1])
        if kind == 'absmax_hist':
            return (jnp.maximum(a[0], s[0]), a[1] + s[1])
        if kind == 'absmax':
            return jnp.maximum(a, s)
        return a + s                       # hist / hist_signed

    @jax.jit
    def fold(acc, stats):
        return {n: comb(kinds[n], acc[n], stats[n]) for n in stats}
    return fold


def _activation_targets(graph: BaseGraph) -> Dict[str, TensorQuantizationConfig]:
    """var name → INITIAL root activation TQC awaiting calibration."""
    targets = {}
    for op in graph.operations.values():
        if not isinstance(op, QuantableOperation):
            continue
        for var, cfg in op.config_pairs():
            if var.is_parameter:
                continue
            if cfg.is_root and cfg.state == QuantizationStates.INITIAL:
                targets.setdefault(var.name, cfg)
    return targets


def compiled_calibration_supported(graph: BaseGraph,
                                   method: Optional[str]) -> bool:
    ok, _ = compilable(graph)
    if not ok:
        return False
    if method is not None:
        return method in COMPILED_ALGOS
    return all(cfg.observer_algorithm in COMPILED_ALGOS
               for cfg in _activation_targets(graph).values())


class CompiledCalibrationPass(QuantizationOptimizationPass):
    def __init__(self, method: Optional[str] = None, calib_steps: int = 32,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'dp' axis — each batch is
        sharded over it and the stat reductions become XLA psums over
        ICI/DCN (data-parallel calibration; no reference analogue,
        SURVEY.md §2.11)."""
        super().__init__('Compiled Calibration Pass (XLA)')
        self.method = method
        self.calib_steps = calib_steps
        self.mesh = mesh

    # --------------------------------------------------------------- utils
    def _batches(self, dataloader, collate_fn):
        n = 0
        for batch in dataloader:
            if collate_fn is not None:
                batch = collate_fn(batch)
            yield batch
            n += 1
            if n >= self.calib_steps:
                break

    def _feed(self, cg: CompiledGraph, batch) -> dict:
        names = list(cg.graph.inputs.keys())
        if isinstance(batch, dict):
            feed = dict(batch)
        elif isinstance(batch, (list, tuple)):
            feed = dict(zip(names, batch))
        else:
            feed = {names[0]: batch}
        if self.mesh is not None:
            import jax
            import jax.numpy as jnp
            from ...parallel.mesh import batch_sharding
            feed = {k: jax.device_put(
                jnp.asarray(v), batch_sharding(self.mesh, jnp.ndim(v)))
                for k, v in feed.items()}
        return feed

    # ------------------------------------------------------------ optimize
    def optimize(self, graph: BaseGraph, dataloader=None, executor=None,
                 collate_fn=None, **kwargs):
        assert dataloader is not None, 'calibration requires a dataloader'
        targets = _activation_targets(graph)
        if not targets:
            return
        if self.method is not None:
            for cfg in targets.values():
                cfg.observer_algorithm = self.method

        cg = CompiledGraph(graph)
        params = cg.init_params()

        algo_of = {name: cfg.observer_algorithm
                   for name, cfg in targets.items()}
        onepass = {n for n, a in algo_of.items() if a == 'minmax'}
        # percentile is SINGLE-PHASE on both backends: exact jnp.quantile
        # on CPU (sorts are cheap there), 24-step bisection quantile on
        # TPU (an XLA sort compiles pathologically slowly; the bisection
        # is pure compare+reduce fused into the phase-1 program — the old
        # histogram-CDF design cost a SECOND full-network sweep plus a
        # second ~30s program compile, the bulk of cold-start wall-clock).
        import jax as _jax
        cpu_backend = _jax.default_backend() == 'cpu'
        pct_all = {n for n, a in algo_of.items() if a == 'percentile'}
        pct_kind = 'percentile' if cpu_backend else 'quantile_bisect'
        # per-channel percentile needs the axis-aware quantile path
        pct_direct = {n for n in pct_all
                      if cpu_backend or not targets[n].policy.per_channel}
        pct_phase = pct_all - pct_direct
        twophase = {n for n, a in algo_of.items() if a in ('kl', 'mse')}

        def _pct_of(name):
            return float(targets[name].detail.get(
                OBSERVER_PERCENTILE_MANUL_OVERRIDE, OBSERVER_PERCENTILE))

        # ---------------- phase 1: minmax (+range probes for histograms) --
        # kl/mse targets use the FUSED 'absmax_hist' kind: the one
        # phase-1 program emits both the range probe and the histogram
        # (scale as a traced arg), so the histogram sweep below reuses
        # this same compiled program instead of compiling a second
        # full-network program — on the remote-compile TPU backend the
        # two ~20-30s compiles serialized and dominated cold-start wall
        # (measured 90s → ~35s for the resnet18/512-image protocol).
        spec = {}
        for n in onepass | pct_phase:
            spec[n] = {'kind': 'minmax'}
        for n in pct_direct:
            spec[n] = {'kind': pct_kind, 'percentile': _pct_of(n)}
        for n in twophase:
            bins = (OBSERVER_KL_HIST_BINS if algo_of[n] == 'kl'
                    else OBSERVER_MSE_HIST_BINS)
            spec[n] = {'kind': 'absmax_hist', 'bins': bins}
        # sweep-1 dummy scales — MUST share the treedef with the sweep-2
        # ranges so the jit dispatch cache hits (same dict keys)
        ranges1 = {n: np.float32(1.0) for n in sorted(twophase)} or None

        import time as _time
        _t0 = _time.perf_counter()

        def _dbg(msg):
            from ...core import PPQ_TPU_CONFIG
            if PPQ_TPU_CONFIG.DEBUG:
                ppq_info(f'[calib] {msg} (+{_time.perf_counter() - _t0:.1f}s)')

        # ---- concurrent phase-2 precompile -------------------------------
        # The phase-2 programs are DATA-INDEPENDENT (histogram ranges ride
        # as traced arguments), so their XLA compilation can overlap the
        # whole of phase 1 — on a remote-compile TPU the two ~20 s
        # compiles were the bulk of cold-start calibration wall-clock.
        # The precompiled jit instances are reused below when the phase-2
        # spec matches (it always does unless a target produced no stats).
        import threading as _threading
        pre: Dict[str, object] = {}
        pre_threads = []

        def _abstract_args():
            import jax
            p_abs = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                     for k, v in params.items()}
            f_abs = {}
            for name, var in graph.inputs.items():
                shape = [int(s) for s in (var.shape or [])]
                if not shape or any(s <= 0 for s in shape):
                    raise ValueError('dynamic input shape')
                f_abs[name] = jax.ShapeDtypeStruct(tuple(shape), np.float32)
            return p_abs, f_abs

        def _precompile(key, spec_pc, ranges_dummy):
            try:
                import jax
                fnc = cg.build_calibration_forward(spec_pc)
                _, f_abs = _abstract_args()
                feed0 = {k: jax.numpy.zeros(v.shape, v.dtype)
                         for k, v in f_abs.items()}
                # one dummy execution: compiles AND warms the jit
                # dispatch cache (an AOT lower().compile() does not
                # reliably share with later fnc(...) calls)
                out = fnc(params, feed0, ranges_dummy)
                jax.block_until_ready(out)
                pre[key] = fnc
            except Exception:
                pass

        if pct_phase:
            spec_pre = {n: {'kind': 'hist_signed',
                            'bins': OBSERVER_KL_HIST_BINS}
                        for n in sorted(pct_phase)}
            r_dummy = {n: (np.float32(0.0), np.float32(1.0))
                       for n in spec_pre}
            t = _threading.Thread(target=_precompile,
                                  args=('pct', spec_pre, r_dummy),
                                  daemon=True)
            t.start()
            pre_threads.append(('pct', spec_pre, t))
        # (kl/mse need NO precompile thread anymore: the fused
        # 'absmax_hist' phase-1 program IS the histogram program)

        fn = cg.build_calibration_forward(spec)
        _dbg('phase1 traced')

        # ---- one-shot device upload of the calibration window ------------
        # Transfers MUST land before the first big program executes: the
        # remote-TPU (axon tunnel) host→device path degrades ~25x once a
        # large executable has run in the process (19MB batch: 16ms fresh
        # vs ~400-1500ms after — measured, probes/calib_kl_cold.py), and
        # the histogram sweep re-reads every batch. Uploading the whole
        # window now (319MB for the resnet18/512-image protocol) keeps
        # every sweep at device speed. Falls back to streaming when the
        # window would not comfortably fit beside the model (>4GB).
        import jax as _jaxm
        feeds: List[dict] = []
        n_images = 0
        total_bytes = 0
        for batch in self._batches(dataloader, collate_fn):
            feed = self._feed(cg, batch)
            try:
                first = next(iter(feed.values()))
                n_images += int(first.shape[0])
            except Exception:
                pass
            total_bytes += sum(int(np.asarray(v).nbytes)
                               for v in feed.values())
            feeds.append(feed)
        if not feeds:
            raise ValueError('Calibration dataloader yielded no batches.')
        if self.mesh is None and total_bytes <= (4 << 30):
            feeds = [{k: _jaxm.device_put(v) for k, v in f.items()}
                     for f in feeds]
            _jaxm.block_until_ready(feeds)
        _dbg(f'calibration window resident ({total_bytes >> 20} MB)')

        kinds = {n: e['kind'] for n, e in spec.items()}
        fold = _make_fold(kinds)
        acc = None
        n_batches = 0
        compile_s = run_s = 0.0
        for feed in feeds:
            t0 = _time.perf_counter()
            if ranges1 is not None:
                _, stats = fn(params, feed, ranges1)
            else:
                _, stats = fn(params, feed)
            acc = stats if acc is None else fold(acc, stats)
            dt = _time.perf_counter() - t0
            if n_batches == 0:
                compile_s = dt
            else:
                run_s += dt
            n_batches += 1
        t0 = _time.perf_counter()
        # skip the sweep-1 histograms at readback (dummy-scale garbage;
        # each small device→host read costs ~50ms on a degraded tunnel)
        small = {n: (v[0] if kinds.get(n) == 'absmax_hist' else v)
                 for n, v in (acc or {}).items()}
        small = _jaxm.device_get(small)
        acc = {n: ((np.asarray(v, np.float64),)
                   if kinds.get(n) == 'absmax_hist'
                   else tuple(np.asarray(x, np.float64) for x in v)
                   if isinstance(v, tuple) else np.asarray(v, np.float64))
               for n, v in small.items()}
        run_s += _time.perf_counter() - t0
        _dbg('phase1 folded')
        LAST_CALIBRATION_PROFILE.clear()
        LAST_CALIBRATION_PROFILE.update({
            'batches': n_batches, 'images': n_images,
            'compile_s': compile_s, 'run_s': run_s})

        ranges = {}
        for name in onepass | pct_phase:
            if name not in acc:
                continue
            lo, hi = acc[name]
            if name in onepass:
                cfg = targets[name]
                scale, offset = minmax_to_scale_offset(lo, hi, cfg)
                self._activate(cfg, scale, offset)
            else:
                ranges[name] = (float(np.min(lo)), float(np.max(hi)))
        for name in pct_direct:
            if name not in acc:
                continue
            # eager-observer semantics: per-batch quantiles, averaged
            lo = acc[name][0] / n_batches
            hi = acc[name][1] / n_batches
            cfg = targets[name]
            scale, offset = minmax_to_scale_offset(
                np.asarray(lo), np.asarray(hi), cfg)
            self._activate(cfg, scale, offset)

        # -------- phase 2a: percentile via signed-histogram CDF ------------
        if pct_phase:
            bins = OBSERVER_KL_HIST_BINS
            spec_p, ranges_arg, widths = {}, {}, {}
            for n in pct_phase:
                if n not in ranges:
                    continue
                lo, hi = ranges[n]
                width = max((hi - lo) / bins, OBSERVER_MIN_SCALE)
                widths[n] = width
                # lo/width travel as traced args → the phase-2 program is
                # data-independent and persists in the compilation cache
                spec_p[n] = {'kind': 'hist_signed', 'bins': bins}
                ranges_arg[n] = (np.float32(lo), np.float32(width))
            _dbg('phase2a spec built')
            for key, spec_pre, t in pre_threads:
                if key == 'pct':
                    t.join()
            fn_p = (pre['pct'] if pre.get('pct') is not None
                    and any(k == 'pct' and sp == spec_p
                            for k, sp, _ in pre_threads)
                    else cg.build_calibration_forward(spec_p))
            _dbg('phase2a program ready'
                 + (' (precompiled concurrently)' if 'pct' in pre else ''))
            fold_p = _make_fold({n: 'hist_signed' for n in spec_p})
            acc_p = None
            for bi, feed in enumerate(feeds):
                _, stats = fn_p(params, feed, ranges_arg)
                acc_p = stats if acc_p is None else fold_p(acc_p, stats)
                _dbg(f'phase2a batch {bi} folded on device')
            hists_p = {n: np.asarray(v, np.float64) for n, v in
                       _jaxm.device_get(acc_p or {}).items()}
            for name, h in hists_p.items():
                cfg = targets[name]
                pct = float(cfg.detail.get(OBSERVER_PERCENTILE_MANUL_OVERRIDE,
                                           OBSERVER_PERCENTILE))
                lo0, hi0 = ranges[name]
                width = widths[name]
                cdf = np.cumsum(h) / max(h.sum(), 1.0)
                hi_bin = int(np.searchsorted(cdf, pct))
                lo_bin = int(np.searchsorted(cdf, 1.0 - pct))
                hi_v = lo0 + (hi_bin + 1) * width
                lo_v = lo0 + lo_bin * width
                scale, offset = minmax_to_scale_offset(
                    np.asarray(lo_v), np.asarray(hi_v), cfg)
                self._activate(cfg, scale, offset)
            _dbg('phase2a rendered')

        # -------- phase 2: histogram sweep for kl/mse (SAME program) -------
        # the fused phase-1 program is re-run with the real histogram
        # scales (same ranges treedef → jit dispatch-cache hit, zero new
        # compilation); only the hist half of each stat is folded.
        if twophase:
            absmax = {n: float(np.max(acc[n][0]))
                      for n in twophase if n in acc}
            hist_scales, ranges2 = {}, dict(ranges1)
            for n in twophase:
                bins = (OBSERVER_KL_HIST_BINS if algo_of[n] == 'kl'
                        else OBSERVER_MSE_HIST_BINS)
                hist_scales[n] = max(absmax.get(n, 0.0),
                                     OBSERVER_MIN_SCALE) / bins
                ranges2[n] = np.float32(hist_scales[n])
            run2 = 0.0
            acc2 = None
            for feed in feeds:
                t0 = _time.perf_counter()
                _, stats = fn(params, feed, ranges2)
                # the phase-1 fold is reused verbatim (same treedef →
                # same compiled combiner); only the hist halves are read
                acc2 = stats if acc2 is None else fold(acc2, stats)
                run2 += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            hists = {n: np.asarray(v, np.float64) for n, v in
                     _jaxm.device_get(
                         {n: acc2[n][1] for n in twophase
                          if n in (acc2 or {})}).items()}
            run2 += _time.perf_counter() - t0
            _dbg('phase2 hists folded')

            t0 = _time.perf_counter()
            for name in twophase:
                if name not in hists:
                    continue
                cfg = targets[name]
                levels = 1 << (cfg.num_of_bits - 1)
                if algo_of[name] == 'kl':
                    best_bin = kl_threshold_search(hists[name], levels)
                else:
                    best_bin = mse_threshold_search(
                        hists[name], hist_scales[name], levels)
                clip = (best_bin + 0.5) * hist_scales[name]
                scale, offset = minmax_to_scale_offset(
                    np.asarray(-clip), np.asarray(clip), cfg)
                self._activate(cfg, scale, offset)
            LAST_CALIBRATION_PROFILE['run2_s'] = run2
            LAST_CALIBRATION_PROFILE['search_s'] = \
                _time.perf_counter() - t0
            _dbg('phase2 clip search done')

    @staticmethod
    def _activate(cfg: TensorQuantizationConfig, scale, offset):
        cfg.scale = scale
        cfg.offset = offset
        if cfg.state == QuantizationStates.INITIAL:
            cfg.state = QuantizationStates.ACTIVATED
        elif cfg.state == QuantizationStates.PASSIVE_INIT:
            cfg.state = QuantizationStates.PASSIVE
