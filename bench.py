"""Benchmark: INT8-simulated ResNet-18 inference throughput (images/sec)
via the whole-graph compiled executor, vs the eager per-op interpreter
baseline (the architecture PPQ uses — ppq/executor/torch.py hot loop).

All compiled-path measurements use device-resident inputs (the model is
the system under test, not the host↔device tunnel) and report MFU against
the chip's bf16 peak. The eager baseline keeps host inputs — per-op host
dispatch IS the reference architecture being compared against.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _t(msg, t0=[None]):
    now = time.perf_counter()
    if t0[0] is not None:
        print(f'[bench] {msg} (+{now - t0[0]:.1f}s)', file=sys.stderr)
    else:
        print(f'[bench] {msg}', file=sys.stderr)
    t0[0] = now


def _throughput(run, x, batch, iters=20):
    out = run(x)[0]
    np.asarray(out)                              # compile + warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)[0]
    # end the timed region with a HOST FETCH: through the axon tunnel,
    # block_until_ready can ack before the dependency chain finishes
    # (observed on the LLM decode chain); fetching data cannot be faked
    np.asarray(out)
    return batch * iters / (time.perf_counter() - t0)


def _device_watchdog(timeout_s: float = 300.0):
    """Fail HONESTLY if the accelerator never comes up. On this machine
    the axon tunnel can wedge so hard that jax.devices() blocks forever
    (even platform registration dials it); a bench that hangs records a
    stall instead of a result. Probe backend init under a hard deadline
    and emit an explicit-error JSON line if it never completes."""
    import threading

    def probe():
        import jax
        jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(json.dumps({
            'metric': 'resnet18_int8_sim_throughput', 'value': 0.0,
            'unit': 'images/sec', 'vs_baseline': 0.0,
            'error': f'accelerator backend failed to initialize within '
                     f'{timeout_s:.0f}s (axon tunnel down); see '
                     f'RESULTS.md for the last on-chip validated numbers',
        }))
        sys.stdout.flush()
        import os
        os._exit(2)


def main():
    _device_watchdog()
    import jax
    # persistent XLA compilation cache: the resnet/LLM programs compile once
    # per machine, later bench runs start in seconds
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/tmp/ppq_tpu_xla_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception:
        pass
    from ppq_tpu import TargetPlatform, TPUExecutor, quantize_graph
    from ppq_tpu.executor import compile_graph
    from ppq_tpu.utils.flops import graph_flops, mfu
    from ppq_tpu.zoo.vision import resnet18

    # --- LLM INT8 serving decode first: measured in a clean process state
    # (eager/XLA residue from the resnet phase perturbs decode latency) ----
    dec = {'tokens_per_sec': 0.0, 'ms_per_step': 0.0}
    dec4 = {'tokens_per_sec': 0.0, 'ms_per_step': 0.0}
    decp = {'tokens_per_sec': 0.0}
    serve = {'generated_tokens_per_sec': 0.0, 'requests_per_sec': 0.0}
    try:
        from ppq_tpu.serving import (LlamaConfig, ServingEngine,
                                     init_llama_params)

        def _cfg(bits, batch=128, paged=False):
            # batch 128: the bigger batch amortizes the per-step weight
            # read (measured 25.2k tok/s vs 20.0k at B=64 after the r3
            # tuning). On TPU the engine auto-enables the fused
            # dequant-matmul and ragged-attention Pallas kernels.
            c = LlamaConfig(d_model=2048, n_layers=16, n_heads=16,
                            n_kv_heads=8, d_ff=5632, vocab_size=32000,
                            max_seq_len=1024, max_batch=batch,
                            weight_bits=bits)
            c.prefill_buckets = (128,)
            c.paged_kv = paged
            return c

        eng = ServingEngine(_cfg(8), init_llama_params(_cfg(8), seed=0))
        _t('llm engine built')
        # burst-mode decode with a terminal host fetch — honest sustained
        # throughput (block_until_ready alone can ack early on the tunnel)
        dec = eng.benchmark_decode(steps=96, burst=32)
        _t('llm decode measured')
        del eng
        # paged KV cache mode (the production serving mode): pool sized to
        # the workload, not B x S. B=128: the paged read is fill-adaptive,
        # so the bigger batch amortizes the per-step weight read without
        # extra cache waste. Continuous-batching e2e runs on THIS engine.
        engp = ServingEngine(_cfg(8, batch=128, paged=True),
                             init_llama_params(_cfg(8, batch=128), seed=0))
        decp.update(engp.benchmark_decode(steps=96, burst=32))
        _t('llm paged decode measured')
        serve = engp.benchmark_serving(n_requests=256, prompt_len=64,
                                       max_new_tokens=128, sync_every=128)
        _t('llm serving (paged) measured')
        del engp
        # INT4 weight-only: halves the per-step weight read
        eng4 = ServingEngine(_cfg(4), init_llama_params(_cfg(4), seed=0))
        dec4.update(eng4.benchmark_decode(steps=96, burst=32))
        _t('llm int4 decode measured')
        del eng4
    except Exception as e:   # never let the LLM phase sink the headline
        print(f'[bench] llm phase failed: {e}', file=sys.stderr)

    # --- quantize once with the reference protocol (512 calibration
    # images, README.md:177); the compiled graph is batch-agnostic, so
    # throughput sweeps reuse it -------------------------------------------
    calib_batch = 32
    graph = resnet18(input_shape=[calib_batch, 3, 224, 224])
    rng = np.random.RandomState(0)
    loader = [rng.randn(calib_batch, 3, 224, 224).astype(np.float32)
              for _ in range(16)]                 # 512 images
    _t('quantizing resnet18 (512-image calibration)')
    quantize_graph(graph, loader, calib_steps=16,
                   platform=TargetPlatform.TPU_INT8, verbose=False)
    _t('quantized')
    from ppq_tpu.quantization.optim.fcalibration import \
        LAST_CALIBRATION_PROFILE as calprof
    flops_per_img = graph_flops(graph) / calib_batch
    # compiled paths run the EXACT stem space-to-depth rewrite (the
    # MLPerf-ResNet TPU stem optimization, ir/morph.py): the 3-channel
    # 7x7/2 stem leaves >95% of the MXU contraction lanes idle and
    # profiled at 1.12 ms of the 8.9 ms batch-256 deploy step. The eager
    # baseline keeps the original graph (it stands in for the reference
    # architecture). MFU stays reported against the ORIGINAL flops.
    from ppq_tpu.ir.morph import stem_space_to_depth
    cgraph = graph.copy(copy_value=True)
    stem_space_to_depth(cgraph)

    def device_batch(batch, seed=0):
        x = np.random.RandomState(seed).randn(
            batch, 3, 224, 224).astype(np.float32)
        return jax.device_put(x)

    # --- compiled simulation path (integer-exact, 'int') ------------------
    # The INT8 simulation runs quantized convs/matmuls over centered
    # integer codes on the bf16 MXU with an fp32 accumulator — EXACT
    # integer arithmetic (bitwise what an int8 backend computes, validated
    # against an int64 reference in tests/test_int_exact_sim.py) at bf16
    # speed. chain=4: the bulk runner scans 4 stacked batches per dispatch
    # — host round-trips amortize 4x (make_runner(chain=K), the product's
    # bulk-inference API; honest fetch-terminated timing unchanged)
    CHAIN = 4
    sim_cg = compile_graph(cgraph, precision='int')
    sim_run = sim_cg.make_runner(chain=CHAIN)
    sim_best, sim_batch = 0.0, 0
    for batch in (128, 256, 512):
        x1 = np.asarray(device_batch(batch))
        xs = jax.device_put(np.broadcast_to(
            x1, (CHAIN,) + x1.shape).copy())
        ips = _throughput(sim_run, xs, batch * CHAIN)
        _t(f'sim batch={batch} chain={CHAIN}: {ips:.0f} img/s')
        if ips > sim_best:
            sim_best, sim_batch = ips, batch

    # fp32-faithful simulation ('highest') — the reference-style fidelity
    # mode, reported as an extra
    hi_run = compile_graph(cgraph).make_runner(chain=CHAIN)
    x1 = np.asarray(device_batch(256))
    xs = jax.device_put(np.broadcast_to(x1, (CHAIN,) + x1.shape).copy())
    sim_fp32_ips = _throughput(hi_run, xs, 256 * CHAIN)
    _t(f'sim-fp32(highest) batch=256 chain={CHAIN}: {sim_fp32_ips:.0f} img/s')

    # --- eager interpreter baseline (PPQ-style per-op dispatch) ------------
    ex = TPUExecutor(graph)
    x8 = loader[0]
    np.asarray(ex.forward(x8)[0])     # warm
    _t('eager warm')
    # best of 3 single-iteration measurements: the per-op dispatch baseline
    # fluctuates with tunnel load; report its best case (conservative ratio)
    eager_ips = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        r = ex.forward(x8)[0]
        np.asarray(r)
        eager_ips = max(eager_ips, calib_batch / (time.perf_counter() - t0))
    _t('eager measured')

    # --- deployment mode: bf16 math AND bf16 tensor storage (the deploy
    # path is HBM-bound; fp32 storage costs ~20% throughput) ----------------
    dep_run = compile_graph(cgraph, precision='bf16').make_runner(chain=CHAIN)
    dep_best, dep_batch = 0.0, 0
    for batch in (128, 256, 512):
        x1 = np.asarray(device_batch(batch))
        xs = jax.device_put(np.broadcast_to(
            x1, (CHAIN,) + x1.shape).copy())
        ips = _throughput(dep_run, xs, batch * CHAIN)
        _t(f'deploy batch={batch} chain={CHAIN}: {ips:.0f} img/s')
        if ips > dep_best:
            dep_best, dep_batch = ips, batch

    sim_mfu = mfu(flops_per_img, sim_best)
    dep_mfu = mfu(flops_per_img, dep_best)

    print(json.dumps({
        'metric': 'resnet18_int8_sim_throughput',
        'value': round(sim_best, 2),
        'unit': 'images/sec',
        'vs_baseline': round(sim_best / eager_ips, 2),
        'extra': {
            'sim_batch': sim_batch,
            'sim_arithmetic': 'integer-exact (bf16-MXU codes, fp32 accum)',
            'sim_fp32_highest_images_per_sec': round(sim_fp32_ips, 2),
            'sim_mfu_vs_bf16_peak': round(sim_mfu, 4) if sim_mfu else None,
            'deploy_mode_bf16_images_per_sec': round(dep_best, 2),
            'deploy_batch': dep_batch,
            'deploy_mfu_vs_bf16_peak': round(dep_mfu, 4) if dep_mfu else None,
            'resnet18_gflops_per_image': round(flops_per_img / 1e9, 3),
            'eager_interpreter_images_per_sec': round(eager_ips, 2),
            'llm_1b_int8_decode_tokens_per_sec_chip':
                round(dec['tokens_per_sec'], 1),
            'llm_decode_ms_per_step': round(dec['ms_per_step'], 3),
            'llm_1b_int4_decode_tokens_per_sec_chip':
                round(dec4['tokens_per_sec'], 1),
            'llm_1b_paged_kv_decode_tokens_per_sec_chip':
                round(decp['tokens_per_sec'], 1),
            'llm_serving_generated_tokens_per_sec': round(
                serve['generated_tokens_per_sec'], 1),
            'llm_serving_requests_per_sec': round(
                serve['requests_per_sec'], 2),
            'calibration_images_per_sec': round(
                calprof.get('images', 0) /
                max(calprof.get('compile_s', 0) + calprof.get('run_s', 0),
                    1e-9), 2) if calprof else None,
        },
    }))


if __name__ == '__main__':
    main()
