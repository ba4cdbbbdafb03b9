"""A/B: chunked banked-buffer carry (cfg.burst_chunk) on the bench decode
config via the ENGINE path (benchmark_decode) — B=128, 16 layers, d2048.
Question: does carrying only a small chunk of the in-burst buffer
(finished chunks as scan invariants) beat the full-width n-column carry
that XLA rewrites every step (probes/bank_dus.py floor)?"""
import sys

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params

for ch in (int(a) for a in (sys.argv[1:] or ['32', '8'])):
    c = LlamaConfig(d_model=2048, n_layers=16, n_heads=16, n_kv_heads=8,
                    d_ff=5632, vocab_size=32000, max_seq_len=1024,
                    max_batch=128, weight_bits=8)
    c.prefill_buckets = (128,)
    c.burst_chunk = ch
    eng = ServingEngine(c, init_llama_params(c, seed=0))
    r = eng.benchmark_decode(steps=64, burst=32)
    r = eng.benchmark_decode(steps=64, burst=32)
    print(f"chunk={ch:3d}: {r['ms_per_step']:7.3f} ms/step  "
          f"{r['tokens_per_sec']:9.0f} tok/s", flush=True)
    del eng
