import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/ppq_tpu_xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params

for bits in (4,):
    c = LlamaConfig(d_model=2048, n_layers=16, n_heads=16, n_kv_heads=8,
                    d_ff=5632, vocab_size=32000, max_seq_len=1024,
                    max_batch=128, weight_bits=bits)
    c.prefill_buckets = (128,)
    c.paged_kv = True
    eng = ServingEngine(c, init_llama_params(c, seed=0))
    eng.benchmark_decode(steps=32, burst=32)
    d = eng.benchmark_decode(steps=96, burst=32)
    print(f'int{bits}: {d}', flush=True)
    del eng
