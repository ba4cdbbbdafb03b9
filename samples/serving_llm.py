"""Serving sample — quantized LLM decoding on a TPU mesh
(new capability: the reference has no serving engine, SURVEY.md §2.11).

INT8/INT4 weight-only quantization + INT8 KV cache, tensor-parallel over the
'tp' mesh axis, continuous batching.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax
import numpy as np

from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params
from ppq_tpu.serving.engine import Request

cfg = LlamaConfig(d_model=2048, n_layers=16, n_heads=16, n_kv_heads=8,
                  d_ff=5632, vocab_size=32000, max_seq_len=1024,
                  max_batch=8, weight_bits=8, kv_cache_bits=8)
params = init_llama_params(cfg, seed=0)
# Real checkpoints + calibrated weight-only quantization:
#   from ppq_tpu.serving import load_hf_llama, awq_quantize_llama_params
#   cfg, fp = load_hf_llama('/path/to/llama', quantize=False)
#   params = awq_quantize_llama_params(fp, cfg, calib_tokens)   # or gptq_
#   (or quantize_llama_params(fp, cfg, method='mse') without calibration)

# single chip
engine = ServingEngine(cfg, params)
print('decode:', engine.benchmark_decode(steps=20))

# tensor-parallel over all local devices (tp ≤ n_kv_heads)
n = min(len(jax.devices()), cfg.n_kv_heads)
if n > 1:
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n), ('dp', 'tp'))
    engine = ServingEngine(cfg, params, mesh=mesh)
    print(f'decode (tp={n}):', engine.benchmark_decode(steps=20))

# continuous batching
requests = [Request(i, prompt=[1 + i, 7, 42], max_new_tokens=16)
            for i in range(20)]
engine.run(requests)
print('generated:', sum(len(r.generated) for r in requests), 'tokens')
