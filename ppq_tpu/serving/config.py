"""Serving engine configuration."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class LlamaConfig:
    """Llama-class decoder architecture + quantization + serving knobs.

    The reference has no serving engine (PPQ is a quantization compiler,
    SURVEY.md §2.11); this subsystem is the BASELINE.json north-star
    capability: quantized multi-chip TPU inference with INT8/INT4 weights
    and an INT8 KV cache.
    """

    vocab_size: int = 32000
    d_model: int = 2048
    n_layers: int = 16
    n_heads: int = 16
    n_kv_heads: int = 8             # GQA
    d_ff: int = 5632
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 2048

    # mixture-of-experts (0 = dense FFN)
    n_experts: int = 0
    top_k: int = 2

    # quantization
    weight_bits: int = 8            # 8 | 4 | 16 (16 = bf16, no quant)
    kv_cache_bits: int = 8          # 8 | 16
    act_dtype: str = 'bfloat16'

    # serving
    max_batch: int = 8
    prefill_buckets: tuple = (128, 512, 2048)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @classmethod
    def tiny(cls) -> 'LlamaConfig':
        """Test-sized config."""
        return cls(vocab_size=256, d_model=128, n_layers=2, n_heads=4,
                   n_kv_heads=2, d_ff=256, max_seq_len=128, max_batch=4,
                   prefill_buckets=(16, 64))
