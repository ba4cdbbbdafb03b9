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
    # lm_head precision; None resolves to 8 when weight_bits == 4 (the
    # AWQ/GPTQ-style mixed head: the head is <10% of 1B-class params but
    # the single largest matmul, and the int4 unpack is VPU-serialized
    # against the MXU at decode batches >= 64 — probes/int4_pipe.py).
    # Set 4 explicitly to force a uniform-int4 model.
    lm_head_bits: Optional[int] = None
    weight_quant_method: str = 'minmax'   # 'minmax' | 'mse' scale search
    # runtime marker set by model.fuse_decode_params when every rms_norm
    # gamma folded into the following matmul's weights: decode paths then
    # fuse the norm's rsqrt into the qmm kernel epilogue (static under
    # jit — must NOT live in the params pytree)
    norm_folded: bool = False
    kv_cache_bits: int = 8          # 8 | 16
    act_dtype: str = 'bfloat16'
    # W8A8 prefill: per-token int8 activations + int8 weights on the
    # MXU's int8 pipe (2x bf16 peak on v5e) for multi-token windows;
    # single-token decode stays weight-only (HBM-bound)
    act_bits: int = 16              # 16 (bf16 acts) | 8 (W8A8 prefill)

    # serving
    max_batch: int = 8
    prefill_buckets: tuple = (128, 512, 2048)
    # automatic prefix caching (paged_kv only): max cached pool blocks
    # indexed by prompt-prefix digest; 0 disables
    prefix_cache_blocks: int = 0

    # Pallas fast paths (None = auto-resolve at engine build: TPU backend,
    # unsharded single-device mesh, supported shapes). use_pallas_matmul
    # streams int8/int4 weight bytes through the fused dequant-matmul
    # kernels; use_ragged_attention reads only filled KV-cache blocks in
    # burst decode via the paged-attention kernel.
    use_pallas_matmul: Optional[bool] = None
    use_ragged_attention: Optional[bool] = None
    ragged_interpret: bool = False          # test-only: interpreted kernel

    # Paged KV cache (serving/paged.py): sequences draw kv_block_size-token
    # blocks from a shared pool instead of reserving max_batch x
    # max_seq_len up front. kv_pool_blocks counts pool blocks INCLUDING
    # the reserved trash block (None = max_batch * max_seq_len /
    # kv_block_size + 1, i.e. the same worst-case memory as the contiguous
    # cache). Block size trades allocation granularity (avg half a block
    # wasted per sequence — KB, irrelevant at TPU HBM scale) against DMA
    # transaction count in the decode kernel, whose measured cost driver
    # is per-(slot, block) overhead (~0.2-0.4us/step): on v5e the kernel
    # hits 47%/65%/70% of the HBM roofline at 128/256/512 at fill 1024.
    paged_kv: bool = False
    kv_pool_blocks: Optional[int] = None
    kv_block_size: int = 256

    # longest single decode burst program: the in-burst buffer costs O(n)
    # per step (reads + carry updates); bursts beyond this chunk into
    # several programs (the planned scheduler dispatches them back-to-back
    # without host syncs, so chunking costs little end-to-end). 128 is the
    # measured sweet spot for the merge-composition decode path on v5e.
    max_decode_burst: int = 128
    # in-burst banked-buffer chunk length: the burst scan carries only a
    # burst_chunk-column buffer chunk (finished chunks join as scan
    # invariants) so the per-step carry rewrite — which XLA never aliases
    # in place (probes/bank_dus.py) — touches n/burst_chunk x fewer bytes.
    # None = single chunk (the full n-column carry): chunking MEASURED
    # SLOWER on v5e at the bench operating point (probes/chunk_ab.py —
    # the extra per-chunk einsums outweigh the rewrite savings); the knob
    # stays for buffer-dominated configs (huge B x n, small model).
    burst_chunk: Optional[int] = None

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def resolved_lm_head_bits(self) -> int:
        if self.lm_head_bits is not None:
            return self.lm_head_bits
        return 8 if self.weight_bits == 4 else self.weight_bits

    @classmethod
    def tiny(cls) -> 'LlamaConfig':
        """Test-sized config."""
        return cls(vocab_size=256, d_model=128, n_layers=2, n_heads=4,
                   n_kv_heads=2, d_ff=256, max_seq_len=128, max_batch=4,
                   prefill_buckets=(16, 64))
