"""Pallas TPU kernels — native replacements for ppq/csrc CUDA kernels
(SURVEY.md §2.10 mapping table).

| reference (CUDA)                | here                                  |
|---------------------------------|---------------------------------------|
| linear.cu QuantizeTensor_LT/LC  | quant.pallas_linear_quant             |
| train.cu QuantizeTensor_*_B     | quant.pallas_linear_quant_bwd         |
| linear.cu Histogram_T/Asym      | histogram.pallas_histogram            |
| floating.cu QuantizeTensor_FT/FC| floating.pallas_floating_quant(_bwd)  |
| sort.cu Quantile_T              | jnp.quantile (XLA sort, MXU-free)     |
| isotone.cc / hist_mse.cc        | quantization/solvers.py (+C++ ext)    |

Serving-side kernels with no reference analogue (PPQ delegates deployed
matmuls to vendor runtimes; our deployed runtime is the serving engine):
qmm.qmm_int8/qmm_int4 (fused dequant-matmul — weight bytes stream
HBM->VMEM, dequantize on-chip) and paged_attention.paged_attention_decode
(ragged/paged flash-decoding over the int8 KV cache).

All kernels run in interpreter mode automatically off-TPU so the test suite
exercises identical code paths on the CPU mesh.
"""

from .quant import (pallas_available, pallas_linear_quant,
                    pallas_linear_quant_bwd)
from .histogram import pallas_histogram
from .floating import pallas_floating_quant, pallas_floating_quant_bwd
from .qmm import qmm_int4, qmm_int8
from .paged_attention import merge_attention, paged_attention_decode

__all__ = ['pallas_available', 'pallas_linear_quant',
           'pallas_linear_quant_bwd', 'pallas_histogram',
           'pallas_floating_quant', 'pallas_floating_quant_bwd',
           'qmm_int8', 'qmm_int4', 'paged_attention_decode',
           'merge_attention']
