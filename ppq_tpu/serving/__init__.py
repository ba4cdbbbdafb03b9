from .awq import awq_quantize_llama_params, smoothquant_llama_params
from .gptq import gptq_quantize_llama_params
from .config import LlamaConfig
from .convert import (config_from_hf, load_hf_llama,
                      params_from_hf_state_dict)
from .engine import Request, ServingEngine
from .model import init_llama_params, quantize_llama_params
from .paged import BlockAllocator, init_paged_pools
from .ring_attention import reference_attention, sequence_parallel_attention
from .speculative import speculative_generate

__all__ = ['LlamaConfig', 'ServingEngine', 'init_llama_params',
           'quantize_llama_params', 'awq_quantize_llama_params',
           'gptq_quantize_llama_params', 'smoothquant_llama_params',
           'sequence_parallel_attention', 'reference_attention',
           'BlockAllocator', 'init_paged_pools', 'config_from_hf',
           'load_hf_llama', 'params_from_hf_state_dict',
           'speculative_generate']
