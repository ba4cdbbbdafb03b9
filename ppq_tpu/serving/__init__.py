from .config import LlamaConfig
from .engine import ServingEngine
from .model import init_llama_params, quantize_llama_params

__all__ = ['LlamaConfig', 'ServingEngine', 'init_llama_params',
           'quantize_llama_params']
