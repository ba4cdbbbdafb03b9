"""Checkpoint conversion: HuggingFace Llama-family weights → engine params.

The deployment path a reference user actually needs: take a trained
Llama-architecture checkpoint (a `transformers` state_dict — local
files; this image has zero egress) and produce the ServingEngine's
quantized parameter tree. Weight layout differences handled here:

  * torch Linear stores (out, in); the engine's qmatmul consumes
    (in, out) → transpose.
  * q/k/v keep HF's head ordering — the engine's rope_apply and HF's
    rotate_half are the same contiguous-half rotation, so no permutation
    is needed (pinned by tests/test_hf_convert.py logits parity).
  * lm_head ties to the embedding when the checkpoint omits it.

Quantization happens AFTER conversion through the same entry points as
everything else (quantize_llama_params / awq / gptq), so calibrated
methods apply to real checkpoints unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig
from .model import Params, quantize_llama_params


def config_from_hf(hf_cfg) -> LlamaConfig:
    """LlamaConfig from a transformers LlamaConfig-like object."""
    return LlamaConfig(
        vocab_size=int(hf_cfg.vocab_size),
        d_model=int(hf_cfg.hidden_size),
        n_layers=int(hf_cfg.num_hidden_layers),
        n_heads=int(hf_cfg.num_attention_heads),
        n_kv_heads=int(getattr(hf_cfg, 'num_key_value_heads',
                               hf_cfg.num_attention_heads)),
        d_ff=int(hf_cfg.intermediate_size),
        max_seq_len=int(hf_cfg.max_position_embeddings),
        rope_theta=float(getattr(hf_cfg, 'rope_theta', 10000.0)),
        rms_eps=float(getattr(hf_cfg, 'rms_norm_eps', 1e-5)),
    )


def params_from_hf_state_dict(sd: Dict, cfg: LlamaConfig,
                              quantize: bool = True,
                              method: Optional[str] = None) -> Params:
    """Engine param tree from a HF Llama state_dict (torch tensors or
    numpy arrays). quantize=False returns the float tree ({'w': bf16}
    linears) for the calibrated quantizers (awq/gptq) to consume."""

    def a(key):
        t = sd[key]
        if hasattr(t, 'detach'):
            t = t.detach().to('cpu').float().numpy()
        return np.asarray(t, np.float32)

    def lin(key):
        return {'w': jnp.asarray(a(key).T, jnp.bfloat16)}   # (in, out)

    layers = []
    for i in range(cfg.n_layers):
        p = f'model.layers.{i}.'
        layers.append({
            'attn_norm': jnp.asarray(a(p + 'input_layernorm.weight')),
            'wq': lin(p + 'self_attn.q_proj.weight'),
            'wk': lin(p + 'self_attn.k_proj.weight'),
            'wv': lin(p + 'self_attn.v_proj.weight'),
            'wo': lin(p + 'self_attn.o_proj.weight'),
            'mlp_norm': jnp.asarray(
                a(p + 'post_attention_layernorm.weight')),
            'w_gate': lin(p + 'mlp.gate_proj.weight'),
            'w_up': lin(p + 'mlp.up_proj.weight'),
            'w_down': lin(p + 'mlp.down_proj.weight'),
        })
    head_key = ('lm_head.weight' if 'lm_head.weight' in sd
                else 'model.embed_tokens.weight')     # tied embeddings
    params: Params = {
        'embed': jnp.asarray(a('model.embed_tokens.weight'),
                             jnp.bfloat16),
        'layers': layers,
        'final_norm': jnp.asarray(a('model.norm.weight')),
        'lm_head': lin(head_key),
    }
    if quantize:
        # fold norm gammas into the fp weights BEFORE quantization: the
        # quant grid then covers gamma*W (an AWQ-style scale fold), and
        # the decode hot loop can fuse each rms_norm into the following
        # qmm kernel's row-scale epilogue (model.fold_norm_gamma)
        from .model import fold_norm_gamma
        fold_norm_gamma(params)
        params = quantize_llama_params(params, cfg, method=method)
    return params


def load_hf_llama(model_or_path, cfg: Optional[LlamaConfig] = None,
                  quantize: bool = True, method: Optional[str] = None):
    """(cfg, params) from a transformers model instance or a local
    checkpoint directory (from_pretrained on a local path — no egress).
    """
    if isinstance(model_or_path, str):
        from transformers import AutoModelForCausalLM
        model_or_path = AutoModelForCausalLM.from_pretrained(
            model_or_path)
    if cfg is None:
        cfg = config_from_hf(model_or_path.config)
    params = params_from_hf_state_dict(model_or_path.state_dict(), cfg,
                                       quantize=quantize, method=method)
    return cfg, params
