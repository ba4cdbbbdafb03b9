"""HF Llama checkpoint conversion (serving/convert.py): the engine's
model math validated AGAINST THE CANONICAL transformers implementation —
teacher-forced logits parity pins rope convention, GQA, SiLU MLP, and
RMSNorm all at once."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
transformers = pytest.importorskip('transformers')

import jax.numpy as jnp  # noqa: E402

from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params
from ppq_tpu.serving.convert import (config_from_hf, load_hf_llama,
                                     params_from_hf_state_dict)
from ppq_tpu.serving.engine import Request
from ppq_tpu.serving.model import forward, init_kv_cache


@pytest.fixture(scope='module')
def hf_model():
    hf_cfg = transformers.LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=97,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        attention_dropout=0.0)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def test_config_mapping(hf_model):
    cfg = config_from_hf(hf_model.config)
    assert (cfg.d_model, cfg.n_layers, cfg.n_heads, cfg.n_kv_heads,
            cfg.d_ff, cfg.vocab_size) == (64, 2, 4, 2, 128, 97)


def test_logits_match_transformers(hf_model):
    """bf16 (unquantized) converted params: our forward's logits track
    the HF fp32 reference within bf16 tolerance — one oracle for rope /
    GQA / SiLU / RMSNorm conventions together."""
    cfg = config_from_hf(hf_model.config)
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       quantize=False)
    rng = np.random.RandomState(0)
    toks = rng.randint(1, 96, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks.astype(np.int64))) \
            .logits.float().numpy()

    B, T = toks.shape
    cache = init_kv_cache(cfg, B)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    got, _ = forward(params, cache, jnp.asarray(toks), pos,
                     jnp.zeros((B,), jnp.int32),
                     jnp.full((B,), T, jnp.int32), cfg)
    got = np.asarray(got, np.float32)
    scale = max(1.0, float(np.abs(ref).max()))
    err = float(np.abs(got - ref).max())
    assert err < 5e-2 * scale, err
    # argmax agreement on every position (greedy decode equivalence)
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_converted_int8_engine_generates(hf_model):
    cfg, params = load_hf_llama(hf_model)        # int8 by default
    cfg.prefill_buckets = (16,)
    eng = ServingEngine(cfg, params)
    reqs = [Request(0, [5, 9, 12, 3], max_new_tokens=5)]
    eng.run(reqs)
    assert reqs[0].done and len(reqs[0].generated) == 5


def test_tied_embeddings_fall_back_to_embed(hf_model):
    sd = {k: v for k, v in hf_model.state_dict().items()
          if k != 'lm_head.weight'}
    cfg = config_from_hf(hf_model.config)
    params = params_from_hf_state_dict(sd, cfg, quantize=False)
    np.testing.assert_array_equal(
        np.asarray(params['lm_head']['w'], np.float32),
        np.asarray(params['embed'], np.float32).T)


def test_gptq_on_converted_checkpoint(hf_model):
    """Calibrated quantizers consume the converted float tree."""
    from ppq_tpu.serving import gptq_quantize_llama_params
    cfg = config_from_hf(hf_model.config)
    cfg.weight_bits = 4
    fp = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                   quantize=False)
    rng = np.random.RandomState(1)
    params = gptq_quantize_llama_params(fp, cfg,
                                        rng.randint(1, 96, (2, 16)))
    cfg.prefill_buckets = (16,)
    eng = ServingEngine(cfg, params)
    reqs = [Request(0, [7, 2], max_new_tokens=3)]
    eng.run(reqs)
    assert reqs[0].done and len(reqs[0].generated) == 3
