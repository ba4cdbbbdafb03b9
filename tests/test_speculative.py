"""Speculative decoding (serving/speculative.py): greedy acceptance is
EXACT — output equals target-only greedy regardless of the draft — and
a perfect draft accepts every proposal."""

import numpy as np
import pytest

from ppq_tpu.serving import LlamaConfig, init_llama_params
from ppq_tpu.serving.speculative import _Decoder, speculative_generate


def _cfg(**kw):
    base = dict(vocab_size=97, d_model=64, n_layers=2, n_heads=4,
                n_kv_heads=2, d_ff=128, max_seq_len=128, max_batch=1,
                weight_bits=8)
    base.update(kw)
    return LlamaConfig(**base)


def _plain_greedy(params, cfg, prompt, n):
    dec = _Decoder(params, cfg)
    cur = int(dec.run(prompt)[-1])
    out = [cur]
    while len(out) < n:
        cur = int(dec.run([cur])[-1])
        out.append(cur)
    return out


def test_exact_vs_plain_greedy_disagreeing_draft():
    """Draft is a DIFFERENT model (different seed and size): acceptance
    will be poor, but the emitted stream must still be byte-identical to
    the target decoding alone."""
    tcfg = _cfg()
    dcfg = _cfg(d_model=32, n_layers=1, d_ff=64, n_heads=2, n_kv_heads=2)
    tparams = init_llama_params(tcfg, seed=0)
    dparams = init_llama_params(dcfg, seed=99)
    prompt = [5, 9, 3, 11, 2]
    ref = _plain_greedy(tparams, tcfg, prompt, 20)
    got, stats = speculative_generate(tparams, tcfg, dparams, dcfg,
                                      prompt, 20, k=4)
    assert got == ref, (got, ref)
    assert stats['proposed'] > 0 and stats['target_calls'] >= 1


def test_perfect_draft_accepts_everything():
    """Draft == target: every proposal matches, so each verify window
    emits k+1 tokens and acceptance is 100%."""
    cfg = _cfg()
    params = init_llama_params(cfg, seed=1)
    prompt = [7, 2, 4]
    ref = _plain_greedy(params, cfg, prompt, 17)
    got, stats = speculative_generate(params, cfg, params, cfg,
                                      prompt, 17, k=4)
    assert got == ref
    assert stats['accepted'] == stats['proposed'], stats
    # 1 prefill + ceil(16 emitted-after-first / (k+1)) verify calls
    assert stats['target_calls'] <= 1 + -(-16 // 5) + 1


def test_eos_stops_early():
    cfg = _cfg()
    params = init_llama_params(cfg, seed=2)
    prompt = [3, 8, 1]
    ref = _plain_greedy(params, cfg, prompt, 24)
    # pick the 6th generated token as a fake eos: speculative must stop
    # at the same place plain greedy would
    eos = ref[5]
    cut = ref[:ref.index(eos) + 1]
    got, _ = speculative_generate(params, cfg, params, cfg, prompt, 24,
                                  k=3, eos_id=eos)
    assert got == cut, (got, cut)


def test_varied_k_all_exact():
    cfg = _cfg()
    tparams = init_llama_params(cfg, seed=3)
    dparams = init_llama_params(cfg, seed=4)
    prompt = [13, 21, 34]
    ref = _plain_greedy(tparams, cfg, prompt, 15)
    for k in (1, 2, 3, 5, 8):
        got, _ = speculative_generate(tparams, cfg, dparams, cfg,
                                      prompt, 15, k=k)
        assert got == ref, (k, got, ref)
