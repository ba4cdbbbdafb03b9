"""Speculative decoding (greedy): a small draft model proposes k tokens,
the target verifies them in ONE chunked forward, and the longest
target-agreeing prefix is accepted plus one bonus token from the
target's own distribution.

Greedy acceptance is EXACT — the emitted sequence equals what the
target would produce decoding alone (pinned by tests against plain
greedy), so speculation is purely a latency/throughput trade: the
target runs one (1, k) teacher-forced window (compute-bound, MXU
friendly — combine with cfg.act_bits=8) instead of k sequential
(1, 1) HBM-bound steps. TPU-native framing: both models' programs are
fixed-shape jitted functions (draft steps (1,1), verify (1,k)), so the
whole loop re-uses two compiled programs regardless of prompt/output
lengths.

Cache rollback costs nothing: writes are position-addressed, so
rejecting tokens just means NOT advancing seq_lens — stale slots are
overwritten the next time those positions are written.

No reference analogue (PPQ has no LLM runtime). Public method:
Leviathan et al. 2022 / Chen et al. 2023.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig
from .model import Params, forward, init_kv_cache


class _Decoder:
    """One model's compiled step/verify programs over a dense cache."""

    def __init__(self, params: Params, cfg: LlamaConfig):
        self.params, self.cfg = params, cfg
        self.cache = init_kv_cache(cfg, 1)
        self.seq_len = 0

        @jax.jit
        def chunk(cache, tokens, start):
            B, T = tokens.shape
            pos = start + jnp.arange(T, dtype=jnp.int32)[None]
            logits, cache = forward(params, cache, tokens, pos,
                                    jnp.full((B,), start, jnp.int32),
                                    jnp.full((B,), start + T, jnp.int32),
                                    cfg)
            return logits, cache
        self._chunk = chunk

    def run(self, tokens: np.ndarray) -> np.ndarray:
        """Teacher-force `tokens` (list of ids) at the current position;
        returns greedy argmax per position ((T,) int32) and advances."""
        t = jnp.asarray(np.asarray(tokens, np.int32)[None])
        logits, self.cache = self._chunk(self.cache, t,
                                         jnp.int32(self.seq_len))
        self.seq_len += int(t.shape[1])
        return np.asarray(jnp.argmax(logits[0], axis=-1), np.int32)

    def rewind(self, n_keep: int):
        """Drop everything past position n_keep (position-addressed
        writes make this free — just move the fill pointer back)."""
        assert 0 <= n_keep <= self.seq_len
        self.seq_len = n_keep


def speculative_generate(target_params: Params, target_cfg: LlamaConfig,
                         draft_params: Params, draft_cfg: LlamaConfig,
                         prompt: List[int], max_new_tokens: int,
                         k: int = 4, eos_id: Optional[int] = None
                         ) -> Tuple[List[int], dict]:
    """Greedy speculative decoding of one sequence.

    Returns (generated tokens, stats) where stats carries the acceptance
    telemetry ({'proposed', 'accepted', 'target_calls'}). The output is
    EXACTLY the target's greedy continuation of `prompt`.
    """
    assert target_cfg.vocab_size == draft_cfg.vocab_size
    tgt = _Decoder(target_params, target_cfg)
    drf = _Decoder(draft_params, draft_cfg)

    # prefill both; the last position's argmax is the first new token
    first = int(tgt.run(prompt)[-1])
    drf.run(prompt)
    out = [first]
    stats = {'proposed': 0, 'accepted': 0, 'target_calls': 1}

    # Loop invariant at the top: both caches hold exactly
    # prompt + out[:-1] (the last emitted token is fed by whoever runs
    # next). C denotes that common fill.
    while len(out) < max_new_tokens and \
            (eos_id is None or out[-1] != eos_id):
        kk = min(k, max_new_tokens - len(out))
        C = tgt.seq_len
        assert drf.seq_len == C
        # draft proposes kk tokens autoregressively; its cache gains
        # out[-1] + proposal[:kk-1] (positions C .. C+kk-1)
        proposal = []
        cur = out[-1]
        for _ in range(kk):
            cur = int(drf.run([cur])[-1])
            proposal.append(cur)
        stats['proposed'] += kk

        # ONE target window over [out[-1]] + proposal:
        # verify[i] = target's greedy token after prompt+out+proposal[:i]
        verify = tgt.run([out[-1]] + proposal)
        stats['target_calls'] += 1

        n_acc = 0
        while n_acc < kk and proposal[n_acc] == int(verify[n_acc]):
            n_acc += 1
        stats['accepted'] += n_acc
        # accepted tokens equal the target's own choices; the next token
        # (bonus on full acceptance, correction on divergence) comes from
        # the TARGET — so the emitted stream IS the target's greedy one
        emit = proposal[:n_acc] + [int(verify[n_acc])]
        if eos_id is not None and eos_id in emit:
            emit = emit[:emit.index(eos_id) + 1]
        out.extend(emit)

        # restore the invariant: caches must hold prompt + out'[:-1],
        # i.e. fill C + len(emit)
        frontier = C + len(emit)
        tgt.rewind(frontier)
        if n_acc == kk and len(emit) == kk + 1:
            # draft never saw its own last proposal in-cache
            drf.rewind(C + kk)
            drf.run([proposal[kk - 1]])
        else:
            drf.rewind(frontier)
    return out[:max_new_tokens], stats
