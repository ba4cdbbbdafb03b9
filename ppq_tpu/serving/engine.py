"""TPU serving engine: TP-sharded quantized inference with continuous
batching (north-star capability — the reference has no serving runtime,
SURVEY.md §2.11).

Architecture (per the standard JAX scaling recipe):
  * Mesh ('dp', 'tp'); serving uses the 'tp' axis — qkv/gate/up weights are
    column-parallel (output dim sharded over tp), o/down row-parallel (input
    dim sharded), embed/lm_head sharded over vocab; XLA inserts the psum /
    all-gather collectives over ICI from the sharding annotations alone.
  * KV cache shards over its kv-head axis (column-parallel attention keeps
    each head's K/V local to its chip — no collective in the cache path).
  * decode_step is one jitted program: batched single-token forward over the
    int8 KV cache with cache donation (no per-step reallocation).
  * prefill pads the prompt to bucket lengths to bound recompilation.
  * continuous batching: a slot-based scheduler admits requests into free
    batch slots between decode steps (prefill-on-admit), retiring finished
    sequences eagerly — throughput is sustained at max_batch occupancy.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import LlamaConfig
from .model import Params, forward, init_kv_cache


# ------------------------------------------------------------ shardings ----
def param_shardings(cfg: LlamaConfig, mesh: Mesh) -> Dict[str, Any]:
    """Megatron-style TP layout over the 'tp' mesh axis."""
    col = {'w': NamedSharding(mesh, P(None, 'tp')),
           'w_int': NamedSharding(mesh, P(None, 'tp')),
           'w_packed': NamedSharding(mesh, P(None, 'tp')),
           'scale': NamedSharding(mesh, P('tp'))}
    row = {'w': NamedSharding(mesh, P('tp', None)),
           'w_int': NamedSharding(mesh, P('tp', None)),
           'w_packed': NamedSharding(mesh, P('tp', None)),
           'scale': NamedSharding(mesh, P())}
    rep = NamedSharding(mesh, P())

    def pick(d, layout):
        return {k: layout[k] for k in d}

    exp3 = NamedSharding(mesh, P('tp', None, None))
    exp2 = NamedSharding(mesh, P('tp', None))
    moe_layout = {'w': exp3, 'w_int': exp3, 'w_packed': exp3, 'scale': exp2}

    def layer_spec(layer):
        spec = {
            'attn_norm': rep, 'mlp_norm': rep,
            'wq': pick(layer['wq'], col),
            'wk': pick(layer['wk'], col),
            'wv': pick(layer['wv'], col),
            'wo': pick(layer['wo'], row),
        }
        if 'moe' in layer:
            # experts shard over the tp axis (ep-as-tp on a 2-axis mesh;
            # a dedicated 'ep' axis works the same via moe.shard_moe_params)
            spec['moe'] = {'router': rep}
            for wname in ('w_gate', 'w_up', 'w_down'):
                spec['moe'][wname] = pick(layer['moe'][wname], moe_layout)
        else:
            spec['w_gate'] = pick(layer['w_gate'], col)
            spec['w_up'] = pick(layer['w_up'], col)
            spec['w_down'] = pick(layer['w_down'], row)
        return spec

    def spec_of(params):
        return {
            'embed': rep,
            'final_norm': rep,
            'lm_head': pick(params['lm_head'], col),
            'layers': [layer_spec(l) for l in params['layers']],
        }
    return spec_of


def cache_shardings(cfg: LlamaConfig, mesh: Mesh) -> Dict[str, NamedSharding]:
    """KV cache: shard the kv-head axis over tp (replicate when GQA head
    count doesn't divide — tp should normally be ≤ n_kv_heads)."""
    if cfg.n_kv_heads % mesh.shape['tp'] == 0:
        kv = NamedSharding(mesh, P(None, None, None, 'tp', None))
        sc = NamedSharding(mesh, P(None, None, None, 'tp'))
    else:
        kv = NamedSharding(mesh, P())
        sc = NamedSharding(mesh, P())
    out = {'k': kv, 'v': kv}
    if cfg.kv_cache_bits == 8:
        out['k_scale'] = sc
        out['v_scale'] = sc
    return out


# --------------------------------------------------------------- request ---
class Request:
    def __init__(self, rid: int, prompt: List[int], max_new_tokens: int = 32,
                 eos_id: Optional[int] = None):
        self.rid = rid
        self.prompt = list(prompt)
        self.max_new_tokens = max_new_tokens
        self.eos_id = eos_id
        self.generated: List[int] = []
        self.done = False


# ---------------------------------------------------------------- engine ---
class ServingEngine:
    def __init__(self, cfg: LlamaConfig, params: Params,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            spec = param_shardings(cfg, mesh)(params)
            params = jax.tree.map(jax.device_put, params, spec)
            self._cache_sharding = cache_shardings(cfg, mesh)
        else:
            self._cache_sharding = None
        self.params = params
        self.cache = self._new_cache()
        B = cfg.max_batch
        self.slot_len = np.zeros(B, np.int64)        # tokens in cache per slot
        self.slot_req: List[Optional[Request]] = [None] * B
        self._decode = self._build_decode()
        self._prefill = {}                            # bucket → jitted fn

    # --------------------------------------------------------------- state
    def _new_cache(self):
        cache = init_kv_cache(self.cfg, self.cfg.max_batch)
        if self._cache_sharding is not None:
            cache = {k: jax.device_put(v, self._cache_sharding[k])
                     for k, v in cache.items()}
        return cache

    # ------------------------------------------------------------ compiled
    def _build_decode(self):
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_step(params, cache, tokens, seq_lens):
            # tokens: (B,) current token per slot; seq_lens: (B,) cache fill
            positions = seq_lens[:, None]                    # (B, 1)
            logits, cache = forward(params, cache, tokens[:, None],
                                    positions, seq_lens, seq_lens + 1, cfg)
            next_tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return next_tok, cache
        return decode_step

    def _prefill_fn(self, bucket: int):
        if bucket in self._prefill:
            return self._prefill[bucket]
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnums=())
        def prefill(params, cache, tokens, length, slot):
            # tokens: (1, bucket) padded prompt for one slot
            positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
            write_pos = jnp.zeros((1,), jnp.int32)
            # slice this slot's cache, run, write back
            def take(c):
                return jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1)
            sub_cache = {k: take(v) for k, v in cache.items()}
            logits, sub_cache = forward(params, sub_cache, tokens,
                                        positions, write_pos,
                                        jnp.array([bucket]), cfg)
            def put(c, s):
                return jax.lax.dynamic_update_slice_in_dim(
                    c, s, slot, axis=1)
            cache = {k: put(cache[k], sub_cache[k]) for k in cache}
            last = jnp.argmax(logits[0, length - 1, :]).astype(jnp.int32)
            return last, cache
        self._prefill[bucket] = prefill
        return prefill

    # ------------------------------------------------------------- serving
    def _bucket_for(self, n: int) -> int:
        for b in self.cfg.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f'prompt length {n} exceeds largest bucket '
                         f'{self.cfg.prefill_buckets[-1]}')

    def _admit(self, req: Request, slot: int):
        bucket = self._bucket_for(len(req.prompt))
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :len(req.prompt)] = req.prompt
        fn = self._prefill_fn(bucket)
        last, self.cache = fn(self.params, self.cache, jnp.asarray(toks),
                              len(req.prompt), slot)
        self.slot_req[slot] = req
        self.slot_len[slot] = len(req.prompt)
        req.generated.append(int(last))

    def run(self, requests: List[Request],
            progress: bool = False) -> List[Request]:
        """Continuous-batching generation loop until all requests finish."""
        waiting = list(requests)
        cur_tok = np.zeros(self.cfg.max_batch, np.int32)
        while waiting or any(r is not None for r in self.slot_req):
            # admit into free slots
            for slot in range(self.cfg.max_batch):
                if self.slot_req[slot] is None and waiting:
                    req = waiting.pop(0)
                    self._admit(req, slot)
                    cur_tok[slot] = req.generated[-1]
            # batched decode step
            active = [i for i, r in enumerate(self.slot_req) if r is not None]
            if not active:
                break
            seq_lens = jnp.asarray(self.slot_len, jnp.int32)
            next_tok, self.cache = self._decode(
                self.params, self.cache, jnp.asarray(cur_tok), seq_lens)
            next_np = np.asarray(next_tok)
            for slot in active:
                req = self.slot_req[slot]
                self.slot_len[slot] += 1
                tok = int(next_np[slot])
                req.generated.append(tok)
                cur_tok[slot] = tok
                limit_hit = len(req.generated) >= req.max_new_tokens
                eos_hit = req.eos_id is not None and tok == req.eos_id
                cache_full = self.slot_len[slot] >= self.cfg.max_seq_len - 1
                if limit_hit or eos_hit or cache_full:
                    req.done = True
                    self.slot_req[slot] = None
                    self.slot_len[slot] = 0
        return requests

    # ---------------------------------------------------------------- bench
    def benchmark_serving(self, n_requests: int = 32, prompt_len: int = 64,
                          max_new_tokens: int = 32,
                          seed: int = 0) -> Dict[str, float]:
        """End-to-end continuous-batching throughput: a burst of requests
        streamed through run() — includes prefill, scheduling, and decode."""
        rng = np.random.RandomState(seed)
        reqs = [Request(i, rng.randint(1, self.cfg.vocab_size,
                                       prompt_len).tolist(),
                        max_new_tokens=max_new_tokens)
                for i in range(n_requests)]
        # warm the compiled paths (one admit + one decode)
        warm = [Request(-1, reqs[0].prompt, max_new_tokens=2)]
        self.run(warm)
        self.cache = self._new_cache()
        self.slot_len[:] = 0
        self.slot_req = [None] * self.cfg.max_batch

        t0 = time.perf_counter()
        self.run(reqs)
        dt = time.perf_counter() - t0
        gen_tokens = sum(len(r.generated) for r in reqs)
        prompt_tokens = n_requests * prompt_len
        return {
            'requests_per_sec': n_requests / dt,
            'generated_tokens_per_sec': gen_tokens / dt,
            'total_tokens_per_sec': (gen_tokens + prompt_tokens) / dt,
            'wall_s': dt,
        }

    def benchmark_decode(self, batch: Optional[int] = None, steps: int = 50,
                         warmup: int = 5) -> Dict[str, float]:
        """Steady-state decode throughput (tokens/sec) at full batch."""
        B = batch or self.cfg.max_batch
        cache = self._new_cache()
        tokens = jnp.zeros((self.cfg.max_batch,), jnp.int32)
        seq_lens = jnp.full((self.cfg.max_batch,), 16, jnp.int32)
        for _ in range(warmup):
            tok, cache = self._decode(self.params, cache, tokens, seq_lens)
        tok.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(steps):
            tok, cache = self._decode(self.params, cache, tokens, seq_lens)
        tok.block_until_ready()
        dt = time.perf_counter() - t0
        toks_per_s = B * steps / dt
        return {'tokens_per_sec': toks_per_s,
                'ms_per_step': dt / steps * 1e3,
                'batch': B}
