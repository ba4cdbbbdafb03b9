"""Automatic prefix caching (serving/paged.py PrefixCache + refcounted
BlockAllocator): exactness vs an uncached engine, block reuse, refcount
lifecycles on both allocator backends, LRU eviction."""

import numpy as np
import pytest

from ppq_tpu.serving import LlamaConfig, ServingEngine, init_llama_params
from ppq_tpu.serving.engine import Request
from ppq_tpu.serving.paged import BlockAllocator, PrefixCache


# ------------------------------------------------ allocator refcounts -----

@pytest.mark.parametrize('native', [False, True])
def test_adopt_retain_unref_lifecycle(native):
    from ppq_tpu.utils.native import native_alloc
    if native and native_alloc() is None:
        pytest.skip('no native toolchain')
    a = BlockAllocator(num_blocks=8, max_batch=2, max_blocks_per_seq=4,
                       block_size=128, native=native)
    a.ensure(0, 2 * 128)                      # slot0 owns 2 blocks
    blocks = a.slot_block_ids(0)
    assert len(blocks) == 2
    a.retain(blocks)                          # cache holds them too
    a.release(0)
    # cache holds keep them out of the free list
    assert a.free_blocks == 7 - 2
    a.adopt(1, blocks)                        # new slot shares them
    a.ensure(1, 3 * 128)                      # grows with 1 fresh block
    assert a.slot_block_ids(1)[:2] == blocks
    assert a.free_blocks == 7 - 3
    a.release(1)
    assert a.free_blocks == 7 - 2             # cache refs still live
    a.unref(blocks)
    assert a.free_blocks == 7                 # all returned


@pytest.mark.parametrize('native', [False, True])
def test_release_shared_block_only_once(native):
    from ppq_tpu.utils.native import native_alloc
    if native and native_alloc() is None:
        pytest.skip('no native toolchain')
    a = BlockAllocator(num_blocks=6, max_batch=3, max_blocks_per_seq=2,
                       block_size=128, native=native)
    a.ensure(0, 128)
    b = a.slot_block_ids(0)
    a.adopt(1, b)
    a.adopt(2, b)
    a.release(0)
    a.release(1)
    assert a.free_blocks == 4                 # still owned by slot 2
    a.release(2)
    assert a.free_blocks == 5


# ----------------------------------------------------- engine-level -------

def _cfg(prefix_blocks=0):
    cfg = LlamaConfig(vocab_size=97, d_model=256, n_layers=2, n_heads=2,
                      n_kv_heads=2, d_ff=256, max_seq_len=512,
                      max_batch=2, weight_bits=8,
                      prefill_buckets=(128,))
    cfg.paged_kv = True
    cfg.kv_block_size = 128
    cfg.ragged_interpret = True
    cfg.use_pallas_matmul = False
    cfg.use_ragged_attention = False
    cfg.prefix_cache_blocks = prefix_blocks
    return cfg


def _gen(engine, prompts, n=4):
    outs = []
    for p in prompts:                 # sequential waves → reuse kicks in
        reqs = [Request(0, list(p), max_new_tokens=n)]
        engine.run(reqs, sync_every=2)
        outs.append(reqs[0].generated)
    return outs


def test_prefix_cache_exact_and_hits():
    """Identical 200-token prompts: the second admit must HIT the cache
    and produce exactly the uncached engine's tokens."""
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, 96, 200).tolist()
    params = init_llama_params(_cfg(), seed=0)

    ref = _gen(ServingEngine(_cfg(0), params), [prompt, prompt])
    eng = ServingEngine(_cfg(32), params)
    got = _gen(eng, [prompt, prompt])
    assert got == ref, (got, ref)
    assert eng.prefix_cache.hits == 1 and eng.prefix_cache.misses == 1
    # the cached first block got adopted, not re-allocated
    assert len(eng.prefix_cache.index) >= 1


def test_prefix_cache_divergent_tail_exact():
    """Prompts share the first 128-token block but diverge after: hit on
    the shared block, exact logits for both tails."""
    rng = np.random.RandomState(1)
    head = rng.randint(1, 96, 128).tolist()
    p1 = head + rng.randint(1, 96, 70).tolist()
    p2 = head + rng.randint(1, 96, 90).tolist()
    params = init_llama_params(_cfg(), seed=1)
    ref = _gen(ServingEngine(_cfg(0), params), [p1, p2])
    eng = ServingEngine(_cfg(32), params)
    got = _gen(eng, [p1, p2])
    assert got == ref
    assert eng.prefix_cache.hits == 1


def test_prefix_cache_blocks_survive_retirement():
    """After the originating request retires, cached blocks stay live
    (the cache's own reference) and the pool accounting balances."""
    rng = np.random.RandomState(2)
    prompt = rng.randint(1, 96, 200).tolist()
    eng = ServingEngine(_cfg(32), init_llama_params(_cfg(), seed=2))
    _gen(eng, [prompt])
    held = len(eng.prefix_cache.index)
    assert held == 1                          # one full block cached
    assert eng._alloc.free_blocks == eng._alloc.num_blocks - 1 - held
    eng.prefix_cache.clear()
    assert eng._alloc.free_blocks == eng._alloc.num_blocks - 1


def test_prefix_cache_lru_eviction():
    a = BlockAllocator(num_blocks=16, max_batch=2, max_blocks_per_seq=8,
                       block_size=4, native=False)
    pc = PrefixCache(a, block_size=4, max_blocks=2)
    a.ensure(0, 12)                           # 3 blocks
    blocks = a.slot_block_ids(0)
    prompt = list(range(12))
    pc.insert(prompt, blocks)                 # wants 3, cap 2 → 2 cached
    assert len(pc.index) == 2
    # different prompt evicts the oldest link
    a.ensure(1, 4)
    pc.insert(list(range(100, 104)), a.slot_block_ids(1))
    assert len(pc.index) == 2
    a.release(0)
    a.release(1)
    pc.clear()
    assert a.free_blocks == 15
