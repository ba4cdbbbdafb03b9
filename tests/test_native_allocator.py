"""Native C++ paged-KV block allocator (csrc/allocator.cc) vs the Python
twin: bit-identical allocation order under a randomized admit/grow/retire
schedule, matching error semantics, all-or-nothing exhaustion."""

import numpy as np
import pytest

from ppq_tpu.serving.paged import BlockAllocator
from ppq_tpu.utils.native import native_alloc

pytestmark = pytest.mark.skipif(native_alloc() is None,
                                reason='no native toolchain')


def _pair(**kw):
    return (BlockAllocator(native=True, **kw),
            BlockAllocator(native=False, **kw))


def test_native_backend_selected():
    nat, py = _pair(num_blocks=9, max_batch=2, max_blocks_per_seq=4,
                    block_size=128)
    assert nat._nlib is not None and py._nlib is None


def test_randomized_schedule_bit_identical():
    kw = dict(num_blocks=33, max_batch=8, max_blocks_per_seq=4,
              block_size=128)
    nat, py = _pair(**kw)
    rng = np.random.RandomState(0)
    for step in range(500):
        slot = int(rng.randint(0, 8))
        action = rng.rand()
        if action < 0.6:
            tokens = int(rng.randint(1, 4 * 128 + 1))
            err_n = err_p = None
            try:
                nat.ensure(slot, tokens)
            except (MemoryError, ValueError) as e:
                err_n = type(e)
            try:
                py.ensure(slot, tokens)
            except (MemoryError, ValueError) as e:
                err_p = type(e)
            assert err_n is err_p, (step, err_n, err_p)
        else:
            nat.release(slot)
            py.release(slot)
        assert nat.free_blocks == py.free_blocks, step
        np.testing.assert_array_equal(nat.tables(), py.tables())


def test_exhaustion_is_all_or_nothing():
    kw = dict(num_blocks=4, max_batch=2, max_blocks_per_seq=8,
              block_size=128)
    for alloc in _pair(**kw):
        alloc.ensure(0, 2 * 128)           # takes 2 of 3 free blocks
        free_before = alloc.free_blocks
        t_before = alloc.tables().copy()
        with pytest.raises(MemoryError):
            alloc.ensure(1, 3 * 128)       # needs 3, only 1 left
        assert alloc.free_blocks == free_before
        np.testing.assert_array_equal(alloc.tables(), t_before)


def test_over_max_blocks_raises_value_error():
    for alloc in _pair(num_blocks=64, max_batch=2, max_blocks_per_seq=2,
                       block_size=128):
        with pytest.raises(ValueError):
            alloc.ensure(0, 5 * 128)


def test_engine_runs_on_native_allocator():
    """End to end: the paged engine's scheduler hot loop drives the
    native allocator (default backend when the toolchain exists)."""
    from ppq_tpu.serving import LlamaConfig, ServingEngine, \
        init_llama_params
    from ppq_tpu.serving.engine import Request
    cfg = LlamaConfig(vocab_size=97, d_model=256, n_layers=2, n_heads=2,
                      n_kv_heads=2, d_ff=256, max_seq_len=128,
                      max_batch=4, weight_bits=8, prefill_buckets=(16,))
    cfg.paged_kv = True
    cfg.kv_block_size = 128
    cfg.ragged_interpret = True
    cfg.use_pallas_matmul = False
    cfg.use_ragged_attention = False
    eng = ServingEngine(cfg, init_llama_params(cfg, seed=0))
    assert eng._alloc._nlib is not None
    rng = np.random.RandomState(0)
    reqs = [Request(i, rng.randint(1, 96, 12).tolist(), max_new_tokens=5)
            for i in range(3)]
    eng.run(reqs, sync_every=4)
    assert all(r.done and len(r.generated) == 5 for r in reqs)
    # all blocks returned after retirement
    assert eng._alloc.free_blocks == eng._alloc.num_blocks - 1
