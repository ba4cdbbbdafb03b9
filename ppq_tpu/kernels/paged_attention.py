"""Ragged / paged decode attention over the int8 KV cache (Pallas).

Reference counterpart: none — PPQ has no serving runtime; this is the
TPU-native serving engine's decode hot path (SURVEY.md §2.11 north star).

Why a kernel: decode attention is HBM-bound, and the dense XLA einsum
reads ALL max_seq_len cache slots every step regardless of how full each
sequence actually is — at fill 16 of 1024 that is 64x wasted traffic, and
it is the dominant term of the decode step at long max_seq_len. This
kernel walks each slot's *block table* and DMAs only blocks that hold
tokens:

  * grid = (B, MB) with the block axis minor; the k/v/scale index maps
    read a scalar-prefetched block table, so any pool block can back any
    logical position (true paged attention — blocks need not be
    contiguous). Trailing grid steps past a sequence's last block CLAMP
    the index map to the last valid block: Pallas only issues a DMA when
    the mapped index changes between steps, so clamped steps fetch
    nothing and the compute is masked off.
  * flash-decoding online softmax per kv head; the kernel returns the
    UNNORMALIZED (acc, m, l) triple so the caller can merge it with the
    in-burst K/V buffer (burst decode keeps the big cache frozen) before
    normalizing — softmax(a ++ b) factorizes exactly over partial maxima.
  * int8 cache blocks dequantize in VMEM: per-(token, head) k-scales
    fold into the logits after the QK^T dot (associativity), v-scales
    fold into the probabilities before the PV dot — identical math to the
    dense path in serving/model.py:attention.

Layouts are chosen so VMEM tiles pack exactly (pallas_guide.md tiling
table) and the contiguous cache converts for free:
  * k/v pools (NB, BLK, KV*Dh) int8 — trailing dims (BLK, 128*KV) tile
    perfectly; a contiguous (B, S, KV, Dh) cache slab reshapes to this
    with zero data movement (NB = B*S/BLK, identity block table).
  * scales (NB, KV, BLK) f32 — (KV, BLK) = (8, 128) is the exact f32
    tile; storing BLK on lanes also makes the per-head scale vector a
    lane vector, broadcastable over the (rep, BLK) logits without an
    in-kernel transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _make_kernel(KV: int, rep: int, Dh: int, BLK: int, MB: int,
                 int8_cache: bool):
    def kernel(tbl_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
               acc_o, m_o, l_o, accs, ms, ls):
        j = pl.program_id(1)
        b = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            ms[:] = jnp.full_like(ms, NEG_INF)
            ls[:] = jnp.zeros_like(ls)
            accs[:] = jnp.zeros_like(accs)

        n_valid = lens_ref[b] - j * BLK        # tokens in this block

        @pl.when(n_valid > 0)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (rep, BLK), 1)
            mask = lane < n_valid
            inv_sqrt = np.float32(1.0 / np.sqrt(Dh))
            for kv in range(KV):
                qh = q_ref[0, kv]                        # (rep, Dh) bf16
                kh = k_ref[0, :, kv * Dh:(kv + 1) * Dh]  # (BLK, Dh)
                s = jax.lax.dot_general(
                    qh, kh.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (rep, BLK)
                if int8_cache:
                    s = s * ks_ref[0, kv][None, :]
                s = jnp.where(mask, s * inv_sqrt, NEG_INF)
                m_new = jnp.maximum(ms[kv], jnp.max(s, axis=1))
                corr = jnp.exp(ms[kv] - m_new)           # (rep,)
                p = jnp.exp(s - m_new[:, None])          # (rep, BLK)
                ls[kv] = ls[kv] * corr + jnp.sum(p, axis=1)
                if int8_cache:
                    p = p * vs_ref[0, kv][None, :]
                pv = jnp.dot(p.astype(jnp.bfloat16),
                             v_ref[0, :, kv * Dh:(kv + 1) * Dh]
                             .astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)  # (rep, Dh)
                accs[kv] = accs[kv] * corr[:, None] + pv
                ms[kv] = m_new

        @pl.when(j == MB - 1)
        def _():
            acc_o[0] = accs[:]
            m_o[0] = ms[:]
            l_o[0] = ls[:]
    return kernel


@functools.partial(jax.jit,
                   static_argnames=('block_size', 'interpret'))
def paged_attention_decode(q, k_pool, v_pool, k_scale, v_scale,
                           block_tables, seq_lens, *,
                           block_size: int = 128,
                           interpret: bool = False):
    """One decode step of attention over a paged int8/bf16 KV pool.

    q:            (B, KV, rep, Dh) bf16 — grouped query heads, post-rope
    k_pool/v_pool:(NB, BLK, KV*Dh) int8 (or bf16 with scales=None)
    k/v_scale:    (NB, KV, BLK) f32 or None
    block_tables: (B, MB) int32 — pool row of each logical block
    seq_lens:     (B,) int32 — tokens currently in each sequence

    Returns (acc, m, l): acc (B, KV, rep, Dh) f32 unnormalized context,
    m/l (B, KV, rep) f32 running max / exp-sum. `acc / l` is the attention
    output when there is nothing else to merge (see merge_attention).
    """
    B, KV, rep, Dh = q.shape
    NB, BLK, KVDh = k_pool.shape
    assert KVDh == KV * Dh and BLK == block_size, (k_pool.shape, q.shape)
    MB = block_tables.shape[1]
    int8_cache = k_scale is not None
    if not int8_cache:
        # dummy scale pools keep one kernel signature; never read
        k_scale = jnp.ones((1, KV, BLK), jnp.float32)
        v_scale = jnp.ones((1, KV, BLK), jnp.float32)

    def blk_idx(b, j, tbl, lens):
        nb = jax.lax.div(lens[b] + (BLK - 1), BLK)
        jj = jnp.clip(j, 0, jnp.maximum(nb - 1, 0))
        return tbl[b, jj]

    def scale_idx(b, j, tbl, lens):
        return blk_idx(b, j, tbl, lens) if int8_cache else 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, MB),
        in_specs=[
            pl.BlockSpec((1, KV, rep, Dh),
                         lambda b, j, tbl, lens: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, KVDh),
                         lambda b, j, tbl, lens: (blk_idx(b, j, tbl, lens),
                                                  0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, KVDh),
                         lambda b, j, tbl, lens: (blk_idx(b, j, tbl, lens),
                                                  0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, BLK),
                         lambda b, j, tbl, lens: (scale_idx(b, j, tbl, lens),
                                                  0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, BLK),
                         lambda b, j, tbl, lens: (scale_idx(b, j, tbl, lens),
                                                  0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, KV, rep, Dh),
                         lambda b, j, tbl, lens: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, rep), lambda b, j, tbl, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, rep), lambda b, j, tbl, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((KV, rep, Dh), jnp.float32),
            pltpu.VMEM((KV, rep), jnp.float32),
            pltpu.VMEM((KV, rep), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        _make_kernel(KV, rep, Dh, BLK, MB, int8_cache),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, rep, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, rep), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, rep), jnp.float32),
        ],
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      q.astype(jnp.bfloat16), k_pool, v_pool, k_scale, v_scale)
    return acc, m, l


def identity_block_tables(B: int, S: int, block_size: int = 128):
    """Block tables mapping each slot's logical blocks to its own rows of
    the reshaped contiguous cache ((B, S, ...) → (B*S/BLK, BLK, ...))."""
    MB = S // block_size
    return (jnp.arange(B, dtype=jnp.int32)[:, None] * MB
            + jnp.arange(MB, dtype=jnp.int32)[None, :])


def paged_attention_reference(q, k_pool, v_pool, k_scale, v_scale,
                              block_tables, seq_lens, *, block_size=128):
    """Dense jnp twin of paged_attention_decode (tests + CPU fallback)."""
    B, KV, rep, Dh = q.shape
    MB = block_tables.shape[1]
    S = MB * block_size
    # gather each sequence's blocks into a dense (B, S, KV, Dh) view
    k = k_pool[block_tables].reshape(B, S, KV, Dh)
    v = v_pool[block_tables].reshape(B, S, KV, Dh)
    s = jnp.einsum('bkrd,bskd->bkrs', q.astype(jnp.float32),
                   k.astype(jnp.float32))
    if k_scale is not None:
        ks = k_scale[block_tables]                       # (B, MB, KV, BLK)
        ks = ks.transpose(0, 2, 1, 3).reshape(B, KV, S)  # (B, KV, S)
        s = s * ks[:, :, None, :]
    s = s / np.sqrt(Dh)
    pos = jnp.arange(S)[None, :]
    mask = pos < seq_lens[:, None]
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    if v_scale is not None:
        vs = v_scale[block_tables]
        vs = vs.transpose(0, 2, 1, 3).reshape(B, KV, S)
        p = p * vs[:, :, None, :]
    acc = jnp.einsum('bkrs,bskd->bkrd', p, v.astype(jnp.float32))
    return acc, m, l


def merge_attention(parts):
    """Merge [(acc, m, l), ...] partial-softmax triples exactly:
    softmax over the concatenation of all score sets. Returns the
    normalized context (..., Dh) f32."""
    accs, ms, ls = zip(*parts)
    m = functools.reduce(jnp.maximum, ms)
    acc = sum(a * jnp.exp(mi - m)[..., None] for a, mi in zip(accs, ms))
    l = sum(li * jnp.exp(mi - m) for li, mi in zip(ls, ms))
    return acc / jnp.maximum(l, 1e-30)[..., None]


# ======================================= fused frozen + in-burst variant ==

def _make_buffered_kernel(KV: int, rep: int, Dh: int, BLK: int, MB: int,
                          nbuf: int, int8_cache: bool):
    def kernel(tbl_ref, lens_ref, step_ref, q_ref, k_ref, v_ref, ks_ref,
               vs_ref, kb_ref, vb_ref, ksb_ref, vsb_ref, ctx_o,
               accs, ms, ls):
        j = pl.program_id(1)
        b = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            ms[:] = jnp.full_like(ms, NEG_INF)
            ls[:] = jnp.zeros_like(ls)
            accs[:] = jnp.zeros_like(accs)

        n_valid = lens_ref[b] - j * BLK
        inv_sqrt = np.float32(1.0 / np.sqrt(Dh))

        def online_update(kv, s, vblk):
            # s: (rep, W) masked+scaled logits; vblk: (W, Dh)
            m_new = jnp.maximum(ms[kv], jnp.max(s, axis=1))
            corr = jnp.exp(ms[kv] - m_new)
            p = jnp.exp(s - m_new[:, None])
            ls[kv] = ls[kv] * corr + jnp.sum(p, axis=1)
            pv = jnp.dot(p.astype(jnp.bfloat16), vblk,
                         preferred_element_type=jnp.float32)
            accs[kv] = accs[kv] * corr[:, None] + pv
            ms[kv] = m_new

        @pl.when(n_valid > 0)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (rep, BLK), 1)
            mask = lane < n_valid
            for kv in range(KV):
                qh = q_ref[0, kv]
                s = jax.lax.dot_general(
                    qh, k_ref[0, :, kv * Dh:(kv + 1) * Dh]
                    .astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if int8_cache:
                    s = s * ks_ref[0, kv][None, :]
                s = jnp.where(mask, s * inv_sqrt, NEG_INF)
                vblk = v_ref[0, :, kv * Dh:(kv + 1) * Dh].astype(
                    jnp.bfloat16)
                if int8_cache:
                    # per-token v-scales fold into the value rows:
                    # p @ (vs * v) == (p * vs) @ v
                    vblk = vblk * vs_ref[0, kv][:, None].astype(
                        jnp.bfloat16)
                online_update(kv, s, vblk)

        @pl.when(j == MB - 1)
        def _():
            # in-burst buffer columns [0, step] join the same softmax
            lane = jax.lax.broadcasted_iota(jnp.int32, (rep, nbuf), 1)
            maskb = lane <= step_ref[0]
            for kv in range(KV):
                qh = q_ref[0, kv]
                s = jax.lax.dot_general(
                    qh, kb_ref[0, :, kv * Dh:(kv + 1) * Dh]
                    .astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if int8_cache:
                    s = s * ksb_ref[0, kv][None, :]
                s = jnp.where(maskb, s * inv_sqrt, NEG_INF)
                vb = vb_ref[0, :, kv * Dh:(kv + 1) * Dh].astype(jnp.bfloat16)
                if int8_cache:
                    # v-scales fold into p AFTER the exp; do it by scaling
                    # the bf16 v block columns instead (vsb is per-token):
                    # p @ (vsb * v) == (p * vsb) @ v
                    vb = vb * vsb_ref[0, kv][:, None].astype(jnp.bfloat16)
                online_update(kv, s, vb)
            ctx_o[0] = accs[:] / jnp.maximum(ls[:], 1e-30)[..., None]
    return kernel


@functools.partial(jax.jit, static_argnames=('block_size', 'interpret'))
def paged_attention_decode_buffered(q, k_pool, v_pool, k_scale, v_scale,
                                    block_tables, seq_lens, kbuf, vbuf,
                                    ks_buf, vs_buf, step, *,
                                    block_size: int = 128,
                                    interpret: bool = False):
    """Fused decode attention: frozen paged pool + in-burst buffer in ONE
    softmax, normalized context out. Removes the per-layer XLA buffer
    einsums (tiny-rep batched matmuls) and the partial-softmax merge.

    Extra args vs paged_attention_decode:
      kbuf/vbuf: (B, n, KV*Dh) same dtype as the pool
      ks_buf/vs_buf: (B, KV, n) f32 (int8 cache) or None
      step: scalar int32 — buffer columns [0, step] are valid
    Returns ctx (B, KV, rep, Dh) f32, already normalized.
    """
    B, KV, rep, Dh = q.shape
    NB, BLK, KVDh = k_pool.shape
    assert KVDh == KV * Dh and BLK == block_size
    MB = block_tables.shape[1]
    nbuf = kbuf.shape[1]
    int8_cache = k_scale is not None
    if not int8_cache:
        k_scale = jnp.ones((1, KV, BLK), jnp.float32)
        v_scale = jnp.ones((1, KV, BLK), jnp.float32)
        ks_buf = jnp.ones((B, KV, nbuf), jnp.float32)
        vs_buf = jnp.ones((B, KV, nbuf), jnp.float32)

    def blk_idx(b, j, tbl, lens, step):
        nb = jax.lax.div(lens[b] + (BLK - 1), BLK)
        jj = jnp.clip(j, 0, jnp.maximum(nb - 1, 0))
        return tbl[b, jj]

    def scale_idx(b, j, tbl, lens, step):
        return blk_idx(b, j, tbl, lens, step) if int8_cache else 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, MB),
        in_specs=[
            pl.BlockSpec((1, KV, rep, Dh),
                         lambda b, j, t, l, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, KVDh),
                         lambda b, j, t, l, s: (blk_idx(b, j, t, l, s),
                                                0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, KVDh),
                         lambda b, j, t, l, s: (blk_idx(b, j, t, l, s),
                                                0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, BLK),
                         lambda b, j, t, l, s: (scale_idx(b, j, t, l, s),
                                                0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, BLK),
                         lambda b, j, t, l, s: (scale_idx(b, j, t, l, s),
                                                0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbuf, KVDh), lambda b, j, t, l, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbuf, KVDh), lambda b, j, t, l, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, nbuf), lambda b, j, t, l, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, nbuf), lambda b, j, t, l, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KV, rep, Dh),
                               lambda b, j, t, l, s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KV, rep, Dh), jnp.float32),
            pltpu.VMEM((KV, rep), jnp.float32),
            pltpu.VMEM((KV, rep), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_buffered_kernel(KV, rep, Dh, BLK, MB, nbuf, int8_cache),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, rep, Dh), jnp.float32),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32),
      jnp.asarray(step, jnp.int32).reshape(1),
      q.astype(jnp.bfloat16), k_pool, v_pool, k_scale, v_scale,
      kbuf, vbuf, ks_buf, vs_buf)
