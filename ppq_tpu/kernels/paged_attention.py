"""Ragged / paged decode attention over the int8 KV cache (Pallas).

Reference counterpart: none — PPQ has no serving runtime; this is the
TPU-native serving engine's decode hot path (SURVEY.md §2.11 north star).

Why a kernel: decode attention is HBM-bound, and the dense XLA einsum
reads ALL max_seq_len cache slots every step regardless of how full each
sequence actually is — at fill 16 of 1024 that is 64x wasted traffic, and
XLA's batched tiny-dot attention is additionally compute-inefficient
(measured: a dense bucket-64 XLA read is SLOWER than this kernel reading
the same data). This kernel walks each slot's *block table* and DMAs only
blocks that hold tokens.

Design (v2 — rebuilt after on-chip ablations of the first kernel):

  * The per-(slot, block) cost on this hardware is dominated by DMA
    issue/wait transactions (~200ns each), NOT by the dots and NOT by the
    softmax VPU chain (ablations: removing both dots saved ~20%; removing
    scales/exp/masks saved ~0%). Everything below minimizes transactions:
      - K and V live in ONE fused pool (NB, 2, BLK, KV*Dh) and both scale
        arrays in ONE (NB, 2, KV, BLK) → 2 DMAs per slot-block, not 4.
      - q and the outputs are FULL-ARRAY VMEM blocks (constant index
        maps): one transfer per call instead of one per slot.
      - block_size is a parameter: contiguous (burst) callers pick larger
        blocks at larger fills → fewer transactions for the same bytes.
  * grid = (B, MB) with the block axis minor; the kv/scale index maps
    read a scalar-prefetched block table, so any pool block can back any
    logical position (true paged attention). Trailing grid steps past a
    sequence's last block CLAMP the index map to the last valid block:
    Pallas only issues a DMA when the mapped index changes between steps,
    so clamped steps fetch nothing and the compute is masked off.
  * GQA decode has only KV*rep (= n_heads) query rows, so per-head dots
    underfill both MXU and VPU tiles. The kernel instead builds a
    BLOCK-DIAGONAL query matrix qb (R, KV*Dh) — row kv*rep+r holds head
    (kv, r)'s query in columns [kv*Dh, (kv+1)*Dh) — and computes ALL
    heads' logits with ONE dot against the fused K block: full (R, BLK)
    VPU tiles for the whole softmax chain. The PV dot accumulates WIDE
    (R, KV*Dh); off-diagonal blocks accumulate garbage that the final
    diagonal extraction discards (elementwise accumulation never mixes
    columns). qb is built by the caller in XLA (build_qblock) — cheap,
    fused, and not repeated per slot inside the kernel.
  * flash-decoding online softmax; the kernel returns the UNNORMALIZED
    (acc, m, l) triple so the caller can merge it with the in-burst K/V
    buffer (burst decode keeps the big cache frozen) before normalizing —
    softmax(a ++ b) factorizes exactly over partial maxima.
  * int8 cache blocks dequantize in VMEM: per-(token, head) k-scales
    fold into the logits after the QK^T dot (associativity), v-scales
    fold into the probabilities before the PV dot — identical math to the
    dense path in serving/model.py:attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ------------------------------------------------------------ host helpers --

def build_qblock(q: jnp.ndarray) -> jnp.ndarray:
    """(B, KV, rep, Dh) → block-diagonal (B, KV*rep, KV*Dh) bf16.

    Row kv*rep + r carries q[b, kv, r] in columns [kv*Dh, (kv+1)*Dh) and
    zeros elsewhere, so `qb @ K_fused^T` computes every head's logits in
    one dot. Built in XLA (fuses into the surrounding program)."""
    B, KV, rep, Dh = q.shape
    R = KV * rep
    q2 = q.reshape(B, R, Dh).astype(jnp.bfloat16)
    qw = jnp.tile(q2, (1, 1, KV))                           # (B, R, KV*Dh)
    row_kv = jnp.arange(R)[:, None] // rep
    col_kv = jnp.arange(KV * Dh)[None, :] // Dh
    return jnp.where((row_kv == col_kv)[None], qw, 0)


def fuse_pools(k_pool, v_pool, k_scale=None, v_scale=None):
    """Stack separate K/V pools (NB, BLK, KV*Dh) and scale pools
    (NB, KV, BLK) into the kernel's fused layouts: kv (NB, 2, BLK, KV*Dh)
    and scales (NB, 2, KV, BLK) (or None). This copies — burst callers do
    it ONCE per burst (or store pools fused natively, serving/paged.py)."""
    kv = jnp.stack([k_pool, v_pool], axis=1)
    sc = None
    if k_scale is not None:
        sc = jnp.stack([k_scale, v_scale], axis=1)
    return kv, sc


def identity_block_tables(B: int, S: int, block_size: int = 128):
    """Block tables mapping each slot's logical blocks to its own rows of
    the reshaped contiguous cache ((B, S, ...) → (B*S/BLK, BLK, ...))."""
    MB = S // block_size
    return (jnp.arange(B, dtype=jnp.int32)[:, None] * MB
            + jnp.arange(MB, dtype=jnp.int32)[None, :])


# ------------------------------------------------------------------ kernel --

def _make_kernel(B, KV, rep, Dh, BLK, MB, int8_cache, scales_full,
                 layered):
    R = KV * rep

    def kernel(*refs):
        if layered:
            (tbl_ref, lens_ref, _lay_ref, qb_ref, kv_ref, sc_ref,
             acc_o, ml_o, accw_s, ms, ls) = refs
            kv_k, kv_v = kv_ref[0, 0, 0], kv_ref[0, 0, 1]
        else:
            (tbl_ref, lens_ref, qb_ref, kv_ref, sc_ref,
             acc_o, ml_o, accw_s, ms, ls) = refs
            kv_k, kv_v = kv_ref[0, 0], kv_ref[0, 1]
        j = pl.program_id(1)
        b = pl.program_id(0)

        @pl.when(jnp.logical_and(b == 0, j == 0))
        def _():
            # one-time: uninitialized VMEM may hold NaN bit patterns that
            # would survive the corr=0 first-block rescale as NaN*0
            accw_s[:] = jnp.zeros_like(accw_s)

        @pl.when(j == 0)
        def _():
            ms[:] = jnp.full_like(ms, NEG_INF)
            ls[:] = jnp.zeros_like(ls)

        n_valid = lens_ref[b] - j * BLK

        if scales_full:
            # whole scale pool is VMEM-resident (ONE transfer per call);
            # index it with the same clamped table row the kv DMA used —
            # this halves the per-(slot, block) DMA transaction count,
            # which ablations showed is the kernel's dominant cost
            nb = jax.lax.div(lens_ref[b] + (BLK - 1), BLK)
            jj = jnp.clip(j, 0, jnp.maximum(nb - 1, 0))
            row = tbl_ref[b, jj]

        def _sc(plane):
            if layered:
                return (sc_ref[0, row, plane] if scales_full
                        else sc_ref[0, 0, plane])
            return (sc_ref[row, plane] if scales_full
                    else sc_ref[0, plane])

        @pl.when(n_valid > 0)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, (R, BLK), 1)
            mask = lane < n_valid
            inv_sqrt = np.float32(1.0 / np.sqrt(Dh))
            s = jax.lax.dot_general(
                qb_ref[b], kv_k.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (R, BLK)
            if int8_cache:
                ks = jnp.broadcast_to(_sc(0)[:, None, :],
                                      (KV, rep, BLK)).reshape(R, BLK)
                s = s * ks
            s = jnp.where(mask, s * inv_sqrt, NEG_INF)
            m_new = jnp.maximum(ms[:], jnp.max(s, axis=1, keepdims=True))
            # first valid block: ms = -inf ⇒ corr = 0 exactly, so the
            # stale accw from the previous slot is rescaled away
            corr = jnp.exp(ms[:] - m_new)                    # (R, 1)
            p = jnp.exp(s - m_new)                           # (R, BLK)
            ls[:] = ls[:] * corr + jnp.sum(p, axis=1, keepdims=True)
            if int8_cache:
                vs = jnp.broadcast_to(_sc(1)[:, None, :],
                                      (KV, rep, BLK)).reshape(R, BLK)
                p = p * vs
            pv = jnp.dot(p.astype(jnp.bfloat16),
                         kv_v.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)  # (R, KV*Dh)
            accw_s[:] = accw_s[:] * corr + pv   # off-diag garbage discarded
            ms[:] = m_new

        @pl.when(j == MB - 1)
        def _():
            row_kv = jax.lax.broadcasted_iota(
                jnp.int32, (R, KV * Dh), 0) // rep
            col_kv = jax.lax.broadcasted_iota(
                jnp.int32, (R, KV * Dh), 1) // Dh
            accd = jnp.where(row_kv == col_kv, accw_s[:], 0) \
                .reshape(R, KV, Dh).sum(axis=1)              # (R, Dh)
            acc_o[b] = accd.reshape(KV, rep, Dh)
            ml_o[b] = jnp.concatenate([ms[:], ls[:]],
                                      axis=1).reshape(KV, rep, 2)
    return kernel


# scale pools at or below this byte size ride as ONE full-array VMEM
# transfer instead of a per-(slot, block) DMA — the kernel is transaction-
# bound, so this halves its dominant cost. 6 MB leaves VMEM headroom for
# the double-buffered kv blocks, qb, and the outputs.
_SCALES_FULL_MAX_BYTES = 6 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=('block_size', 'interpret'))
def paged_attention_decode_fused(q, kv_pool, kv_scale, block_tables,
                                 seq_lens, layer=None, *,
                                 block_size: int = 128,
                                 interpret: bool = False):
    """One decode step of attention over a FUSED paged int8/bf16 KV pool.

    q:        (B, KV, rep, Dh) — grouped query heads, post-rope
    kv_pool:  (NB, 2, BLK, KV*Dh) int8|bf16 — [k; v] per block row; OR
              (L, NB, 2, BLK, KV*Dh) with `layer` selecting the slab
    kv_scale: (NB, 2, KV, BLK) f32 (or L-leading) or None (bf16 pool)
    block_tables: (B, MB) int32 — pool row of each logical block
    seq_lens: (B,) int32 — tokens currently in each sequence
    layer:    int32 scalar (device value OK) — required iff kv_pool has an
              L axis. The kernel DMAs directly from that layer's slab, so
              callers never slice the pool (slicing a multi-GB pool into
              per-layer slabs materializes a full copy per burst).

    Returns (acc, m, l): acc (B, KV, rep, Dh) f32 unnormalized context,
    m/l (B, KV, rep) f32 running max / exp-sum. `acc / l` is the attention
    output when there is nothing else to merge (see merge_attention).
    Rows with seq_lens == 0 return (finite-garbage, -inf, 0) — exactly the
    empty contribution under merge_attention.
    """
    B, KV, rep, Dh = q.shape
    layered = kv_pool.ndim == 5
    if layered:
        assert layer is not None, 'layered pool needs a layer index'
        L, NB, two, BLK, KVDh = kv_pool.shape
    else:
        NB, two, BLK, KVDh = kv_pool.shape
    assert KVDh == KV * Dh and BLK == block_size and two == 2, \
        (kv_pool.shape, q.shape, block_size)
    MB = block_tables.shape[1]
    int8_cache = kv_scale is not None
    # VMEM-resident scale budget is per LAYER slab (one transfer per call)
    sc_slab_bytes = (kv_scale.size // (L if layered else 1) * 4
                     if int8_cache else 0)
    scales_full = int8_cache and sc_slab_bytes <= _SCALES_FULL_MAX_BYTES
    if not int8_cache:
        kv_scale = jnp.ones(((1,) if layered else ()) + (1, 2, KV, BLK),
                            jnp.float32)

    n_scalar = 3 if layered else 2

    def blk_idx(b, j, tbl, lens):
        nb = jax.lax.div(lens[b] + (BLK - 1), BLK)
        jj = jnp.clip(j, 0, jnp.maximum(nb - 1, 0))
        return tbl[b, jj]

    def scale_idx(b, j, tbl, lens):
        return blk_idx(b, j, tbl, lens) if int8_cache else 0

    if layered:
        kv_spec = pl.BlockSpec(
            (1, 1, 2, BLK, KVDh),
            lambda b, j, tbl, lens, lay: (lay[0], blk_idx(b, j, tbl, lens),
                                          0, 0, 0),
            memory_space=pltpu.VMEM)
        if scales_full:
            sc_spec = pl.BlockSpec(
                (1,) + kv_scale.shape[1:],
                lambda b, j, tbl, lens, lay: (lay[0], 0, 0, 0, 0),
                memory_space=pltpu.VMEM)
        else:
            sc_spec = pl.BlockSpec(
                (1, 1, 2, KV, BLK),
                lambda b, j, tbl, lens, lay:
                (lay[0] if int8_cache else 0,
                 scale_idx(b, j, tbl, lens), 0, 0, 0),
                memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((B, KV * rep, KVDh),
                              lambda b, j, tbl, lens, lay: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((B, KV, rep, Dh),
                         lambda b, j, tbl, lens, lay: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, rep, 2),
                         lambda b, j, tbl, lens, lay: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        kv_spec = pl.BlockSpec(
            (1, 2, BLK, KVDh),
            lambda b, j, tbl, lens: (blk_idx(b, j, tbl, lens), 0, 0, 0),
            memory_space=pltpu.VMEM)
        if scales_full:
            sc_spec = pl.BlockSpec(kv_scale.shape,
                                   lambda b, j, tbl, lens: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
        else:
            sc_spec = pl.BlockSpec((1, 2, KV, BLK),
                                   lambda b, j, tbl, lens:
                                   (scale_idx(b, j, tbl, lens), 0, 0, 0),
                                   memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((B, KV * rep, KVDh),
                              lambda b, j, tbl, lens: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((B, KV, rep, Dh),
                         lambda b, j, tbl, lens: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, KV, rep, 2),
                         lambda b, j, tbl, lens: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    R = KV * rep
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(B, MB),
        in_specs=[q_spec, kv_spec, sc_spec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((R, KVDh), jnp.float32),     # wide accumulator
            pltpu.VMEM((R, 1), jnp.float32),        # running max
            pltpu.VMEM((R, 1), jnp.float32),        # running exp-sum
        ],
    )
    scalars = [block_tables.astype(jnp.int32), seq_lens.astype(jnp.int32)]
    if layered:
        scalars.append(jnp.asarray(layer, jnp.int32).reshape(1))
    acc, ml = pl.pallas_call(
        _make_kernel(B, KV, rep, Dh, BLK, MB, int8_cache, scales_full,
                     layered),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, rep, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, rep, 2), jnp.float32),
        ],
        interpret=interpret,
    )(*scalars, build_qblock(q), kv_pool, kv_scale)
    return acc, ml[..., 0], ml[..., 1]


# ------------------------------------------------- grouped (multi-slot) ----
# The per-(slot, block) grid step carries a fixed cost (DMA issue/wait,
# index-map evaluation, loop bookkeeping) that dominates the fused kernel at
# small fills: profiled at B=128 / fill=16 the kernel spends ~2.9 us per
# grid step while the block's bytes need only ~0.3 us. The grouped variant
# amortizes that fixed cost over G slots: the window is repacked BLOCK-MAJOR
# (pool row j*B + b, so the G slots' rows for block j are contiguous) and
# ONE grid step DMAs a (G, 2, BLK, KV*Dh) slab, then runs the same per-slot
# online-softmax updates in an unrolled loop. Compute and bytes are
# unchanged; grid steps (and their fixed cost) drop by G.

def _make_grouped_kernel(G, KV, rep, Dh, BLK, MB, int8_cache, layered):
    """Batched-over-G grouped kernel (v3). The v2 kernel unrolled a
    python loop over the G slots in a group — ~20 small (R, BLK) VPU ops
    per slot per grid step; at shallow fills (tiny DMAs) that instruction
    stream WAS the kernel cost (62.7 us/call measured at cap=32 vs ~10 us
    of DMA). v3 runs one batched (G, R, BLK) op chain per grid step and
    builds the block-diagonal q IN-KERNEL from a compact (G, R, Dh)
    operand (the host-built (B, R, KV*Dh) qblock operand cost a 105
    us/step layout copy per call — r5 trace). Fully-masked groups are
    handled by an explicit p-mask (exp underflow can't be relied on when
    m stays at NEG_INF), so no per-slot pl.when guards remain."""
    R = KV * rep
    # scale pool is lane-padded to >= 128 columns (Mosaic rejects sub-128
    # memref slices on the lane dim); the kernel loads the padded row and
    # VALUE-slices the first BLK columns
    SCP = max(BLK, 128)

    def kernel(*refs):
        if layered:
            (lens_ref, _glens_ref, _lay_ref, q_ref, lensv_ref, kv_ref,
             sc_ref, acc_o, ml_o, qb_s, accw_s, ms, ls) = refs
            kv_ref = kv_ref.at[0]
            sc_ref = sc_ref.at[0]
        else:
            (lens_ref, _glens_ref, q_ref, lensv_ref, kv_ref, sc_ref,
             acc_o, ml_o, qb_s, accw_s, ms, ls) = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            ms[:] = jnp.full_like(ms, NEG_INF)
            ls[:] = jnp.zeros_like(ls)
            accw_s[:] = jnp.zeros_like(accw_s)
            # block-diagonal q built once per group: row kv*rep+r carries
            # q[g, kv, r] in columns [kv*Dh, (kv+1)*Dh), zeros elsewhere
            q = q_ref[...]                                   # (G, R, Dh)
            qw = jnp.concatenate([q] * KV, axis=2)           # (G, R, KVDh)
            row_kv = jax.lax.broadcasted_iota(
                jnp.int32, (G, R, KV * Dh), 1) // rep
            col_kv = jax.lax.broadcasted_iota(
                jnp.int32, (G, R, KV * Dh), 2) // Dh
            qb_s[:] = jnp.where(row_kv == col_kv, qw, 0)

        inv_sqrt = np.float32(1.0 / np.sqrt(Dh))
        # per-slot valid counts ride a LANE-BROADCAST VMEM operand
        # ((B, 128) i32, row b = seq_lens[b] in every lane): SMEM scalars
        # can't vectorize into a (G, 1, BLK) mask without a relayout.
        # A width-1 value slice broadcasts against any BLK.
        nv = lensv_ref[...][:, :1] - j * BLK                 # (G, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, R, BLK), 2)
        mask = lane < nv[:, None, :]                         # (G, R, BLK)
        s = jax.lax.dot_general(
            qb_s[...], kv_ref[:, 0].astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (G, R, BLK)
        if int8_cache:
            ks = sc_ref[:, 0][:, :, None, :SCP][..., :BLK]   # (G,KV,1,BLK)
            s = s * jnp.broadcast_to(ks, (G, KV, rep, BLK)) \
                .reshape(G, R, BLK)
        s = jnp.where(mask, s * inv_sqrt, NEG_INF)
        m_new = jnp.maximum(ms[...],
                            jnp.max(s, axis=2, keepdims=True))
        corr = jnp.exp(ms[...] - m_new)                      # (G, R, 1)
        # explicit mask: a fully-invalid group keeps m == NEG_INF and
        # exp(s - m) would be exp(0) = 1 on every masked column
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)         # (G, R, BLK)
        ls[...] = ls[...] * corr + jnp.sum(p, axis=2, keepdims=True)
        if int8_cache:
            vs = sc_ref[:, 1][:, :, None, :SCP][..., :BLK]
            p = p * jnp.broadcast_to(vs, (G, KV, rep, BLK)) \
                .reshape(G, R, BLK)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), kv_ref[:, 1].astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (G, R, KVDh)
        accw_s[:] = accw_s[...] * corr + pv
        ms[:] = m_new

        @pl.when(j == MB - 1)
        def _():
            row_kv = jax.lax.broadcasted_iota(
                jnp.int32, (G, R, KV * Dh), 1) // rep
            col_kv = jax.lax.broadcasted_iota(
                jnp.int32, (G, R, KV * Dh), 2) // Dh
            accd = jnp.where(row_kv == col_kv, accw_s[...], 0) \
                .reshape(G, R, KV, Dh).sum(axis=2)           # (G, R, Dh)
            acc_o[...] = accd.reshape(G, KV, rep, Dh)
            ml_o[...] = jnp.concatenate([ms[...], ls[...]], axis=2) \
                .reshape(G, KV, rep, 2)
    return kernel


def blockmajor_window(cache_k, cache_v, cache_ks, cache_vs, cap, blk):
    """Repack a contiguous cache window [0, cap) into the grouped kernel's
    BLOCK-MAJOR fused layout: kv (NBp*B, 2, BLK, KV*Dh) with pool row
    j*B + b holding slot b's block j, scales (NBp*B, 2, KV, BLK) | None.
    O(window) copy — burst callers do it once per burst.

    Accepts either one layer's (B, S, KV, Dh) slabs or the full stacked
    (L, B, S, KV, Dh) cache; with an L axis the outputs gain an L-leading
    axis and feed the kernels' `layer=` index. ALWAYS prefer the stacked
    form for multi-layer loops: slicing `cache['k'][li]` per layer makes
    XLA materialize every full (B, S, KV, Dh) slab — measured 12.8 ms of
    pure slab copies per decode burst at the 1B/B=128 config — while the
    batched repack touches only the O(L*window) bytes."""
    if cache_k.ndim == 5:
        L, B, _, KV, Dh = cache_k.shape
        nbp = cap // blk
        k2 = cache_k[:, :, :cap].reshape(L, B, nbp, blk, KV * Dh)
        v2 = cache_v[:, :, :cap].reshape(L, B, nbp, blk, KV * Dh)
        kv = jnp.stack([k2, v2], axis=3).transpose(0, 2, 1, 3, 4, 5) \
            .reshape(L, nbp * B, 2, blk, KV * Dh)
        sc = None
        if cache_ks is not None:
            ks2 = cache_ks[:, :, :cap].reshape(L, B, nbp, blk, KV) \
                .transpose(0, 1, 2, 4, 3)                # (L,B,NBp,KV,BLK)
            vs2 = cache_vs[:, :, :cap].reshape(L, B, nbp, blk, KV) \
                .transpose(0, 1, 2, 4, 3)
            sc = jnp.stack([ks2, vs2], axis=3) \
                .transpose(0, 2, 1, 3, 4, 5) \
                .reshape(L, nbp * B, 2, KV, blk)
            if blk < 128:
                # lane-pad to 128: Mosaic rejects sub-128 slices on the
                # lane dim at the memref level, so the scale pool always
                # carries 128 columns and the kernel VALUE-slices [:blk]
                sc = jnp.pad(sc, ((0, 0),) * 4 + ((0, 128 - blk),))
        return kv, sc
    B, _, KV, Dh = cache_k.shape
    nbp = cap // blk
    k2 = cache_k[:, :cap].reshape(B, nbp, blk, KV * Dh)
    v2 = cache_v[:, :cap].reshape(B, nbp, blk, KV * Dh)
    kv = jnp.stack([k2, v2], axis=2).transpose(1, 0, 2, 3, 4) \
        .reshape(nbp * B, 2, blk, KV * Dh)
    sc = None
    if cache_ks is not None:
        ks2 = cache_ks[:, :cap].reshape(B, nbp, blk, KV) \
            .transpose(0, 1, 3, 2)                       # (B,NBp,KV,BLK)
        vs2 = cache_vs[:, :cap].reshape(B, nbp, blk, KV) \
            .transpose(0, 1, 3, 2)
        sc = jnp.stack([ks2, vs2], axis=2).transpose(1, 0, 2, 3, 4) \
            .reshape(nbp * B, 2, KV, blk)
        if blk < 128:
            sc = jnp.pad(sc, ((0, 0),) * 3 + ((0, 128 - blk),))
    return kv, sc


def grouped_group_size(batch: int, block_size: int, kv_dh: int = 1024,
                       itemsize: int = 1, n_heads: int = 16) -> int:
    """Largest G in {64,...,1} dividing batch whose per-group VMEM
    working set stays within an 11 MiB allowance (of the 16 MiB scoped
    VMEM): the double-buffered (G, 2, BLK, KV*Dh) cache slab PLUS the
    per-slot wide accumulator (G, R, KV*Dh) f32 and the in-kernel
    block-diagonal q scratch (G, R, KV*Dh) bf16. Budgeted in BYTES —
    pass kv_dh = n_kv_heads * head_dim and the cache itemsize so models
    with wider KV rows shrink G instead of blowing VMEM. Bigger G =
    fewer grid steps; with the batched v3 kernel the per-step VPU chain
    is shared by the whole group, so G is capped only by VMEM."""
    budget = 11 * 1024 * 1024
    per_slot = (2 * 2 * block_size * kv_dh * itemsize   # k+v, 2 buffers
                + n_heads * kv_dh * (4 + 2))            # accw f32 + qb bf16
    g = 64
    while g > 1 and (batch % g or g * per_slot > budget):
        g //= 2
    return g


@functools.partial(jax.jit, static_argnames=('block_size', 'group',
                                              'interpret'))
def paged_attention_decode_grouped(q, kv_bm, sc_bm, seq_lens, layer=None, *,
                                   block_size: int, group: int,
                                   interpret: bool = False):
    """Grouped-slot decode attention over a BLOCK-MAJOR contiguous window
    (see blockmajor_window). Same (acc, m, l) contract and identical math
    to paged_attention_decode_fused with identity tables; one grid step
    serves `group` slots. Trailing blocks past every slot in a group clamp
    their DMA row (no refetch); per-slot masks keep the math exact.

    kv_bm may carry an L-leading axis ((L, NBp*B, 2, BLK, KV*Dh)) with
    `layer` (device int32 OK) selecting the slab — multi-layer loops MUST
    use this form: the kernel DMAs from the layer's rows directly, so
    callers never slice the stacked pool (a per-layer python slice makes
    XLA materialize each full slab — 12.8 ms/burst measured)."""
    B, KV, rep, Dh = q.shape
    G = group
    layered = kv_bm.ndim == 5
    if layered:
        assert layer is not None, 'layered pool needs a layer index'
        L, NBtot, two, BLK, KVDh = kv_bm.shape
    else:
        NBtot, two, BLK, KVDh = kv_bm.shape
    assert two == 2 and BLK == block_size and KVDh == KV * Dh
    assert B % G == 0 and NBtot % B == 0, (B, G, NBtot)
    MB = NBtot // B
    int8_cache = sc_bm is not None
    SCP = max(BLK, 128)       # scale pool lane-padded (see blockmajor)
    if not int8_cache:
        sc_bm = jnp.ones(((1,) if layered else ()) + (G, 2, KV, SCP),
                         jnp.float32)
    BG = B // G
    # group consensus fill: the DMA fetches through the group's deepest
    # slot; shallower slots mask the surplus
    glens = jnp.max(seq_lens.reshape(BG, G), axis=1)

    def pool_row(bg, j, glens):
        nb = jax.lax.div(glens[bg] + (BLK - 1), BLK)
        jj = jnp.clip(j, 0, jnp.maximum(nb - 1, 0))
        return jj * BG + bg

    if layered:
        kv_spec = pl.BlockSpec(
            (1, G, 2, BLK, KVDh),
            lambda bg, j, lens, glens, lay:
            (lay[0], pool_row(bg, j, glens), 0, 0, 0),
            memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec(
            (1, G, 2, KV, SCP),
            lambda bg, j, lens, glens, lay:
            ((lay[0] if int8_cache else 0),
             (pool_row(bg, j, glens) if int8_cache else 0), 0, 0, 0),
            memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((G, KV * rep, Dh),
                              lambda bg, j, lens, glens, lay: (bg, 0, 0),
                              memory_space=pltpu.VMEM)
        lv_spec = pl.BlockSpec((G, 128),
                               lambda bg, j, lens, glens, lay: (bg, 0),
                               memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((G, KV, rep, Dh),
                         lambda bg, j, lens, glens, lay: (bg, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, KV, rep, 2),
                         lambda bg, j, lens, glens, lay: (bg, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        n_scalar = 3
    else:
        def kv_idx(bg, j, lens, glens):
            return (pool_row(bg, j, glens), 0, 0, 0)

        def sc_idx(bg, j, lens, glens):
            if not int8_cache:
                return (0, 0, 0, 0)
            return kv_idx(bg, j, lens, glens)
        kv_spec = pl.BlockSpec((G, 2, BLK, KVDh), kv_idx,
                               memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((G, 2, KV, SCP), sc_idx,
                               memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((G, KV * rep, Dh),
                              lambda bg, j, lens, glens: (bg, 0, 0),
                              memory_space=pltpu.VMEM)
        lv_spec = pl.BlockSpec((G, 128),
                               lambda bg, j, lens, glens: (bg, 0),
                               memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((G, KV, rep, Dh),
                         lambda bg, j, lens, glens: (bg, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, KV, rep, 2),
                         lambda bg, j, lens, glens: (bg, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        n_scalar = 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(BG, MB),
        in_specs=[q_spec, lv_spec, kv_spec, sc_spec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((G, KV * rep, KVDh), jnp.bfloat16),   # qb
            pltpu.VMEM((G, KV * rep, KVDh), jnp.float32),    # accw
            pltpu.VMEM((G, KV * rep, 1), jnp.float32),       # m
            pltpu.VMEM((G, KV * rep, 1), jnp.float32),       # l
        ],
    )
    scalars = [seq_lens.astype(jnp.int32), glens.astype(jnp.int32)]
    if layered:
        scalars.append(jnp.asarray(layer, jnp.int32).reshape(1))
    # lane-broadcast lens: the kernel's (G, R, BLK) mask needs per-slot
    # valid counts on the lane dim (SMEM scalars can't vectorize there)
    lensv = jnp.broadcast_to(
        seq_lens.astype(jnp.int32)[:, None], (B, 128))
    acc, ml = pl.pallas_call(
        _make_grouped_kernel(G, KV, rep, Dh, BLK, MB, int8_cache, layered),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, rep, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, KV, rep, 2), jnp.float32),
        ],
        interpret=interpret,
    )(*scalars, q.reshape(B, KV * rep, Dh).astype(jnp.bfloat16),
      lensv, kv_bm, sc_bm)
    return acc, ml[..., 0], ml[..., 1]


@functools.partial(jax.jit,
                   static_argnames=('block_size', 'interpret'))
def paged_attention_decode(q, k_pool, v_pool, k_scale, v_scale,
                           block_tables, seq_lens, *,
                           block_size: int = 128,
                           interpret: bool = False):
    """Separate-pool convenience wrapper around the fused kernel: stacks
    the pools PER CALL (a copy — one-shot/test callers only; burst loops
    must fuse once outside the loop, see fuse_pools)."""
    kv, sc = fuse_pools(k_pool, v_pool, k_scale, v_scale)
    return paged_attention_decode_fused(q, kv, sc, block_tables, seq_lens,
                                        block_size=block_size,
                                        interpret=interpret)


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
# (kept as a tested capability: single kernel covering the frozen pool AND
# the in-burst buffer in one online softmax. Measured 6-10% slower than the
# kernel + XLA-merge composition on v5e and O(n) with burst length, so the
# engine uses the composition above — see serving/model.py.)

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
