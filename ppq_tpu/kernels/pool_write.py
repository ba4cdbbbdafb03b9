"""Pallas paged-pool writer: merge a burst/prefill token window into the
block pools in place.

Reference counterpart: none — PPQ has no serving runtime. Why a kernel:
XLA's TPU scatter applies row updates serially (~125 ns per scattered
row measured on v5e); a decode burst writes L*B*n*2 rows of 1 KB, which
costs ~21 ms per 32-step burst at the 1B/B=128 config — 0.67 ms/step of
pure scatter overhead, ~4x the bytes-bound floor of the whole write.
This kernel instead does a block-granular read-modify-write with
input/output aliasing: per (layer, slot) it DMAs the (<= 2) destination
block rows, merges the new token columns in VMEM, and writes the rows
back — O(touched blocks) traffic and O(1) DMA issues per block.

Grid = (L, B, 2) with the 2-axis picking the first/second destination
block of the slot's window. When the window does not cross a block
boundary the second index CLAMPS to the first: Pallas skips the repeat
input DMA and flushes the (revisited) output block once, so the
non-crossing case costs exactly one block in + one block out. The body
then reads its merge base from the OUT ref on revisits (which holds the
first pass's merge), from the IN ref on first visits.

Writes for inactive slots are routed to the pool's trash row 0, exactly
like the XLA scatter path (serving/paged.py:scatter_kv_all).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_writer(n, BLK, KVDh, KV, int8_cache):
    def kernel(row_ref, off_ref, kv_new_ref, sc_new_ref, kv_in, sc_in,
               kv_out, sc_out):
        li = pl.program_id(0)
        b = pl.program_id(1)
        c = pl.program_id(2)
        del li
        row0 = row_ref[b, 0]
        row1 = row_ref[b, 1]
        off = off_ref[b]
        first = jnp.logical_or(c == 0, row0 != row1)

        # token t of the window lands at block-row offset off + t - c*BLK
        # within destination block c. Build a BLK-row view of the new
        # tokens with a dynamic ROLL of a zero-padded copy (Mosaic lowers
        # pltpu.roll with a traced shift; value dynamic_slice it does
        # not): row o holds token o - (off - c*BLK), wraparound rows are
        # masked to the base content. (For a clamped second visit the
        # mask is provably empty — the merge rewrites the first pass's
        # result unchanged.)
        shift = off - c * BLK                        # token 0's row, mod BLK
        # roll amount must be non-negative; the MASK uses the unreduced
        # shift (negative for the second block => token indices line up)
        rshift = jax.lax.rem(shift + 2 * BLK, BLK)
        o_ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
        tok = o_ids - shift                          # token index per row
        mask = jnp.logical_and(tok >= 0, tok < n)    # (BLK, 1)

        kv_new = kv_new_ref[0, 0]                    # (2, n, KVDh)
        for plane in range(2):
            # Mosaic's dynamic rotate is 32-bit-only: roll in f32 (int8 /
            # bf16 values are exactly representable; converted back after
            # the masked merge)
            padded = kv_new[plane].astype(jnp.float32)
            if n < BLK:
                padded = jnp.concatenate(
                    [padded, jnp.zeros((BLK - n, KVDh), jnp.float32)],
                    axis=0)
            shifted = pltpu.roll(padded, rshift, 0)
            base = jnp.where(first, kv_in[0, 0, plane], kv_out[0, 0, plane])
            kv_out[0, 0, plane] = jnp.where(
                mask, shifted.astype(base.dtype), base)

        if int8_cache:
            # scales: (2, KV, n) new values; block row (2, KV, BLK) with
            # the token axis on LANES — same roll along the last dim
            sc_new = sc_new_ref[0, 0]                # (2, KV, n)
            ltok = jax.lax.broadcasted_iota(
                jnp.int32, (KV, BLK), 1) - shift
            lmask = jnp.logical_and(ltok >= 0, ltok < n)
            for plane in range(2):
                padded = sc_new[plane]
                if n < BLK:
                    padded = jnp.concatenate(
                        [padded, jnp.zeros((KV, BLK - n), padded.dtype)],
                        axis=1)
                shifted = pltpu.roll(padded, rshift, 1)
                base = jnp.where(first, sc_in[0, 0, plane],
                                 sc_out[0, 0, plane])
                sc_out[0, 0, plane] = jnp.where(lmask, shifted, base)
    return kernel


@functools.partial(jax.jit, static_argnames=('interpret',))
def pool_write(pools_kv, pools_scale, kv_new, sc_new, rows2, off,
               interpret: bool = False):
    """Merge a token window into the paged pools, in place.

    pools_kv:    (L, NB, 2, BLK, KVDh) int8|bf16 — DONATED/aliased
    pools_scale: (L, NB, 2, KV, BLK) f32 or None — DONATED/aliased
    kv_new:      (L, B, 2, n, KVDh) new K (plane 0) / V (plane 1) columns
    sc_new:      (L, B, 2, KV, n) f32 or None
    rows2:       (B, 2) int32 — destination pool rows (block c=0, c=1);
                 equal entries mean the window fits one block; row 0 is
                 the trash block (inactive slots)
    off:         (B,) int32 — first token's offset inside block c=0
    Returns (pools_kv, pools_scale) with the window written.
    """
    L, NB, two, BLK, KVDh = pools_kv.shape
    _, B, _, n, _ = kv_new.shape
    assert two == 2 and n <= BLK, (pools_kv.shape, kv_new.shape)
    int8_cache = pools_scale is not None
    KV = pools_scale.shape[3] if int8_cache else 1
    if not int8_cache:
        pools_scale = jnp.zeros((L, NB, 2, 1, BLK), jnp.float32)
        sc_new = jnp.zeros((L, B, 2, 1, n), jnp.float32)

    def blk_of(li, b, c, rows, off):
        return rows[b, c]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L, B, 2),
        in_specs=[
            pl.BlockSpec((1, 1, 2, n, KVDh),
                         lambda li, b, c, rows, off: (li, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, KV if int8_cache else 1, n),
                         lambda li, b, c, rows, off: (li, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, BLK, KVDh),
                         lambda li, b, c, rows, off:
                         (li, rows[b, c], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, KV if int8_cache else 1, BLK),
                         lambda li, b, c, rows, off:
                         (li, rows[b, c], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 2, BLK, KVDh),
                         lambda li, b, c, rows, off:
                         (li, rows[b, c], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, KV if int8_cache else 1, BLK),
                         lambda li, b, c, rows, off:
                         (li, rows[b, c], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kv_out, sc_out = pl.pallas_call(
        _make_writer(n, BLK, KVDh, KV, int8_cache),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pools_kv.shape, pools_kv.dtype),
            jax.ShapeDtypeStruct(pools_scale.shape, pools_scale.dtype),
        ],
        # inputs (after the 2 scalar-prefetch operands): kv_new, sc_new,
        # pools_kv, pools_scale — the pools alias the outputs (in-place)
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(rows2.astype(jnp.int32), off.astype(jnp.int32),
      kv_new, sc_new, pools_kv, pools_scale)
    if not int8_cache:
        sc_out = None
    return kv_out, sc_out
