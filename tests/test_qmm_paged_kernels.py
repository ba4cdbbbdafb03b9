"""Parity tests for the serving-side Pallas kernels (interpret mode on the
CPU mesh): fused dequant-matmul (kernels/qmm.py) and ragged/paged decode
attention (kernels/paged_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppq_tpu.kernels.paged_attention import (identity_block_tables,
                                             merge_attention,
                                             paged_attention_decode,
                                             paged_attention_reference)
from ppq_tpu.kernels.qmm import (pack_int4_splithalf, qmm_int4, qmm_int8,
                                 supports, unpack_int4_splithalf)


class TestQmm:
    def test_int8_parity(self):
        rng = np.random.default_rng(0)
        B, D, F = 8, 512, 640
        w8 = rng.integers(-127, 128, (D, F)).astype(np.int8)
        s = ((rng.random(F) + 0.5) * 1e-2).astype(np.float32)
        x = rng.standard_normal((B, D)).astype(np.float32)
        ref = x @ (w8.astype(np.float32) * s)
        out = np.asarray(qmm_int8(jnp.asarray(x), jnp.asarray(w8),
                                  jnp.asarray(s), out_dtype=jnp.float32,
                                  interpret=True))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, err

    def test_int4_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.integers(-8, 8, (256, 128)).astype(np.int8)
        packed = pack_int4_splithalf(q)
        assert packed.shape == (128, 128)
        np.testing.assert_array_equal(
            np.asarray(unpack_int4_splithalf(jnp.asarray(packed))), q)

    def test_int4_parity(self):
        rng = np.random.default_rng(2)
        B, D, F = 8, 512, 640
        q4 = rng.integers(-8, 8, (D, F)).astype(np.int8)
        s = ((rng.random(F) + 0.5) * 1e-2).astype(np.float32)
        x = rng.standard_normal((B, D)).astype(np.float32)
        ref = x @ (q4.astype(np.float32) * s)
        out = np.asarray(qmm_int4(jnp.asarray(x),
                                  jnp.asarray(pack_int4_splithalf(q4)),
                                  jnp.asarray(s), out_dtype=jnp.float32,
                                  interpret=True))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, err

    def test_supports(self):
        assert supports(2048, 5632)
        assert supports(2048, 32000)
        assert not supports(100, 5632)       # contraction not tiled
        assert not supports(2048, 100)       # width not tiled


class TestPagedAttention:
    def _mk(self, int8=True, lens=(0, 1, 130, 512)):
        rng = np.random.default_rng(0)
        B, KV, rep, Dh, BLK, MB = len(lens), 2, 2, 128, 128, 4
        NB = 2 * B * MB
        q = rng.standard_normal((B, KV, rep, Dh)).astype(np.float32) * 0.5
        kp = rng.integers(-127, 128, (NB, BLK, KV * Dh)).astype(np.int8)
        vp = rng.integers(-127, 128, (NB, BLK, KV * Dh)).astype(np.int8)
        if int8:
            ks = ((rng.random((NB, KV, BLK)) + 0.5) * 0.02).astype(
                np.float32)
            vs = ((rng.random((NB, KV, BLK)) + 0.5) * 0.02).astype(
                np.float32)
        else:
            kp = (kp.astype(np.float32) * 0.02).astype(jnp.bfloat16)
            vp = (vp.astype(np.float32) * 0.02).astype(jnp.bfloat16)
            ks = vs = None
        tbl = rng.permutation(NB)[:B * MB].reshape(B, MB).astype(np.int32)
        return tuple(jnp.asarray(a) if a is not None else None
                     for a in (q, kp, vp, ks, vs, tbl,
                               np.asarray(lens, np.int32)))

    @pytest.mark.parametrize('int8', [True, False])
    def test_kernel_matches_reference(self, int8):
        args = self._mk(int8=int8)
        got = merge_attention([paged_attention_decode(*args,
                                                      interpret=True)])
        want = merge_attention([paged_attention_reference(*args)])
        got, want = np.asarray(got), np.asarray(want)
        assert np.allclose(got[0], 0)        # empty slot → zero context
        err = np.abs(got[1:] - want[1:]).max() / (np.abs(want[1:]).max()
                                                  + 1e-9)
        assert err < 2e-2, err

    def test_merge_equals_joint_softmax(self):
        """Splitting a score set and merging partial triples must equal the
        joint softmax over the union (flash factorization exactness)."""
        rng = np.random.default_rng(3)
        s = rng.standard_normal((2, 3, 16)).astype(np.float32) * 3
        v = rng.standard_normal((2, 3, 16, 8)).astype(np.float32)

        def triple(scores, values):
            m = scores.max(-1)
            p = np.exp(scores - m[..., None])
            return (jnp.asarray(np.einsum('bks,bksd->bkd', p, values)),
                    jnp.asarray(m), jnp.asarray(p.sum(-1)))

        whole = np.einsum('bks,bksd->bkd',
                          np.exp(s - s.max(-1, keepdims=True))
                          / np.exp(s - s.max(-1, keepdims=True))
                          .sum(-1, keepdims=True), v)
        merged = merge_attention([triple(s[..., :5], v[:, :, :5]),
                                  triple(s[..., 5:], v[:, :, 5:])])
        np.testing.assert_allclose(np.asarray(merged), whole, rtol=1e-5,
                                   atol=1e-6)

    def test_identity_tables(self):
        t = np.asarray(identity_block_tables(2, 512, 128))
        assert t.shape == (2, 4)
        assert t[0].tolist() == [0, 1, 2, 3]
        assert t[1].tolist() == [4, 5, 6, 7]


class TestBufferedPagedAttention:
    @pytest.mark.parametrize('int8', [True, False])
    def test_fused_matches_separate_merge(self, int8):
        from ppq_tpu.kernels.paged_attention import (
            paged_attention_decode_buffered)
        rng = np.random.default_rng(7)
        B, KV, rep, Dh, BLK, MB, n = 3, 2, 2, 128, 128, 2, 32
        NB = B * MB + 1
        q = rng.standard_normal((B, KV, rep, Dh)).astype(np.float32) * 0.4
        if int8:
            kp = rng.integers(-127, 128, (NB, BLK, KV * Dh)).astype(np.int8)
            vp = rng.integers(-127, 128, (NB, BLK, KV * Dh)).astype(np.int8)
            ks = ((rng.random((NB, KV, BLK)) + .5) * .02).astype(np.float32)
            vs = ((rng.random((NB, KV, BLK)) + .5) * .02).astype(np.float32)
            kb = rng.integers(-127, 128, (B, n, KV * Dh)).astype(np.int8)
            vb = rng.integers(-127, 128, (B, n, KV * Dh)).astype(np.int8)
            ksb = ((rng.random((B, KV, n)) + .5) * .02).astype(np.float32)
            vsb = ((rng.random((B, KV, n)) + .5) * .02).astype(np.float32)
        else:
            kp = (rng.standard_normal((NB, BLK, KV * Dh)) * .5).astype(
                jnp.bfloat16)
            vp = (rng.standard_normal((NB, BLK, KV * Dh)) * .5).astype(
                jnp.bfloat16)
            kb = (rng.standard_normal((B, n, KV * Dh)) * .5).astype(
                jnp.bfloat16)
            vb = (rng.standard_normal((B, n, KV * Dh)) * .5).astype(
                jnp.bfloat16)
            ks = vs = ksb = vsb = None
        tbl = np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB)
        lens = np.asarray([0, 5, 200], np.int32)
        step = 17

        ctx = np.asarray(paged_attention_decode_buffered(
            jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
            None if ks is None else jnp.asarray(ks),
            None if vs is None else jnp.asarray(vs),
            jnp.asarray(tbl), jnp.asarray(lens), jnp.asarray(kb),
            jnp.asarray(vb),
            None if ksb is None else jnp.asarray(ksb),
            None if vsb is None else jnp.asarray(vsb),
            step, interpret=True))

        # reference: frozen triple + dense-buffer triple, merged
        frozen = paged_attention_decode(
            jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
            None if ks is None else jnp.asarray(ks),
            None if vs is None else jnp.asarray(vs),
            jnp.asarray(tbl), jnp.asarray(lens), interpret=True)
        kbf = np.asarray(kb, np.float32).reshape(B, n, KV, Dh)
        vbf = np.asarray(vb, np.float32).reshape(B, n, KV, Dh)
        s = np.einsum('bkrd,bjkd->bkrj', q, kbf)
        if int8:
            s = s * ksb[:, :, None, :]           # ksb: (B, KV, n)
        s = s / np.sqrt(Dh)
        mask = np.arange(n)[None, None, None, :] <= step
        s = np.where(mask, s, -1e30)
        m = s.max(-1)
        p = np.exp(s - m[..., None])
        l = p.sum(-1)
        if int8:
            p = p * vsb[:, :, None, :]
        acc = np.einsum('bkrj,bjkd->bkrd', p, vbf)
        want = np.asarray(merge_attention(
            [frozen, (jnp.asarray(acc), jnp.asarray(m), jnp.asarray(l))]))
        err = np.abs(ctx - want).max() / (np.abs(want).max() + 1e-9)
        assert err < 2e-2, err


class TestPoolWriteKernel:
    """Pallas block-RMW pool writer vs the XLA scatter (exact parity)."""

    def _setup(self, int8=True):
        rng = np.random.default_rng(0)
        L, NB, BLK, KV, Dh = 3, 24, 128, 2, 64
        B, T = 5, 32
        pools = {'kv': jnp.asarray(
            rng.integers(-100, 100, (L, NB, 2, BLK, KV * Dh)),
            jnp.int8 if int8 else jnp.bfloat16)}
        if int8:
            pools['kv_scale'] = jnp.asarray(
                rng.random((L, NB, 2, KV, BLK)), jnp.float32)
        k = jnp.asarray(rng.integers(-100, 100, (L, B, T, KV, Dh)),
                        pools['kv'].dtype)
        v = jnp.asarray(rng.integers(-100, 100, (L, B, T, KV, Dh)),
                        pools['kv'].dtype)
        ks = jnp.asarray(rng.random((L, B, KV, T)), jnp.float32) \
            if int8 else None
        vs = jnp.asarray(rng.random((L, B, KV, T)), jnp.float32) \
            if int8 else None
        tables = jnp.asarray(
            (rng.permutation(NB - 1)[:B * 4] + 1).reshape(B, 4), jnp.int32)
        # aligned, mid-block, inactive, at-boundary, crossing
        write_pos = jnp.asarray([0, 100, 120, 96, 127], jnp.int32)
        active = jnp.asarray([True, True, False, True, True])
        return pools, k, v, ks, vs, tables, write_pos, active

    @pytest.mark.parametrize('int8', [True, False])
    def test_parity_vs_scatter(self, int8):
        from ppq_tpu.serving.paged import scatter_kv_all, write_kv_window
        pools, k, v, ks, vs, tables, wp, act = self._setup(int8)
        ref = scatter_kv_all(
            dict(pools), k, v,
            ks.transpose(0, 1, 3, 2) if int8 else None,
            vs.transpose(0, 1, 3, 2) if int8 else None, tables, wp, act)
        got = write_kv_window(dict(pools), k, v, ks, vs, tables, wp, act,
                              use_kernel=True, interpret=True)
        for key in ref:
            r = np.asarray(ref[key], np.float32)
            g = np.asarray(got[key], np.float32)
            # trash row 0 content differs by design (both paths dump
            # inactive-slot garbage there); every real row must be exact
            assert np.array_equal(r[:, 1:], g[:, 1:]), key

    def test_window_larger_than_block_falls_back(self):
        from ppq_tpu.serving.paged import write_kv_window
        pools, k, v, ks, vs, tables, wp, act = self._setup(True)
        rng = np.random.default_rng(1)
        T2 = 160                                   # > BLK=128
        k2 = jnp.asarray(rng.integers(-5, 5, (3, 5, T2, 2, 64)), jnp.int8)
        v2 = jnp.asarray(rng.integers(-5, 5, (3, 5, T2, 2, 64)), jnp.int8)
        ks2 = jnp.asarray(rng.random((3, 5, 2, T2)), jnp.float32)
        vs2 = jnp.asarray(rng.random((3, 5, 2, T2)), jnp.float32)
        wp2 = jnp.zeros((5,), jnp.int32)
        out = write_kv_window(dict(pools), k2, v2, ks2, vs2, tables, wp2,
                              None, use_kernel=True, interpret=True)
        assert out['kv'].shape == pools['kv'].shape


class TestGroupedDecodeAttention:
    """ADVICE r2: the grouped kernel's consensus-clamp + per-slot masking
    (glens = max over a group) only ever saw uniform fills in CI. Pin
    parity against the per-slot fused kernel over MIXED fills inside a
    group — including empty slots and block-boundary fills — at G=4/8."""

    def _cache(self, int8, lens, S=512, KV=2, Dh=128):
        rng = np.random.default_rng(11)
        B = len(lens)
        rep = 2
        q = rng.standard_normal((B, KV, rep, Dh)).astype(np.float32) * 0.4
        if int8:
            ck = rng.integers(-127, 128, (B, S, KV, Dh)).astype(np.int8)
            cv = rng.integers(-127, 128, (B, S, KV, Dh)).astype(np.int8)
            cks = ((rng.random((B, S, KV)) + .5) * .02).astype(np.float32)
            cvs = ((rng.random((B, S, KV)) + .5) * .02).astype(np.float32)
        else:
            ck = (rng.standard_normal((B, S, KV, Dh)) * .5).astype(
                jnp.bfloat16)
            cv = (rng.standard_normal((B, S, KV, Dh)) * .5).astype(
                jnp.bfloat16)
            cks = cvs = None
        return (jnp.asarray(q), jnp.asarray(ck), jnp.asarray(cv),
                None if cks is None else jnp.asarray(cks),
                None if cvs is None else jnp.asarray(cvs),
                jnp.asarray(lens, jnp.int32))

    @pytest.mark.parametrize('int8', [True, False])
    @pytest.mark.parametrize('G', [4, 8, 16])
    def test_grouped_matches_fused_mixed_fills(self, int8, G):
        from ppq_tpu.kernels.paged_attention import (
            blockmajor_window, paged_attention_decode_fused,
            paged_attention_decode_grouped)
        # mixed fills INSIDE each group: 0, block boundaries (128, 512),
        # off-boundary (129), and a fill-at-cap slot grouped with fill 16
        lens = [0, 16, 128, 129, 200, 384, 511, 512]
        if G == 16:
            lens = lens + [64, 100, 256, 300, 385, 400, 477, 512]
        S, BLK, KV, Dh = 512, 128, 2, 128
        q, ck, cv, cks, cvs, seq_lens = self._cache(int8, lens, S, KV, Dh)
        B, NBp = len(lens), S // BLK

        # grouped path over the block-major window
        kv_bm, sc_bm = blockmajor_window(ck, cv, cks, cvs, S, BLK)
        got = merge_attention([paged_attention_decode_grouped(
            q, kv_bm, sc_bm, seq_lens, block_size=BLK, group=G,
            interpret=True)])

        # per-slot fused path over the identity (slot-major) layout
        k2 = ck.reshape(B * NBp, BLK, KV * Dh)
        v2 = cv.reshape(B * NBp, BLK, KV * Dh)
        kv_pool = jnp.stack([k2, v2], axis=1)
        sc_pool = None
        if int8:
            ks2 = cks.reshape(B * NBp, BLK, KV).transpose(0, 2, 1)
            vs2 = cvs.reshape(B * NBp, BLK, KV).transpose(0, 2, 1)
            sc_pool = jnp.stack([ks2, vs2], axis=1)
        tbl = identity_block_tables(B, S, BLK)
        want = merge_attention([paged_attention_decode_fused(
            q, kv_pool, sc_pool, tbl, seq_lens, block_size=BLK,
            interpret=True)])

        got, want = np.asarray(got), np.asarray(want)
        assert np.allclose(got[0], 0)            # empty slot → zero context
        np.testing.assert_allclose(got[1:], want[1:], rtol=2e-3, atol=2e-4)


class TestQmmFusedEpilogue:
    """Round-4 fused epilogues: row_scale (folded-rms_norm rsqrt),
    residual add, and the single-kernel SwiGLU gate-up (qmm_gateup)."""

    def _data(self, seed, B=8, D=512, F=640):
        rng = np.random.default_rng(seed)
        w8 = rng.integers(-127, 128, (D, F)).astype(np.int8)
        s = ((rng.random(F) + 0.5) * 1e-2).astype(np.float32)
        x = rng.standard_normal((B, D)).astype(np.float32)
        row = (rng.random(B) + 0.5).astype(np.float32)
        res = rng.standard_normal((B, F)).astype(np.float32)
        return w8, s, x, row, res

    def test_int8_row_scale_residual(self):
        w8, s, x, row, res = self._data(3)
        ref = (x @ (w8.astype(np.float32) * s)) * row[:, None] + res
        out = np.asarray(qmm_int8(
            jnp.asarray(x), jnp.asarray(w8), jnp.asarray(s),
            out_dtype=jnp.float32, interpret=True,
            row_scale=jnp.asarray(row),
            residual=jnp.asarray(res)))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, err

    def test_int4_row_scale_residual(self):
        rng = np.random.default_rng(4)
        B, D, F = 8, 512, 640
        q4 = rng.integers(-8, 8, (D, F)).astype(np.int8)
        s = ((rng.random(F) + 0.5) * 1e-2).astype(np.float32)
        x = rng.standard_normal((B, D)).astype(np.float32)
        row = (rng.random(B) + 0.5).astype(np.float32)
        res = rng.standard_normal((B, F)).astype(np.float32)
        ref = (x @ (q4.astype(np.float32) * s)) * row[:, None] + res
        out = np.asarray(qmm_int4(
            jnp.asarray(x), jnp.asarray(pack_int4_splithalf(q4)),
            jnp.asarray(s), out_dtype=jnp.float32, interpret=True,
            row_scale=jnp.asarray(row), residual=jnp.asarray(res)))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, err

    @pytest.mark.parametrize('bits', [8, 4])
    def test_gateup_silu_parity(self, bits):
        from ppq_tpu.kernels.qmm import qmm_gateup, supports_gateup
        rng = np.random.default_rng(5 + bits)
        B, D, F = 8, 512, 384
        wg = rng.standard_normal((D, F)).astype(np.float32) * 0.05
        wu = rng.standard_normal((D, F)).astype(np.float32) * 0.05
        x = rng.standard_normal((B, D)).astype(np.float32)
        row = (rng.random(B) + 0.5).astype(np.float32)
        qmax = 127 if bits == 8 else 7
        sg = np.maximum(np.abs(wg).max(0), 1e-8) / qmax
        su = np.maximum(np.abs(wu).max(0), 1e-8) / qmax
        qg = np.clip(np.round(wg / sg), -qmax - 1, qmax).astype(np.int8)
        qu = np.clip(np.round(wu / su), -qmax - 1, qmax).astype(np.int8)
        gd = qg.astype(np.float32) * sg
        ud = qu.astype(np.float32) * su
        g = (x @ gd) * row[:, None]
        u = (x @ ud) * row[:, None]
        ref = g / (1 + np.exp(-g)) * u
        if bits == 8:
            w_fused = np.concatenate([qg, qu], axis=1)
        else:
            w_fused = np.concatenate([pack_int4_splithalf(qg),
                                      pack_int4_splithalf(qu)], axis=1)
        s_fused = np.concatenate([sg, su]).astype(np.float32)
        assert supports_gateup(D, 2 * F, B, bits)
        out = np.asarray(qmm_gateup(
            jnp.asarray(x), jnp.asarray(w_fused), jnp.asarray(s_fused),
            out_dtype=jnp.float32, interpret=True,
            row_scale=jnp.asarray(row)))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 3e-2, err


class TestNormFolding:
    """fold_norm_gamma: gamma folds into the following matmul weights;
    rms_norm with the replaced (ones) gamma plus folded weights must
    reproduce the original model, and the row_rsqrt fused form must
    match rms_norm + matmul up to bf16 rounding."""

    def test_fold_preserves_model(self):
        from ppq_tpu.serving import LlamaConfig, init_llama_params
        from ppq_tpu.serving.model import (fold_norm_gamma, forward,
                                           init_kv_cache)
        cfg = LlamaConfig.tiny()
        rng = np.random.default_rng(9)
        params = init_llama_params(cfg, seed=0, quantized=False)
        # non-trivial gammas
        for layer in params['layers']:
            layer['attn_norm'] = jnp.asarray(
                rng.random(cfg.d_model).astype(np.float32) + 0.5)
            layer['mlp_norm'] = jnp.asarray(
                rng.random(cfg.d_model).astype(np.float32) + 0.5)
        params['final_norm'] = jnp.asarray(
            rng.random(cfg.d_model).astype(np.float32) + 0.5)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)))
        positions = jnp.broadcast_to(jnp.arange(8)[None], (2, 8))
        zeros = jnp.zeros((2,), jnp.int32)
        cache = init_kv_cache(cfg, 2)
        logits0, _ = forward(params, cache, tokens, positions,
                             zeros, zeros, cfg)
        import copy
        folded = {k: (v if k != 'layers' else [dict(l) for l in v])
                  for k, v in params.items()}
        ok = fold_norm_gamma(folded)
        assert ok
        assert all(np.all(np.asarray(l['attn_norm']) == 1.0)
                   for l in folded['layers'])
        cache = init_kv_cache(cfg, 2)
        logits1, _ = forward(folded, cache, tokens, positions,
                             zeros, zeros, cfg)
        d = np.abs(np.asarray(logits0) - np.asarray(logits1)).max()
        scale = np.abs(np.asarray(logits0)).max() + 1e-9
        assert d / scale < 3e-2, (d, scale)

    def test_row_rsqrt_equals_rms_norm_factor(self):
        from ppq_tpu.serving.model import rms_norm, row_rsqrt
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((4, 3, 64)), jnp.float32)
        eps = 1e-5
        r = row_rsqrt(x, eps)
        ref = rms_norm(x, jnp.ones((64,)), eps)
        got = x * r[..., None]
        assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-5


class TestNormFoldingEdges:
    """fold_norm_gamma partial/declined folds must stay self-consistent:
    each fold is locally complete (gamma -> ones exactly when its
    weights were scaled), so every path that still calls rms_norm with
    the stored gamma computes the original model."""

    def test_quantized_weights_decline_fold(self):
        import jax.numpy as jnp
        from ppq_tpu.serving import LlamaConfig, init_llama_params
        from ppq_tpu.serving.model import fold_norm_gamma
        cfg = LlamaConfig.tiny()
        params = init_llama_params(cfg, seed=0)          # already int8
        g0 = np.random.RandomState(0).rand(cfg.d_model).astype(
            np.float32) + 0.5
        params['layers'][0]['attn_norm'] = jnp.asarray(g0)
        ok = fold_norm_gamma(params)
        assert not ok                                    # cannot fold int8
        # the non-unit gamma must be untouched (rms_norm path uses it)
        np.testing.assert_array_equal(
            np.asarray(params['layers'][0]['attn_norm']), g0)

    def test_engine_correct_when_fold_declines(self):
        import jax
        import jax.numpy as jnp
        from ppq_tpu.serving import (LlamaConfig, ServingEngine,
                                     init_llama_params)
        from ppq_tpu.serving.engine import Request
        cfg = LlamaConfig.tiny()
        params = init_llama_params(cfg, seed=0)
        params['layers'][0]['attn_norm'] = jnp.asarray(
            np.random.RandomState(1).rand(cfg.d_model).astype(np.float32)
            + 0.5)
        eng = ServingEngine(cfg, params)
        assert not cfg.norm_folded
        reqs = [Request(0, [3, 4, 5], max_new_tokens=4, eos_id=None)]
        eng.run(reqs, sync_every=2)
        assert len(reqs[0].generated) == 4

    def test_moe_layers_block_fold_but_dense_parts_stay_exact(self):
        import jax.numpy as jnp
        from ppq_tpu.serving import LlamaConfig, init_llama_params
        from ppq_tpu.serving.model import fold_norm_gamma
        cfg = LlamaConfig.tiny()
        cfg.n_experts = 2
        params = init_llama_params(cfg, seed=0, quantized=False)
        rng = np.random.RandomState(2)
        params['final_norm'] = jnp.asarray(
            rng.rand(cfg.d_model).astype(np.float32) + 0.5)
        head_before = np.asarray(params['lm_head']['w'], np.float32).copy()
        gamma = np.asarray(params['final_norm'], np.float32).copy()
        ok = fold_norm_gamma(params)
        assert not ok                    # moe layers block the full fold
        # final_norm itself folded (local completeness): gamma -> ones,
        # head scaled by the old gamma rows
        np.testing.assert_array_equal(
            np.asarray(params['final_norm']), np.ones(cfg.d_model))
        np.testing.assert_allclose(
            np.asarray(params['lm_head']['w'], np.float32),
            (head_before * gamma[:, None]).astype(np.float32),
            rtol=1e-2, atol=1e-2)
