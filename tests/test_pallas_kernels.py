"""Pallas TPU kernel unit tests (interpret mode on CPU, small shapes).

This is the hermetic tier the reference never had: its CI requires a real
GPU, while these validate the exact kernel code that runs on TPU hardware
against jnp oracles without any accelerator.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfunca_tpu.ops.pallas_kernels.elementwise import elementwise
from kfunca_tpu.ops.pallas_kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_fwd_stats,
)
from kfunca_tpu.ops.pallas_kernels.matmul import matmul
from kfunca_tpu.ops.pallas_kernels.welford import welford_norm_stat


def sdpa_oracle(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    sq, skv = q.shape[2], k.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
    s = jnp.where(col <= row, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


class TestMatmul:
    @pytest.mark.parametrize("m,k,n", [(128, 128, 128), (256, 384, 128), (123, 57, 34)])
    def test_fp32(self, m, k, n):
        rng = np.random.default_rng(0)
        a = rng.uniform(-1, 1, (m, k)).astype(np.float32)
        b = rng.uniform(-1, 1, (k, n)).astype(np.float32)
        out = matmul(jnp.asarray(a), jnp.asarray(b), bm=128, bn=128, bk=128, interpret=True)
        assert np.allclose(np.asarray(out), a @ b, atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("epi", ["bias", "bias_gelu", "bias_silu",
                                     "relu", "bias_res", "res"])
    def test_fused_epilogue(self, epi):
        """Fused epilogues (round-4: the CUTLASS alpha/beta analog plus
        activations) applied on the fp32 accumulator at the last k step."""
        rng = np.random.default_rng(3)
        m, k, n = 256, 384, 128
        a = rng.uniform(-1, 1, (m, k)).astype(np.float32)
        b = rng.uniform(-1, 1, (k, n)).astype(np.float32)
        bias = rng.uniform(-1, 1, (n,)).astype(np.float32)
        res = rng.uniform(-1, 1, (m, n)).astype(np.float32)
        kw = {}
        want = a @ b
        if "bias" in epi:
            kw["bias"] = jnp.asarray(bias)
            want = want + bias
        if "gelu" in epi:
            import jax.nn
            want = np.asarray(jax.nn.gelu(jnp.asarray(want), approximate=True))
        elif "silu" in epi:
            want = want * (1.0 / (1.0 + np.exp(-want)))
        elif "relu" in epi:
            want = np.maximum(want, 0.0)
        if "res" in epi:
            kw["residual"] = jnp.asarray(res)
            want = want + res
        out = matmul(jnp.asarray(a), jnp.asarray(b), epilogue=epi,
                     bm=128, bn=128, bk=128, interpret=True, **kw)
        assert np.allclose(np.asarray(out), want, atol=1e-4, rtol=1e-4), (
            np.abs(np.asarray(out) - want).max())

    def test_bf16_fp32_acc(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(-1, 1, (128, 256)).astype(np.float32)
        b = rng.uniform(-1, 1, (256, 128)).astype(np.float32)
        out = matmul(
            jnp.asarray(a, jnp.bfloat16),
            jnp.asarray(b, jnp.bfloat16),
            out_dtype=jnp.float32,
            bm=128,
            bn=128,
            bk=128,
            interpret=True,
        )
        assert np.allclose(np.asarray(out), a @ b, atol=0.5, rtol=0.05)


class TestFlashAttention:
    @pytest.mark.parametrize(
        "b,h,sq,skv,d",
        [
            (1, 2, 128, 128, 128),
            (1, 1, 128, 256, 128),  # kv longer than q (reference case 1 shape class)
            (1, 1, 35, 67, 40),  # ragged everything (reference naive-fallback class)
        ],
    )
    def test_forward(self, b, h, sq, skv, d):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        out, lse = flash_attention_fwd_stats(q, k, v, bq=128, bk=128, interpret=True)
        ref = sdpa_oracle(q, k, v)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
        # lse parity with oracle logsumexp
        scale = 1.0 / math.sqrt(d)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        s = jnp.where(col <= row, s, -jnp.inf)
        lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
        assert np.allclose(np.asarray(lse), np.asarray(lse_ref), atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize(
        "b,h,sq,skv,d",
        [
            (1, 1, 128, 128, 128),
            (1, 2, 64, 96, 32),  # ragged
            # sq/skv NOT multiples of the tile: exercises padded q rows,
            # whose lse must restore as 0 (an -inf lse exponentiates to
            # inf * 0 = NaN in the fused backward — regression guard)
            (1, 2, 100, 160, 64),
        ],
    )
    def test_backward(self, b, h, sq, skv, d):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        g = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        dq, dk, dv = flash_attention_backward(q, k, v, g, bq=128, bk=128, interpret=True)
        ref_out, vjp = jax.vjp(sdpa_oracle, q, k, v)
        rdq, rdk, rdv = vjp(g)
        assert np.allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4, rtol=1e-4)

    def test_backward_raw_stats_residual(self):
        """stats128 (the forward's raw exp2-domain lane-replicated
        residual) must produce the same grads as the compat natural-log
        lse path and the oracle — the layout fwd+bwd compose through."""
        rng = np.random.default_rng(7)
        b, h, sq, skv, d = 1, 2, 100, 160, 64
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        g = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        out, st = flash_attention_fwd_stats(
            q, k, v, bq=128, bk=128, raw_stats=True, interpret=True
        )
        assert st.shape == (b * h, 128, 128) and st.dtype == jnp.float32
        dq, dk, dv = flash_attention_backward(
            q, k, v, g, out=out, stats128=st, bq=128, bk=128, interpret=True
        )
        # compat path (natural-log lse) for the same inputs
        out2, lse = flash_attention_fwd_stats(q, k, v, bq=128, bk=128, interpret=True)
        cq, ck, cv = flash_attention_backward(
            q, k, v, g, out=out2, lse=lse, bq=128, bk=128, interpret=True
        )
        _, vjp = jax.vjp(sdpa_oracle, q, k, v)
        rdq, rdk, rdv = vjp(g)
        for got, compat, ref in ((dq, cq, rdq), (dk, ck, rdk), (dv, cv, rdv)):
            assert np.allclose(np.asarray(got), np.asarray(compat), atol=1e-5)
            assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_backward_raw_stats_mismatched_fwd_block(self):
        # stats padded to a different sqp than the bwd's tiles (a forward
        # that ran with a larger bq): the wrapper re-pads instead of
        # mis-indexing.  (Blocks below 128 are invalid — lane tiling — so
        # the mismatch is constructed by over-padding.)
        rng = np.random.default_rng(8)
        b, h, sq, skv, d = 1, 1, 100, 128, 32
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, skv, d)), jnp.float32)
        g = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        out, st = flash_attention_fwd_stats(
            q, k, v, bq=128, bk=128, raw_stats=True, interpret=True
        )
        st = jnp.pad(st, ((0, 0), (0, 128), (0, 0)))  # sqp 256 != bwd's 128
        dq, dk, dv = flash_attention_backward(
            q, k, v, g, out=out, stats128=st, bq=128, bk=128, interpret=True
        )
        _, vjp = jax.vjp(sdpa_oracle, q, k, v)
        rdq, rdk, rdv = vjp(g)
        assert np.allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4, rtol=1e-4)


class TestWelford:
    @pytest.mark.parametrize("r,c", [(64, 128), (1000, 257), (515, 128)])
    def test_norm_stat(self, r, c):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(-10, 10, (r, c)), jnp.float32)
        mean, invstd = welford_norm_stat(x, br=128, bc=128, interpret=True)
        ref_mean = jnp.mean(x, axis=0, keepdims=True)
        ref_var = jnp.mean((x - ref_mean) ** 2, axis=0, keepdims=True)
        ref_invstd = 1.0 / jnp.sqrt(ref_var + 1e-12)
        assert np.allclose(np.asarray(mean), np.asarray(ref_mean), atol=1e-3, rtol=1e-3)
        assert np.allclose(np.asarray(invstd), np.asarray(ref_invstd), atol=1e-3, rtol=1e-3)


class TestElementwise:
    def test_binary_family(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.uniform(1, 2, (8, 128)), jnp.float32)
        b = jnp.asarray(rng.uniform(1, 2, (8, 128)), jnp.float32)
        for name, ref in [
            ("add", a + b),
            ("sub", a - b),
            ("mul", a * b),
            ("div", a / b),
        ]:
            out = elementwise(
                name, a, b, acc_dt=jnp.float32, out_dt=jnp.float32, interpret=True
            )
            assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6), name

    def test_acc_dtype_bf16(self):
        """bf16 storage computes in fp32 (reference acc-type contract)."""
        rng = np.random.default_rng(6)
        a = jnp.asarray(rng.uniform(-2, 2, (16, 128)), jnp.bfloat16)
        b = jnp.asarray(rng.uniform(-2, 2, (16, 128)), jnp.bfloat16)
        out = elementwise("mul", a, b, acc_dt=jnp.float32, out_dt=jnp.bfloat16, interpret=True)
        ref = (a.astype(jnp.float32) * b.astype(jnp.float32)).astype(jnp.bfloat16)
        assert np.array_equal(
            np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32)
        )


class TestBitonicSort:
    # one fast representative per dtype; the bigger shapes are slow-tier
    # (each interpret-mode compile costs ~8-10 s)
    @pytest.mark.parametrize("rows,n,dtype", [
        (4, 23, np.float32),
        pytest.param(13, 1049, np.float32, marks=pytest.mark.slow),
        (8, 128, np.int32),
        pytest.param(3, 500, np.int32, marks=pytest.mark.slow),
    ])
    def test_stable_ascending(self, rows, n, dtype):
        from kfunca_tpu.ops.pallas_kernels.bitonic_sort import bitonic_sort_pairs

        rng = np.random.default_rng(0)
        if np.issubdtype(dtype, np.integer):
            x = rng.integers(-1000, 1000, (rows, n)).astype(dtype)
        else:
            x = rng.uniform(-1000, 1000, (rows, n)).astype(dtype)
        x[:, ::7] = x[:, 0:1]  # duplicates exercise stability
        ks, idx = bitonic_sort_pairs(jnp.asarray(x), interpret=True)
        assert np.array_equal(np.asarray(ks), np.sort(x, axis=1))
        assert np.array_equal(np.asarray(idx), np.argsort(x, axis=1, kind="stable"))


class TestGQAWindow:
    @staticmethod
    def _oracle(q, k, v, window=None):
        """Einsum causal (+ sliding window) GQA oracle."""
        import math

        b, h, sq, d = q.shape
        hkv, skv = k.shape[1], k.shape[2]
        group = h // hkv
        kx = jnp.repeat(k, group, axis=1)
        vx = jnp.repeat(v, group, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kx) / math.sqrt(d)
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        ok = col <= row
        if window is not None:
            ok = ok & (col > row - window)
        s = jnp.where(ok, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vx)

    @pytest.mark.parametrize("h,hkv", [(4, 1), (4, 2), (6, 3)])
    def test_gqa_forward(self, h, hkv):
        rng = np.random.default_rng(0)
        b, sq, d = 1, 256, 64
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, hkv, sq, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, hkv, sq, d)), jnp.float32)
        out, lse = flash_attention_fwd_stats(q, k, v, bq=128, bk=128, interpret=True)
        ref = self._oracle(q, k, v)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_gqa_backward(self):
        rng = np.random.default_rng(1)
        b, h, hkv, sq, d = 1, 4, 2, 256, 64
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, hkv, sq, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, hkv, sq, d)), jnp.float32)
        g = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        dq, dk, dv = flash_attention_backward(q, k, v, g, bq=128, bk=128, interpret=True)
        _, vjp = jax.vjp(self._oracle, q, k, v)
        rdq, rdk, rdv = vjp(g)
        assert dk.shape == k.shape and dv.shape == v.shape
        assert np.allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("window", [64, 100, 256])
    def test_sliding_window_forward(self, window):
        rng = np.random.default_rng(2)
        b, h, sq, d = 1, 2, 384, 64
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        out, _ = flash_attention_fwd_stats(q, k, v, bq=128, bk=128, window=window,
                                           interpret=True)
        ref = self._oracle(q, k, v, window=window)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_sliding_window_backward_gqa_combined(self):
        rng = np.random.default_rng(3)
        b, h, hkv, sq, d, window = 1, 4, 2, 384, 64, 130
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        k = jnp.asarray(rng.uniform(-1, 1, (b, hkv, sq, d)), jnp.float32)
        v = jnp.asarray(rng.uniform(-1, 1, (b, hkv, sq, d)), jnp.float32)
        g = jnp.asarray(rng.uniform(-1, 1, (b, h, sq, d)), jnp.float32)
        dq, dk, dv = flash_attention_backward(q, k, v, g, bq=128, bk=128,
                                              window=window, interpret=True)
        _, vjp = jax.vjp(lambda a, bb, c: self._oracle(a, bb, c, window=window), q, k, v)
        rdq, rdk, rdv = vjp(g)
        assert np.allclose(np.asarray(dq), np.asarray(rdq), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dk), np.asarray(rdk), atol=1e-4, rtol=1e-4)
        assert np.allclose(np.asarray(dv), np.asarray(rdv), atol=1e-4, rtol=1e-4)

    def test_window_tables_drop_dead_blocks(self):
        from kfunca_tpu.ops.pallas_kernels.flash_attention import (
            _bwd_tables, _fwd_tables,
        )

        # s=1024, bq=bk=128, window=128: each row keeps <= 2 live kv blocks
        iq, ik, fl = _fwd_tables(8, 8, 128, 128, window=128)
        assert len(iq) <= 2 * 8
        full_iq, _, _ = _fwd_tables(8, 8, 128, 128)
        assert len(iq) < len(full_iq)
        biq, bik, bfl = _bwd_tables(8, 8, 128, 128, window=128)
        assert len(biq) <= 3 * 8


class TestSSMScan:
    """Selective-scan kernel vs the sequential recurrence oracle
    (interpret mode; fwd values and ALL five input grads)."""

    def _inputs(self, b=2, L=16, di=128, n=8, seed=0):
        rng = np.random.RandomState(seed)
        dt = jnp.asarray(rng.uniform(0.001, 0.1, (b, L, di)), jnp.float32)
        u = jnp.asarray(rng.normal(size=(b, L, di)), jnp.float32)
        bm = jnp.asarray(rng.normal(size=(b, L, n)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(b, L, n)), jnp.float32)
        a_t = jnp.asarray(-rng.uniform(0.5, 2.0, (n, di)), jnp.float32)
        return dt, u, bm, c, a_t

    @staticmethod
    def _oracle(dt, u, bm, c, a_t):
        dA = jnp.exp(dt[..., None] * a_t.T[None, None])  # (b, L, di, n)
        dBu = u[..., None] * bm[:, :, None, :]

        def combine(lft, rgt):
            return lft[0] * rgt[0], rgt[0] * lft[1] + rgt[1]

        _, h = jax.lax.associative_scan(combine, (dA, dBu), axis=1)
        return jnp.einsum("blin,bln->bli", h, c)

    def test_forward_matches_oracle(self):
        from kfunca_tpu.ops.pallas_kernels.ssm_scan import ssm_scan_fwd

        dt, u, bm, c, a_t = self._inputs()
        y, hb = ssm_scan_fwd(dt, u, bm, c, a_t, lb=4, dib=128,
                             interpret=True)
        ref = self._oracle(dt, u, bm, c, a_t)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # boundary states: hb[:, k] is the state ENTERING block k
        assert hb.shape == (2, 4, 8, 128)
        np.testing.assert_allclose(np.asarray(hb[:, 0]), 0.0)

    def test_grads_match_oracle(self):
        from kfunca_tpu.ops.pallas_kernels.ssm_scan import (
            ssm_scan_bwd, ssm_scan_fwd)

        dt, u, bm, c, a_t = self._inputs()
        g = jnp.asarray(np.random.RandomState(9).normal(
            size=(2, 16, 128)), jnp.float32)

        def ref_loss(dt, u, bm, c, a_t):
            return jnp.sum(self._oracle(dt, u, bm, c, a_t) * g)

        refs = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(dt, u, bm, c,
                                                           a_t)
        _, hb = ssm_scan_fwd(dt, u, bm, c, a_t, lb=4, dib=128,
                             interpret=True)
        outs = ssm_scan_bwd(dt, u, bm, c, a_t, hb, g, lb=4, dib=128,
                            interpret=True)
        for got, want, name in zip(outs, refs,
                                   ("ddt", "du", "dbm", "dc", "da_t")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
                err_msg=name)

    def test_multi_ditile_grads(self):
        """di spanning two tiles exercises the partial-sum reassembly."""
        from kfunca_tpu.ops.pallas_kernels.ssm_scan import (
            ssm_scan_bwd, ssm_scan_fwd)

        dt, u, bm, c, a_t = self._inputs(b=1, L=8, di=256, n=8, seed=3)
        g = jnp.asarray(np.random.RandomState(4).normal(
            size=(1, 8, 256)), jnp.float32)
        refs = jax.grad(lambda *a: jnp.sum(self._oracle(*a) * g),
                        argnums=(0, 1, 2, 3, 4))(dt, u, bm, c, a_t)
        _, hb = ssm_scan_fwd(dt, u, bm, c, a_t, lb=4, dib=128,
                             interpret=True)
        outs = ssm_scan_bwd(dt, u, bm, c, a_t, hb, g, lb=4, dib=128,
                            interpret=True)
        for got, want, name in zip(outs, refs,
                                   ("ddt", "du", "dbm", "dc", "da_t")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
                err_msg=name)


class TestFp16AttentionDispatch:
    """fp16 storage rides the fp32 flash kernel (round-4: fp16 embeds
    exactly in fp32; previously fp16 silently fell back to the O(S^2)
    einsum).  Patch the dispatch gate on and run the kernels in interpret
    mode; outputs/grads must come back fp16 and match the fp32 oracle to
    fp16 precision."""

    def test_fp16_vjp_through_kernel_path(self, monkeypatch):
        import functools

        import kfunca_tpu.ops.attention as attn_mod
        from kfunca_tpu.ops.pallas_kernels import flash_attention as fa

        monkeypatch.setattr(attn_mod, "use_pallas", lambda: True)
        monkeypatch.setattr(
            attn_mod, "_tuned_blocks",
            lambda op, q, k: {"bq": 128, "bk": 128})
        # route the kernels through interpret mode (CPU)
        orig_stats = fa.flash_attention_fwd_stats
        orig_fwd = fa.flash_attention_forward
        orig_bwd = fa.flash_attention_backward
        monkeypatch.setattr(
            fa, "flash_attention_fwd_stats",
            functools.partial(orig_stats, interpret=True))
        monkeypatch.setattr(
            fa, "flash_attention_forward",
            functools.partial(orig_fwd, interpret=True))
        monkeypatch.setattr(
            fa, "flash_attention_backward",
            functools.partial(orig_bwd, interpret=True))

        rng = np.random.default_rng(7)
        b, h, s, d = 1, 2, 128, 128
        q = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float16)
        k = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float16)
        v = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float16)
        g = jnp.asarray(rng.uniform(-1, 1, (b, h, s, d)), jnp.float16)

        out, vjp = jax.vjp(attn_mod.causal_attention_fn, q, k, v)
        dq, dk, dv = vjp(g)
        assert out.dtype == jnp.float16
        assert dq.dtype == dk.dtype == dv.dtype == jnp.float16

        qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
        ref, rvjp = jax.vjp(attn_mod._sdpa_xla, qf, kf, vf)
        rq, rk, rv = rvjp(g.astype(jnp.float32))
        assert np.allclose(np.asarray(out, np.float32), np.asarray(ref),
                           atol=2e-3)
        for got, want in ((dq, rq), (dk, rk), (dv, rv)):
            assert np.allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=2e-2)
