"""int8 quantized GEMM tests (interpret mode; oracle = fp32 matmul)."""

import numpy as np

import jax
import jax.numpy as jnp

from kfunca_tpu.ops.pallas_kernels.matmul import matmul
from kfunca_tpu.ops.quant import gemm_w8, matmul_q8, quantize_cols, quantize_rows


class TestQuantization:
    def test_quantize_roundtrip_bounds(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32) * 3.0
        q, s = quantize_cols(w)
        assert q.dtype == jnp.int8
        back = q.astype(jnp.float32) * s[None, :]
        # per-column absmax scaling bounds the error at scale/2 per element
        assert float(jnp.max(jnp.abs(back - w))) <= float(jnp.max(s)) * 0.5 + 1e-6

    def test_int8_matmul_exact_int32(self):
        """The int8 path of the generic Pallas matmul is EXACT int32."""
        rng = np.random.default_rng(0)
        a = rng.integers(-127, 127, (64, 128), dtype=np.int8)
        b = rng.integers(-127, 127, (128, 32), dtype=np.int8)
        got = matmul(jnp.asarray(a), jnp.asarray(b), interpret=True)
        want = a.astype(np.int64) @ b.astype(np.int64)
        assert got.dtype == jnp.int32
        assert np.array_equal(np.asarray(got, np.int64), want)

    def test_matmul_q8_matches_dequant_oracle(self):
        """Fused epilogue == explicit int32 matmul then rank-1 dequant."""
        rng = np.random.default_rng(1)
        a = rng.standard_normal((48, 256)).astype(np.float32)
        w = rng.standard_normal((256, 96)).astype(np.float32)
        a_q, a_s = quantize_rows(jnp.asarray(a))
        w_q, w_s = quantize_cols(jnp.asarray(w))
        got = matmul_q8(a_q, w_q, a_s, w_s, out_dtype=jnp.float32, interpret=True)
        acc = np.asarray(a_q, np.int64) @ np.asarray(w_q, np.int64)
        want = acc.astype(np.float32) * np.asarray(a_s)[:, None] * np.asarray(w_s)[None, :]
        assert np.allclose(np.asarray(got), want, atol=1e-4, rtol=1e-5)

    def test_gemm_w8_close_to_float(self):
        """End-to-end quantized GEMM within int8 tolerance of fp32."""
        rng = np.random.default_rng(2)
        a = rng.standard_normal((32, 512)).astype(np.float32)
        w = rng.standard_normal((512, 64)).astype(np.float32)
        w_q, w_s = quantize_cols(jnp.asarray(w))
        import functools
        from kfunca_tpu.ops import quant as qmod

        orig = qmod.matmul_q8
        qmod.matmul_q8 = functools.partial(orig, interpret=True)
        try:
            got = gemm_w8(jnp.asarray(a), w_q, w_s, out_dtype=jnp.float32)
        finally:
            qmod.matmul_q8 = orig
        want = a @ w
        # int8 quantization noise is additive at the matrix scale; measure
        # against the output distribution, not per-element relative error
        # (outputs near zero make that metric meaningless)
        err = np.abs(np.asarray(got) - want)
        assert float(err.max()) < 0.08 * float(np.std(want)), (
            float(err.max()), float(np.std(want))
        )


class TestDispatchedQ8:
    def test_xla_path_matches_int64_oracle(self):
        from kfunca_tpu.ops.quant import matmul_q8_xla, quantize_cols, quantize_rows

        rng = np.random.default_rng(9)
        af = jnp.asarray(rng.uniform(-2, 2, (64, 96)), jnp.float32)
        bf = jnp.asarray(rng.uniform(-2, 2, (96, 48)), jnp.float32)
        aq, asc = quantize_rows(af)
        bq, bsc = quantize_cols(bf)
        got = np.asarray(matmul_q8_xla(aq, bq, asc, bsc, out_dtype=jnp.float32))
        acc = np.asarray(aq, np.int64) @ np.asarray(bq, np.int64)
        want = acc.astype(np.float64) * np.asarray(asc)[:, None] * np.asarray(bsc)[None, :]
        assert np.allclose(got, want, atol=1e-3, rtol=1e-4)

    def test_auto_dispatch_engines_agree(self):
        import os

        from kfunca_tpu.ops.quant import matmul_q8, matmul_q8_auto, quantize_cols, quantize_rows

        rng = np.random.default_rng(10)
        af = jnp.asarray(rng.uniform(-2, 2, (128, 128)), jnp.float32)
        bf = jnp.asarray(rng.uniform(-2, 2, (128, 128)), jnp.float32)
        aq, asc = quantize_rows(af)
        bq, bsc = quantize_cols(bf)
        auto = np.asarray(matmul_q8_auto(aq, bq, asc, bsc, out_dtype=jnp.float32))
        pall = np.asarray(
            matmul_q8(aq, bq, asc, bsc, out_dtype=jnp.float32, interpret=True)
        )
        # both engines share the exact-i32-acc contract
        assert np.allclose(auto, pall, atol=1e-4, rtol=1e-5)
