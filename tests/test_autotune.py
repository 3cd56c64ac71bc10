"""Autotune cache: record/lookup round-trip, defaults overlay, bucketing."""

import json
import os

import numpy as np  # noqa: F401
import pytest

from kfunca_tpu.runtime import autotune


class TestAutotune:
    def _fresh(self, tmp_path, monkeypatch):
        monkeypatch.setenv("KFUNCA_AUTOTUNE_CACHE", str(tmp_path / "at.json"))
        autotune._CACHE = None  # force reload against the new path
        return tmp_path / "at.json"

    def test_shape_bucket_pow2(self):
        assert autotune.shape_bucket(4096, 4000, 4096) == "4096x4096x4096"
        assert autotune.shape_bucket(2048, 2049) == "2048x4096"
        assert autotune.shape_bucket(1) == "1"

    def test_record_lookup_roundtrip(self, tmp_path, monkeypatch):
        path = self._fresh(tmp_path, monkeypatch)
        assert autotune.lookup("gemm", "64x64x64", "bfloat16") is None
        autotune.record("gemm", "64x64x64", "bfloat16", {"bm": 64, "bn": 64, "bk": 64})
        got = autotune.lookup("gemm", "64x64x64", "bfloat16")
        assert got == {"bm": 64, "bn": 64, "bk": 64}
        # persisted: a fresh in-memory cache reloads it from disk
        autotune._CACHE = None
        assert autotune.lookup("gemm", "64x64x64", "bfloat16") == got
        on_disk = json.load(open(path))
        assert any(k.endswith("|gemm|64x64x64|bfloat16") for k in on_disk)

    def test_measured_overlays_shipped_defaults(self, tmp_path, monkeypatch):
        self._fresh(tmp_path, monkeypatch)
        key = f"{autotune.chip_name()}|attn_fwd|9999x9999|bfloat16"
        autotune._DEFAULTS = {key: {"bq": 1024, "bk": 1024}}
        try:
            assert autotune.lookup("attn_fwd", "9999x9999", "bfloat16") == {
                "bq": 1024, "bk": 1024}
            autotune.record("attn_fwd", "9999x9999", "bfloat16", {"bq": 512, "bk": 512})
            assert autotune.lookup("attn_fwd", "9999x9999", "bfloat16") == {
                "bq": 512, "bk": 512}
        finally:
            autotune._DEFAULTS = None

    def test_chip_keying_isolates_entries(self, tmp_path, monkeypatch):
        self._fresh(tmp_path, monkeypatch)
        autotune.record("gemm", "128x128x128", "float32", {"bm": 128})
        real = autotune.chip_name
        try:
            autotune.chip_name = lambda: "some-other-chip"
            assert autotune.lookup("gemm", "128x128x128", "float32") is None
        finally:
            autotune.chip_name = real


class TestAutotuneSweep:
    def test_autotune_gemm_records_winner(self, tmp_path, monkeypatch):
        """kfunca.autotune() sweeps candidates in-process and persists the
        measured winner where dispatch lookup() finds it."""
        import jax.numpy as jnp

        import kfunca_tpu as kfunca

        monkeypatch.setenv("KFUNCA_AUTOTUNE_CACHE", str(tmp_path / "at.json"))
        autotune._CACHE = None  # reload against the patched path
        cands = [{"bm": 128, "bn": 128, "bk": 128},
                 {"bm": 256, "bn": 256, "bk": 256}]
        res = kfunca.autotune("gemm", 256, 256, 256, dtype=jnp.float32,
                              candidates=cands, reps=1, k1=2, k2=4,
                              verbose=False)
        assert res["params"] in cands
        assert len(res["all"]) == 2 and res["ms"] > 0
        hit = autotune.lookup("gemm", autotune.shape_bucket(256, 256, 256),
                              jnp.dtype(jnp.float32))
        assert hit == res["params"]
        autotune._CACHE = None

    def test_autotune_unknown_op_raises(self):
        import pytest

        import kfunca_tpu as kfunca

        with pytest.raises(ValueError):
            kfunca.autotune("nope", 8)

    def test_autotune_q8_records_winner(self, tmp_path, monkeypatch):
        import kfunca_tpu as kfunca

        monkeypatch.setenv("KFUNCA_AUTOTUNE_CACHE", str(tmp_path / "at8.json"))
        autotune._CACHE = None
        cands = [{"bm": 128, "bn": 128, "bk": 128}]
        res = kfunca.autotune("gemm_q8", 128, 128, 128, candidates=cands,
                              reps=1, k1=1, k2=2, verbose=False)
        assert res["params"] == cands[0]
        assert autotune.lookup("gemm_q8", autotune.shape_bucket(128, 128, 128),
                               "int8") == cands[0]
        autotune._CACHE = None

    def test_autotune_reduce_and_welford(self, tmp_path, monkeypatch):
        """Round-3 extension: the Pallas reduction substrate is sweepable."""
        import jax.numpy as jnp

        import kfunca_tpu as kfunca

        monkeypatch.setenv("KFUNCA_AUTOTUNE_CACHE", str(tmp_path / "atr.json"))
        autotune._CACHE = None
        cands = [{"br": 64, "bc": 128}, {"br": 128, "bc": 128}]
        for op in ("reduce", "welford"):
            res = kfunca.autotune(op, 128, 128, candidates=cands,
                                  reps=1, k1=1, k2=2, verbose=False)
            assert res["params"] in cands
            assert autotune.lookup(op, autotune.shape_bucket(128, 128),
                                   jnp.dtype(jnp.float32)) == res["params"]
        autotune._CACHE = None

    @pytest.mark.slow
    def test_autotune_decode_page_feeds_server_default(self, tmp_path, monkeypatch):
        """The decode_page winner is consulted by InferenceServer when
        constructed with page_size=None."""
        import jax.numpy as jnp

        import kfunca_tpu as kfunca
        from kfunca_tpu.models.serve import InferenceServer
        from kfunca_tpu.models.transformer import TransformerConfig, init_params

        monkeypatch.setenv("KFUNCA_AUTOTUNE_CACHE", str(tmp_path / "atd.json"))
        autotune._CACHE = None
        cands = [{"page_size": 8}, {"page_size": 16}]
        res = kfunca.autotune("decode_page", 2, 128, 64, candidates=cands,
                              reps=1, k1=1, k2=2, verbose=False)
        assert res["params"] in cands
        cfg = TransformerConfig(vocab_size=64, d_model=128, n_heads=1,
                                n_layers=1, d_ff=128, max_seq_len=64)
        import jax

        params = init_params(jax.random.PRNGKey(0), cfg)
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=None,
                              n_pages=32, max_pages_per_seq=8)
        assert srv.page_size == res["params"]["page_size"]
        # and without a cache hit the default stays 16
        autotune._CACHE = {}
        autotune._DEFAULTS = {}
        try:
            srv2 = InferenceServer(params, cfg, batch_slots=2, page_size=None,
                                   n_pages=32, max_pages_per_seq=8)
            assert srv2.page_size == 16
        finally:
            autotune._CACHE = None
            autotune._DEFAULTS = None
