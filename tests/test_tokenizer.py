"""Byte-level BPE tokenizer tests: training, round-trips, native/Python
parity, persistence.  Green-field (the reference has no data/tokenizer
layer)."""

import numpy as np
import pytest

from kfunca_tpu.models.tokenizer import BPETokenizer

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "the quicker brown foxes jump over lazier dogs. "
    "pack my box with five dozen liquor jugs. "
) * 20


@pytest.fixture(scope="module")
def tok():
    return BPETokenizer.train(CORPUS, vocab_size=400)


class TestTraining:
    def test_vocab_grows_past_bytes(self, tok):
        assert 256 < tok.vocab_size <= 400
        # merges define real multi-byte tokens
        assert any(len(tok.token_bytes(t)) >= 3 for t in range(256, tok.vocab_size))

    def test_compresses_training_like_text(self, tok):
        text = "the quick brown dog jumps over the lazy fox"
        ids = tok.encode(text)
        assert len(ids) < len(text.encode())

    def test_vocab_floor_rejected(self):
        with pytest.raises(ValueError, match="vocab_size"):
            BPETokenizer.train("abc", vocab_size=100)


class TestRoundTrip:
    @pytest.mark.parametrize("text", [
        "hello world",
        "",
        "naïve café — résumé 日本語テキスト 🚀",
        "\x00\x01\xff binary-ish\ttabs\nnewlines",
        CORPUS[:500],
    ])
    def test_exact(self, tok, text):
        assert tok.decode(tok.encode(text)) == text

    def test_bytes_never_unk(self, tok):
        # arbitrary bytes round-trip exactly (byte-level: no unk token)
        blob = bytes(range(256)) * 3
        assert tok.decode_bytes(tok.encode(blob)) == blob

    def test_decode_rejects_bad_id(self, tok):
        with pytest.raises(ValueError):
            tok.decode_bytes(np.asarray([tok.vocab_size + 7], np.int32))


class TestNativeParity:
    def test_encode_matches_python_fallback(self, tok):
        """The native kf_bpe_encode and the Python fallback must produce
        identical ids on every probe."""
        for text in ["the quick brown fox", "zzz unseen zzz", CORPUS[:300],
                     "日本語 🚀", ""]:
            data = text.encode()
            native = tok.encode(text)
            py = tok._encode_py(data)
            assert np.array_equal(native, py), text

    def test_greedy_merge_order(self):
        """Rank order decides: with merges (a,b)->X then (X,c)->Y, 'abc'
        becomes [Y], not [a, bc-something]."""
        a, b, c = ord("a"), ord("b"), ord("c")
        t = BPETokenizer([(a, b, 256), (256, c, 257)])
        assert t.encode("abc").tolist() == [257]
        assert t.decode([257]) == "abc"


class TestPersistence:
    def test_save_load_identical(self, tok, tmp_path):
        p = str(tmp_path / "tok.json")
        tok.save(p)
        tok2 = BPETokenizer.load(p)
        assert tok2.vocab_size == tok.vocab_size
        s = "the lazy liquor jugs"
        assert np.array_equal(tok.encode(s), tok2.encode(s))

    def test_load_rejects_foreign_json(self, tmp_path):
        p = tmp_path / "x.json"
        p.write_text('{"something": 1}')
        with pytest.raises(ValueError, match="not a kfunca bpe"):
            BPETokenizer.load(str(p))
