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


class TestSpecialTokens:
    def _tk(self):
        from kfunca_tpu.models.tokenizer import BPETokenizer

        base = BPETokenizer.train("the sea rose and the wind sang " * 30, 300)
        return base.with_special_tokens(["<|eos|>", "<|im_start|>",
                                         "<|im_start|>user"])

    def test_roundtrip_and_ids(self):
        tk = self._tk()
        base = tk.vocab_size - 3  # BPE training may stop early on a
        eos = tk.special_id("<|eos|>")  # small corpus; ids stay dense
        assert eos == base
        text = "the sea<|eos|>the wind<|eos|>"
        ids = tk.encode(text)
        assert list(ids).count(eos) == 2
        assert tk.decode(ids) == text

    def test_longest_match_wins(self):
        tk = self._tk()
        ids = tk.encode("<|im_start|>user hello")
        assert ids[0] == tk.special_id("<|im_start|>user")
        assert tk.special_id("<|im_start|>") not in ids[:1]
        assert tk.decode(ids) == "<|im_start|>user hello"

    def test_no_merge_across_boundary(self):
        """Text adjacent to a special literal encodes exactly like the
        standalone segments (the literal is a hard split point)."""
        tk = self._tk()
        a = tk.encode("the sea")
        b = tk.encode("the wind")
        joined = tk.encode("the sea<|eos|>the wind")
        want = list(a) + [tk.special_id("<|eos|>")] + list(b)
        assert list(joined) == want

    def test_allow_special_false_is_plain_text(self):
        tk = self._tk()
        ids = tk.encode("<|eos|>", allow_special=False)
        assert tk.special_id("<|eos|>") not in ids
        assert tk.decode(ids) == "<|eos|>"

    def test_save_load_preserves_specials(self, tmp_path):
        tk = self._tk()
        p = str(tmp_path / "tok.json")
        tk.save(p)
        from kfunca_tpu.models.tokenizer import BPETokenizer

        tk2 = BPETokenizer.load(p)
        assert tk2.special_tokens == tk.special_tokens
        text = "the sea<|eos|>"
        import numpy as np

        np.testing.assert_array_equal(tk.encode(text), tk2.encode(text))

    def test_duplicate_specials_rejected(self):
        import pytest

        from kfunca_tpu.models.tokenizer import BPETokenizer

        base = BPETokenizer.train("ab " * 200, 258)
        with pytest.raises(ValueError, match="duplicate"):
            base.with_special_tokens(["<|a|>", "<|a|>"])
