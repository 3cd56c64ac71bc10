"""Golden-checkpoint HF parity (VERDICT r4 missing #3 / next #6).

Every other HF test builds a model IN MEMORY with random weights, which
can't catch checkpoint-loading bugs (key mapping, safetensors I/O, dtype
and layout conventions on disk).  These tests load REAL on-disk
checkpoints — tiny fixed-seed models saved by `transformers`' own
`save_pretrained` (tests/fixtures/golden_*, ~450 KB each, committed) —
through the full `from_hf(path)` import path, then assert TOKEN-EXACT
greedy generation against golden sequences produced by `transformers`'
own `generate()` at fixture-build time (frozen in golden_tokens.json).

This is exactly the bug class round 4 fixed twice post-hoc (the silent
qwen2_moe shared-expert drop and the MLA bucket clamp, commit 0d34801):
the oracle is transformers' modeling code, the weights are frozen, and
any drift in import conventions flips a token.  Offline substitute for a
published checkpoint (this environment has no network egress); the
checkpoint format and loader path are identical to a published one.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _golden(name):
    with open(os.path.join(FIXDIR, "golden_tokens.json")) as f:
        return json.load(f)[name]


@pytest.mark.parametrize("name", ["llama", "gpt2"])
def test_checkpoint_generate_token_exact(name):
    from kfunca_tpu.models.generate import generate
    from kfunca_tpu.models.hf import from_hf

    params, cfg = from_hf(os.path.join(FIXDIR, f"golden_{name}"),
                          dtype="float32")
    g = _golden(name)
    prompt = jnp.asarray([g["prompt"]], jnp.int32)
    out = generate(params, prompt, cfg, max_new=len(g["golden"]))
    assert np.asarray(out)[0].tolist() == g["golden"], (
        np.asarray(out)[0].tolist(), g["golden"])


@pytest.mark.parametrize("name", ["llama", "gpt2"])
def test_checkpoint_serve_token_exact(name):
    """The same checkpoint through the continuous-batching engine: paged
    decode must reproduce the transformers golden tokens too."""
    from kfunca_tpu.models.hf import from_hf
    from kfunca_tpu.models.serve import InferenceServer

    params, cfg = from_hf(os.path.join(FIXDIR, f"golden_{name}"),
                          dtype="float32")
    g = _golden(name)
    srv = InferenceServer(params, cfg, batch_slots=2, page_size=8,
                          n_pages=16, max_pages_per_seq=4)
    rid = srv.submit(g["prompt"], max_new=len(g["golden"]))
    res = srv.run()
    assert res[rid] == g["golden"], (res[rid], g["golden"])


def test_checkpoint_roundtrip_reexport(tmp_path):
    """import -> to_hf -> reload through transformers -> import again must
    be weight-identical (the exporter honors the on-disk conventions)."""
    import torch
    from transformers import AutoModelForCausalLM

    from kfunca_tpu.models.hf import from_hf, to_hf

    src = os.path.join(FIXDIR, "golden_llama")
    params, cfg = from_hf(src, dtype="float32")
    sd = to_hf(params, cfg)
    model = AutoModelForCausalLM.from_pretrained(src)
    model.load_state_dict({k: torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()})
    params2, _ = from_hf(model, dtype="float32")
    import jax

    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
