"""The whole framework in one script: raw text -> trained tokenizer ->
token batches -> training (optimizer zoo + EMA + grad accumulation) ->
checkpoint -> serving (continuous batching, per-request sampling) ->
beam-search eval.

Runs anywhere (tiny model; CPU-friendly).  Every stage is the production
module, not a demo shim:

    python examples/finetune_e2e.py --steps 30 --algo muon

Stages: models/tokenizer.py (native BPE) -> models/data.py (prefetching
batcher) -> models/train.py -> utils/checkpoint.py -> models/serve.py ->
models/generate.py beam_search.
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

_THINGS = ["ship", "gull", "wave", "wind", "rock", "star", "tide", "sail"]
_VERBS = ["sailed", "drifted", "turned", "rested", "sang", "rose", "fell"]
CORPUS = " ".join(
    f"the little {_THINGS[i % 8]} {_VERBS[(i * 3) % 7]} over the quiet sea"
    f" on day {i}." for i in range(400)
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--algo", default="adamw",
                   choices=["adamw", "sgd", "lion", "adafactor", "muon"])
    p.add_argument("--grad-accum", type=int, default=2)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    from kfunca_tpu.models.data import TokenDataset
    from kfunca_tpu.models.generate import beam_search
    from kfunca_tpu.models.serve import InferenceServer
    from kfunca_tpu.models.tokenizer import BPETokenizer
    from kfunca_tpu.models.train import (
        OptConfig, ema_params, init_opt_state, make_train_step,
    )
    from kfunca_tpu.models.transformer import TransformerConfig, init_params
    from kfunca_tpu.utils.checkpoint import load, save

    # 1) train a byte-level BPE tokenizer on the corpus (native encode path)
    tok = BPETokenizer.train(CORPUS, vocab_size=384)
    ids = tok.encode(CORPUS)
    print(f"tokenizer: vocab {tok.vocab_size}, corpus {len(CORPUS)} chars -> "
          f"{len(ids)} tokens ({len(CORPUS)/len(ids):.2f} chars/token)")

    # 2) model + optimizer (EMA on; in-step gradient accumulation)
    cfg = TransformerConfig(
        vocab_size=tok.vocab_size, d_model=128, n_heads=4, n_layers=2,
        d_ff=256, max_seq_len=args.seq_len * 2,
        dtype="bfloat16" if jax.default_backend() == "tpu" else "float32",
    )
    oc = OptConfig(algo=args.algo, lr=3e-3, clip_norm=1.0,
                   warmup_steps=5, total_steps=args.steps, ema_decay=0.9)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = init_opt_state(params, oc)
    step = jax.jit(make_train_step(cfg, oc, grad_accum=args.grad_accum))

    # 3) prefetching batcher over the tokenized corpus
    ds = TokenDataset(np.asarray(ids), seq_len=args.seq_len,
                      batch_size=args.batch, seed=0)
    it = iter(ds)
    for i in range(args.steps):
        tokens, targets = next(it)
        params, opt, loss = step(params, opt, tokens, targets)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.3f}")

    # 4) checkpoint the EMA weights and restore them for inference
    smooth = ema_params(opt, dtype=jnp.float32)
    ckpt = str(Path(tempfile.mkdtemp()) / "ema_ckpt")
    save(ckpt, smooth)
    serving_params = load(ckpt, like=smooth)
    print(f"checkpointed EMA params -> {ckpt}")

    # 5) serve it: continuous batching, mixed per-request sampling
    prompt = tok.encode("the little ship ")
    srv = InferenceServer(serving_params, cfg, batch_slots=2, page_size=16,
                          n_pages=64, max_pages_per_seq=8)
    greedy = srv.submit(prompt, max_new=24)
    sampled = srv.submit(prompt, max_new=24, temperature=0.8, top_k=12)
    out = srv.run()
    for name, rid in [("greedy", greedy), ("sampled", sampled)]:
        text = tok.decode(np.asarray(out[rid], np.int32))
        lp = sum(srv.requests[rid].logprobs)
        print(f"{name:8s} (logp {lp:7.2f}): {text!r}")

    # 6) beam search over the same model
    seqs, scores = beam_search(serving_params, prompt[None, :], cfg,
                               max_new=24, beam=4, length_penalty=0.6)
    best = tok.decode(np.asarray(seqs)[0, 0])
    print(f"beam-4   (score {float(scores[0, 0]):7.2f}): {best!r}")


if __name__ == "__main__":
    main()
