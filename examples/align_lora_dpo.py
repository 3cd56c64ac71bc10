"""Parameter-efficient alignment: LoRA SFT -> LoRA-DPO -> serve.

Runs anywhere (tiny model; CPU-friendly).  Every stage is the production
module:

  * models/lora.py — rank-r adapters on a FROZEN base (grads/moments
    O(adapter); the base is never touched),
  * models/dpo.py — LoRA-DPO preference step where the frozen base IS
    the reference model (one weight copy total; step-0 loss = log 2),
  * models/serve.py — the trained wqkv adapter registers into the
    inference engine's multi-LoRA slots; one compiled decode step serves
    base and adapter requests side by side.

    python examples/align_lora_dpo.py --sft-steps 20 --dpo-steps 20
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from kfunca_tpu.models.dpo import make_lora_dpo_step
from kfunca_tpu.models.lora import init_lora, make_lora_train_step, to_serving
from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.train import OptConfig, init_opt_state
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sft-steps", type=int, default=20)
    ap.add_argument("--dpo-steps", type=int, default=20)
    ap.add_argument("--rank", type=int, default=8)
    args = ap.parse_args()

    cfg = TransformerConfig(vocab_size=128, d_model=64, n_heads=4,
                            n_layers=2, d_ff=128, dtype="float32")
    base = init_params(jax.random.PRNGKey(0), cfg)

    # --- toy data: "chosen" continuations repeat token 7, "rejected" 11 ---
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (4, 8)).astype(np.int32)

    def completion(tok_id):
        tok = np.concatenate(
            [prompt, np.full((4, 8), tok_id, np.int32)], axis=1)
        tgt = np.roll(tok, -1, axis=1).astype(np.int32)
        tgt[:, :7] = -100  # mask the prompt (SFT convention)
        tgt[:, -1] = -100
        return jnp.asarray(tok), jnp.asarray(tgt)

    tok_c, tgt_c = completion(7)
    tok_r, tgt_r = completion(11)

    # --- stage 1: LoRA SFT on the chosen data ---
    ad = init_lora(jax.random.PRNGKey(1), cfg, rank=args.rank,
                   targets=("wqkv",))
    opt = init_opt_state(ad["blocks"])
    sft = jax.jit(make_lora_train_step(
        base, cfg, OptConfig(lr=3e-2, weight_decay=0.0),
        ignore_index=-100))
    for i in range(args.sft_steps):
        ad, opt, loss = sft(ad, opt, tok_c, tgt_c)
        if i % 5 == 0 or i == args.sft_steps - 1:
            print(f"[sft]  step {i:3d}  loss {float(loss):.4f}")

    # --- stage 2: LoRA-DPO (frozen base = reference) ---
    opt = init_opt_state(ad["blocks"])  # fresh moments for the new objective
    dpo = jax.jit(make_lora_dpo_step(
        base, cfg, OptConfig(lr=1e-2, weight_decay=0.0), beta=0.25,
        vocab_chunk=64))
    for i in range(args.dpo_steps):
        ad, opt, m = dpo(ad, opt, tok_c, tgt_c, tok_r, tgt_r)
        if i % 5 == 0 or i == args.dpo_steps - 1:
            print(f"[dpo]  step {i:3d}  loss {float(m['loss']):.4f}  "
                  f"margin {float(m['reward_margin']):+.3f}  "
                  f"acc {float(m['reward_acc']):.2f}")

    # --- stage 3: serve base + adapter side by side ---
    srv = InferenceServer(base, cfg, batch_slots=2, n_pages=64, page_size=8,
                          max_loras=2, lora_rank=args.rank)
    lid = srv.register_lora(to_serving(ad))
    r_base = srv.submit(prompt[0], max_new=6)            # lora_id 0 = base
    r_tuned = srv.submit(prompt[0], max_new=6, lora_id=lid)
    srv.run()
    print(f"[serve] base  : {srv.requests[r_base].tokens}")
    print(f"[serve] tuned : {srv.requests[r_tuned].tokens}  "
          f"(aligned toward token 7, away from 11)")


if __name__ == "__main__":
    main()
