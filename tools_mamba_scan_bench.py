"""A/B the Mamba selective scan on the real TPU.

Two questions:
 1. Does the naive full-sequence scan even FIT at a production-ish shape?
    (d768 L2048 B4 fwd+bwd: measured NO — XLA asks 17.52G of 15.75G HBM;
    the (B, L, di, N) temporaries dominate.)  -> the chunked ssm_apply is
    load-bearing, not a micro-optimization.
 2. Which chunk size is fastest where variants fit?  Interleaved
    slope-timed train-step loops (on-device lax.scan over K steps, so the
    relay RTT cancels in the K=2 -> K=8 slope).

    python tools_mamba_scan_bench.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kfunca_tpu.models.mamba import MambaConfig, init_mamba_params, loss_fn
from kfunca_tpu.models.train import OptConfig, apply_update, init_opt_state

OC = OptConfig(lr=1e-4, weight_decay=0.0)


def bench(tag, base, B, L, variants, rounds=3):
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(2, base.vocab_size, (B, L)),
        jnp.int32)
    targets = jnp.roll(tokens, -1, axis=1)
    params = init_mamba_params(jax.random.PRNGKey(0), base)
    opt = init_opt_state(params, OC)

    def make_loop(cfg, k):
        def one(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, tokens, targets, cfg)
            p, o = apply_update(p, grads, o, OC)
            return (p, o), loss

        @jax.jit
        def loop(p, o):
            (p, o), losses = jax.lax.scan(one, (p, o), None, length=k)
            return losses[-1]

        return loop

    loops = {}
    for name, chunk in variants:
        cfg = dataclasses.replace(base, scan_chunk=chunk)
        fns = {k: make_loop(cfg, k) for k in (2, 8)}
        try:
            for k in (2, 8):
                jax.device_get(fns[k](params, opt))
        except Exception as e:  # noqa: BLE001 - OOM is a result here
            msg = str(e).splitlines()[0][:120]
            print(f"[{tag}] {name}: DOES NOT FIT ({msg})", flush=True)
            continue
        loops[name] = fns
        print(f"[{tag}] {name} compiled", flush=True)

    def timed(fn):
        t0 = time.perf_counter()
        jax.device_get(fn(params, opt))
        return time.perf_counter() - t0

    for rnd in range(rounds):
        line = []
        for name, fns in loops.items():
            per = (timed(fns[8]) - timed(fns[2])) / 6.0
            line.append(f"{name} {per*1e3:7.1f} ms/step "
                        f"{B*L/per/1e3:6.1f}k tok/s")
        print(f"[{tag}] round {rnd}: " + " | ".join(line), flush=True)


# production-ish: d768 (di 1536), L2048 — naive expected to OOM
bench("d768-L2048",
      MambaConfig(vocab_size=8192, d_model=768, n_layers=4, d_state=16,
                  dtype="bfloat16"),
      B=4, L=2048,
      variants=[("naive", None), ("chunk128", 128), ("chunk256", 256),
                ("chunk512", 512)])

# smaller: d512 (di 1024), L1024 — everything fits; direct speed A/B
bench("d512-L1024",
      MambaConfig(vocab_size=8192, d_model=512, n_layers=4, d_state=16,
                  dtype="bfloat16"),
      B=4, L=1024,
      variants=[("naive", None), ("chunk128", 128), ("chunk256", 256),
                ("chunk512", 512)])
