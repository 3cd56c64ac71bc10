"""A/B the chunked-vocab cross-entropy against the materializing loss on
the real TPU: full train step (fwd+bwd+AdamW) at the bench_train_mfu shape.

Interleaved within one process (verify-skill discipline): for each chunk
setting the K=1/K=4 chained-step endpoints are measured round-robin so
relay drift hits all arms equally.

Run: python tools_losschunk.py  (background; ~10 min with warm cache)
"""

import sys
import time

import jax

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (reuses slope_time, cache-dir setup)
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step  # noqa: E402
from kfunca_tpu.models.transformer import TransformerConfig, init_params  # noqa: E402


def main(dm=1024, L=12, h=16, ff=4096, B=8, S=2048, vocab=32000):
    cfg = TransformerConfig(vocab_size=vocab, d_model=dm, n_heads=h,
                            n_layers=L, d_ff=ff, max_seq_len=S)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = init_opt_state(params)
    key = jax.random.PRNGKey(1)
    tokens = jax.random.randint(key, (B, S), 0, vocab, jnp.int32)
    targets = jnp.roll(tokens, -1, axis=1)

    def mk_for(loss_chunk):
        step = make_train_step(cfg, OptConfig(lr=1e-4, weight_decay=0.1),
                               loss_chunk=loss_chunk)

        def mk(K):
            @jax.jit
            def f(p, o, t, tg):
                def body(_, carry):
                    p, o = carry
                    p, o, _loss = step(p, o, t, tg)
                    return (p, o)
                p, o = lax.fori_loop(0, K, body, (p, o))
                return p["final_norm"][:1] + o["step"].astype(jnp.float32)
            return lambda: f(params, opt_state, tokens, targets)

        return mk

    arms = {"full": None, "chunk8k": 8192, "chunk4k": 4096, "chunk16k": 16384}
    mks = {name: mk_for(c) for name, c in arms.items()}
    # warm compiles first (serialized; first pallas compile is slow)
    for name, mk in mks.items():
        for K in (1, 4):
            t0 = time.perf_counter()
            bench._sync(mk(K)())
            bench._log(f"warm {name} K={K}: {time.perf_counter()-t0:.1f}s")
    # interleave endpoint measurements: 3 rounds of (arm x K) minima
    t1s = {n: [] for n in arms}
    t4s = {n: [] for n in arms}
    for r in range(3):
        for name, mk in mks.items():
            t1s[name].append(bench._timed(mk(1), iters=4))
            t4s[name].append(bench._timed(mk(4), iters=4))
            bench._log(f"round {r} {name}: K1 {t1s[name][-1]*1e3:.1f} ms, "
                       f"K4 {t4s[name][-1]*1e3:.1f} ms")
    n_mm = L * (dm * cfg.qkv_out + dm * dm + 3 * dm * ff) + dm * vocab
    flops = 6 * n_mm * B * S + 12 * B * S * S * dm
    for name in arms:
        dt = max((min(t4s[name]) - min(t1s[name])) / 3, 1e-9)
        bench._log(f"RESULT {name}: {dt*1e3:.2f} ms/step, "
                   f"MFU {flops/dt/1e12/197.0*100:.1f}%, "
                   f"{B*S/dt/1e3:.1f}k tok/s")


if __name__ == "__main__":
    main()
