"""Round-4 item 2: attribute the non-matmul time in bench_train_mfu
(221.9 ms/step, MFU 0.536 -> target >= 0.60).

Interleaved arms at the bench shape (L12 d1024 ff4096 h8 B8 S2048 bf16,
fp32 master params, chunked-vocab loss 4096):
  full      fwd + bwd + AdamW               (the production step)
  nopt      fwd + bwd only
  fwd       loss forward only
  fwdnl     forward to final hidden (no LM head / loss)
  opt       AdamW alone on frozen grads

deltas: bwd = nopt-fwd;  optimizer = full-nopt;  head+loss = fwd-fwdnl.
Then the matmul-roofline share says what's left for norms/rope/attention.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

from kfunca_tpu.models.train import (  # noqa: E402
    OptConfig, apply_update, init_opt_state, make_train_step,
)
from kfunca_tpu.models.transformer import (  # noqa: E402
    TransformerConfig, hidden_states, init_params, loss_fn_chunked,
)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:1]))


def slope(make_chain, k1, k2, reps=3):
    f1, f2 = make_chain(k1), make_chain(k2)
    for f in (f1, f2):
        sync(f())
    best = {}
    for kk, f in ((k1, f1), (k2, f2)):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f())
            ts.append(time.perf_counter() - t0)
        best[kk] = min(ts)
    return (best[k2] - best[k1]) / (k2 - k1)


def main(dm=1024, L=12, h=8, ff=4096, B=8, S=2048, vocab=32000,
         loss_chunk=4096):
    cfg = TransformerConfig(
        vocab_size=vocab, d_model=dm, n_heads=h, n_layers=L, d_ff=ff,
        max_seq_len=S, dtype="bfloat16")
    oc = OptConfig(lr=1e-4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = init_opt_state(params, oc)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 2, vocab,
                                jnp.int32)
    targets = jnp.roll(tokens, -1, axis=1)
    step = make_train_step(cfg, oc, loss_chunk=loss_chunk)

    def lossf(p, t, tg):
        return loss_fn_chunked(p, t, tg, cfg, loss_chunk)

    def mk_full(K):
        @jax.jit
        def f(p, o, t, tg):
            def body(_, c):
                p, o = c
                p, o, _l = step(p, o, t, tg)
                return (p, o)
            p, o = lax.fori_loop(0, K, body, (p, o))
            return p["final_norm"][:1] + o["step"].astype(jnp.float32)
        return lambda: f(params, opt_state, tokens, targets)

    def mk_nopt(K):
        @jax.jit
        def f(p, t, tg):
            def body(_, c):
                p, acc = c
                lv, g = jax.value_and_grad(lossf)(p, t, tg)
                # consume every grad leaf; feed a data-dependent epsilon
                # back into ONE param leaf so iterations can't collapse
                gsum = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                           for x in jax.tree_util.tree_leaves(g))
                p = dict(p)
                p["final_norm"] = jnp.maximum(
                    p["final_norm"], gsum * 1e-30 - 3e38)
                return (p, acc + lv)
            p, acc = lax.fori_loop(0, K, body, (p, jnp.float32(0)))
            return acc
        return lambda: f(params, tokens, targets)

    # Every arm must feed its result back into a PARAM the next iteration
    # reads, or XLA's while-loop invariant code motion hoists the entire
    # loop-invariant computation out and the slope measures ~nothing (the
    # first run of this tool read fwd=25 ms — BELOW the 48 ms matmul
    # roofline of a forward pass, i.e. physically impossible).
    # The feedback param must be the EMBEDDING (the first op every later
    # computation depends on): feeding final_norm only varied the network
    # TAIL, and XLA's while-loop invariant code motion hoisted all 12
    # blocks out of the loop (second run: fwd=25 ms < the 39.5 ms matmul
    # roofline of a forward pass — physically impossible).
    def _bump_embed(p, scalar):
        p = dict(p)
        p["embed"] = lax.dynamic_update_slice(
            p["embed"],
            jnp.maximum(p["embed"][0:1, 0:1],
                        scalar * 1e-30 - jnp.float32(3e38)),
            (0, 0))
        return p

    def mk_fwd(K):
        @jax.jit
        def f(p, t, tg):
            def body(_, p):
                return _bump_embed(p, lossf(p, t, tg))
            p = lax.fori_loop(0, K, body, p)
            return p["embed"][:1, 0]
        return lambda: f(params, tokens, targets)

    def mk_fwdnl(K):
        @jax.jit
        def f(p, t):
            def body(_, p):
                hid = hidden_states(p, t, cfg)
                # consume the FULL hidden state (a single element would let
                # XLA slice the stack)
                return _bump_embed(p, jnp.sum(hid.astype(jnp.float32)))
            p = lax.fori_loop(0, K, body, p)
            return p["embed"][:1, 0]
        return lambda: f(params, tokens)

    # structural grads only (ones): computing real grads here would hold a
    # second 1 GB tree resident across every arm and OOM the chip
    grads0 = jax.tree.map(jnp.ones_like, params)

    def mk_opt(K):
        @jax.jit
        def f(p, o, g):
            def body(_, c):
                p, o = c
                # grads derived from p: static grads make every carry leaf
                # except final_norm DEAD (XLA's WhileLoopSimplifier strips
                # dead tuple elements — the first run measured opt = 0 ms)
                eps = p["final_norm"][0] * 1e-38
                g2 = jax.tree.map(lambda x: x + eps.astype(x.dtype), g)
                p, o = apply_update(p, g2, o, oc)
                return (p, o)
            p, o = lax.fori_loop(0, K, body, (p, o))
            # consume one element of EVERY leaf so no carry element is dead
            tot = sum(jnp.ravel(x)[0].astype(jnp.float32)
                      for x in jax.tree_util.tree_leaves((p, o)))
            return tot
        return lambda: f(params, opt_state, grads0)

    arms = [("full", mk_full, (1, 4)), ("nopt", mk_nopt, (1, 4)),
            ("fwd", mk_fwd, (2, 8)), ("fwdnl", mk_fwdnl, (2, 8)),
            ("opt", mk_opt, (2, 10))]
    acc = {nm: [] for nm, _, _ in arms}
    for rnd in range(3):
        for nm, mk, (k1, k2) in arms:
            dt = slope(mk, k1, k2)
            acc[nm].append(dt)
            print(f"[r{rnd}] {nm:6s}: {dt*1e3:.2f} ms", flush=True)
    med = {nm: sorted(acc[nm])[1] * 1e3 for nm, _, _ in arms}
    print("--- medians (ms) ---")
    for nm in med:
        print(f"{nm:6s}: {med[nm]:.2f}")
    print(f"bwd = nopt-fwd        = {med['nopt'] - med['fwd']:.2f} ms")
    print(f"optimizer = full-nopt = {med['full'] - med['nopt']:.2f} ms")
    print(f"head+loss = fwd-fwdnl = {med['fwd'] - med['fwdnl']:.2f} ms")
    print(f"opt alone             = {med['opt']:.2f} ms")
    n_mm = L * (dm * cfg.qkv_out + dm * dm + 3 * dm * ff) + dm * vocab
    ideal = (6 * n_mm * B * S) / 194e12 * 1e3
    print(f"matmul roofline @194 TFLOP/s = {ideal:.1f} ms")


if __name__ == "__main__":
    main()
