"""Round-4: end-to-end InferenceServer wall-clock with decode_burst.

The device decode step is ~1.4 ms (tools_r4_decode_ab.py) but the host
scheduler pays a relayed dispatch round-trip per step; decode_burst=K
amortizes it K-fold.  This measures the real server loop (submit + run)
wall-clock tokens/s at burst 1 / 4 / 16, same requests, greedy, and
asserts token equality across bursts.
"""

import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kfunca_tpu.models.serve import InferenceServer  # noqa: E402
from kfunca_tpu.models.transformer import (  # noqa: E402
    TransformerConfig, init_params,
)


def main():
    cfg = TransformerConfig(vocab_size=32000, d_model=1024, n_heads=16,
                            n_layers=8, d_ff=4096, max_seq_len=2048)
    params = init_params(jax.random.PRNGKey(7), cfg)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 30000, size=n).tolist()
               for n in (57, 33, 91, 18, 64, 40, 77, 25)]
    max_new = 64
    outs = {}
    for burst in (1, 4, 16):
        srv = InferenceServer(params, cfg, batch_slots=8, page_size=128,
                              n_pages=96, max_pages_per_seq=8,
                              decode_burst=burst)
        ids = [srv.submit(p, max_new=max_new) for p in prompts]
        # warm compile: run one request set end-to-end first? prefill
        # buckets + both decode programs compile during this run; time a
        # SECOND identical run for the steady-state number
        srv.run()
        srv2 = InferenceServer(params, cfg, batch_slots=8, page_size=128,
                               n_pages=96, max_pages_per_seq=8,
                               decode_burst=burst)
        ids = [srv2.submit(p, max_new=max_new) for p in prompts]
        t0 = time.perf_counter()
        res = srv2.run()
        dt = time.perf_counter() - t0
        toks = sum(len(v) for v in res.values())
        outs[burst] = [res[r] for r in ids]
        print(f"burst={burst:>2}: {toks} tokens in {dt:.2f}s = "
              f"{toks/dt:,.0f} tok/s wall (server loop, host RTT incl.)")
    for b in (4, 16):
        assert outs[b] == outs[1], f"burst={b} tokens diverge"
    print("token equality across bursts: OK")


if __name__ == "__main__":
    main()
