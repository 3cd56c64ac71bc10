"""r5: INTERLEAVED same-process A/B of fp32 vs bf16 optimizer moments on
the full bench_train_mfu step (VERDICT r4 #2: "fuse/bf16-ize the AdamW
state traffic toward its ~8.5 ms floor").  Sequential bench phases drift
10-30% on this relay, so rounds alternate A,B,A,B and the claim is the
within-round delta.

Traffic math at the 234M-param bench shape (fp32 masters):
  fp32 state: read p+g+m+v, write p+m+v  = 28 B/param -> ~6.5 GB -> ~8.0 ms
  bf16 m+v:   read p+g+m+v, write p+m+v  = 20 B/param -> ~4.7 GB -> ~5.7 ms
so the bf16 arm should shave ~2.3 ms off the optimizer phase's HBM floor
(more off its measured in-step marginal if that scales with traffic).
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import bench_train_mfu, detect_peak_tflops  # noqa: E402


def main():
    peak = detect_peak_tflops()
    res = {"fp32": [], "bf16": []}
    for rnd in range(3):
        for name, sd in (("fp32", "float32"), ("bf16", "bfloat16")):
            out = bench_train_mfu(peak=peak, state_dtype=sd, reps=1)
            res[name].append(out["step_ms"])
            print(f"[r{rnd}] {name}-state: {out['step_ms']} ms/step "
                  f"mfu {out['mfu']}", flush=True)
    print("\n=== interleaved fp32 vs bf16 optimizer state ===")
    for name, ds in res.items():
        print(f"{name}: best {min(ds)} ms  (rounds: {ds})")
    wins = sum(1 for a, b in zip(res["fp32"], res["bf16"]) if b < a)
    print(f"bf16 wins {wins}/3 rounds; best-vs-best delta "
          f"{min(res['fp32']) - min(res['bf16']):.2f} ms")


if __name__ == "__main__":
    main()
