"""Zero-bubble pipeline training on an 8-device mesh (CPU-virtual friendly).

Run anywhere:  python examples/zb_pipeline.py
(on a machine without 4+ accelerators it self-provisions virtual CPU
devices, same recipe as tests/conftest.py)

Demonstrates the hand-scheduled F/B/W pipeline from
kfunca_tpu/parallel/zero_bubble.py: the schedule table, its cost vs the
scan-based GPipe pipeline, and a short training loop where the ZB step
supplies (loss, stage grads) and plain SGD consumes them.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STAGES, N_MICRO, MB, DIM = 4, 8, 4, 64

if __name__ == "__main__":
    import numpy as np

    import jax

    if len(jax.devices()) < N_STAGES:
        # self-provision virtual CPU devices (same recipe as tests/conftest)
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax._src.xla_bridge._clear_backends()
        jax._src.xla_bridge.get_backend.cache_clear()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from kfunca_tpu.parallel.pipeline import stack_stages
    from kfunca_tpu.parallel.zero_bubble import (
        make_zb_train_step, schedule_cost, zb_schedule,
    )

    sched = zb_schedule(N_STAGES, N_MICRO)
    names = {0: ".", 1: "F", 2: "B", 3: "W"}
    print("schedule (rows = stages, cols = ticks):")
    for d in range(N_STAGES):
        print("  " + "".join(names[o] for o in sched[d]))
    print("cost:", schedule_cost(N_STAGES, N_MICRO))

    rng = np.random.default_rng(0)
    layers = [
        {"w": jnp.asarray(rng.standard_normal((DIM, DIM)) * 0.2, jnp.float32),
         "b": jnp.zeros((DIM,), jnp.float32)}
        for _ in range(N_STAGES * 2)
    ]
    params = stack_stages(layers, N_STAGES)

    def stage_fn(sp, x):
        h, _ = jax.lax.scan(
            lambda c, lp: (jnp.tanh(c @ lp["w"] + lp["b"]), None), x, sp
        )
        return h

    targets = jnp.asarray(rng.standard_normal((N_MICRO, MB, DIM)), jnp.float32)

    def loss_fn(y, i):
        t = jax.lax.dynamic_index_in_dim(targets, i, 0, keepdims=False)
        return jnp.mean((y - t) ** 2)

    mesh = Mesh(np.asarray(jax.devices()[:N_STAGES]), ("pp",))
    step = jax.jit(make_zb_train_step(stage_fn, loss_fn, mesh, n_micro=N_MICRO))
    x = jnp.asarray(rng.standard_normal((N_MICRO, MB, DIM)), jnp.float32)

    lr = 0.05
    with mesh:
        for it in range(20):
            loss, grads = step(params, x)
            params = jax.tree_util.tree_map(
                lambda p, g: p - lr * g.astype(p.dtype), params, grads
            )
            if it % 5 == 0 or it == 19:
                print(f"iter {it}: loss {float(loss):.4f}")
    print("done (loss should decrease)")
