"""Minimal repro: compiling a bitonic sort network for segment length
>= 2048 hangs the remote Mosaic compiler (TPU v5e, jax 0.9.0).

DANGER: running this wedges the TPU relay for 10-30+ minutes. It therefore
refuses to run unless KFUNCA_RUN_HANG_REPRO=1 is set.

Observed in round 1: n=1024 compiles in ~30 s; n=2048 never returns (killed
after 30 min; the relay then rejects new work until it recovers). The
kernel below is the minimal shape of kfunca_tpu/ops/pallas_kernels/
bitonic_sort.py: log2(n)*(log2(n)+1)/2 compare-exchange stages, each a
lane roll + select.
"""

import os
import sys

if os.environ.get("KFUNCA_RUN_HANG_REPRO") != "1":
    print("refusing to run (set KFUNCA_RUN_HANG_REPRO=1; wedges the TPU relay)")
    sys.exit(0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp

from kfunca_tpu.ops.pallas_kernels import bitonic_sort

# note: the production dispatcher (ops/sort.py) caps segments at
# DISPATCH_MAX_N=1024 exactly because of this hang; calling the kernel
# directly bypasses that guard.
x = jax.random.normal(jax.random.PRNGKey(0), (8, 2048), jnp.float32)
print("compiling n=2048 bitonic network (expected: hang)...", flush=True)
v, i = bitonic_sort.bitonic_sort_pairs(x)
print("compiled?!", v.shape)
