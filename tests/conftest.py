"""Test configuration: force the CPU backend with 8 virtual devices.

Real TPU hardware is exercised by bench.py and the driver; the functional
suite runs hermetically on CPU (the "fake backend" tier the reference never
had — its CI requires a physical GPU, .github/workflows/ci.yml:16-40).
Pallas kernels are validated here via interpret mode on small shapes.

Must run before the first `import jax` anywhere in the test session.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force-override: the driver environment pins JAX_PLATFORMS to the TPU
# tunnel and a sitecustomize module initializes JAX backends at interpreter
# startup, so setting env vars alone is too late — reset the backend cache.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax._src.xla_bridge._clear_backends()
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
