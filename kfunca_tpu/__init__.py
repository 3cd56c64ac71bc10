"""kfunca_tpu — a TPU-native minimal autodiff tensor framework.

Brand-new rebuild of the capability set of xytpai/kfunca (a single-GPU
CUDA/C++ eager framework) designed TPU-first:

  * data plane: flat jax.Array buffers in HBM; strided views are metadata,
    normalized to dense arrays by a layout engine (core/materialize.py)
  * compute plane: XLA ops everywhere + Pallas kernels for the hot paths
    (MXU-tiled GEMM, flash causal attention fwd+bwd, Welford statistics)
  * runtime: caching allocator with size-class pooling and buffer recycling
    (C++ bookkeeping core), logical stable device pointers, memstat
  * autograd: tape-based backward with two-pass BFS scheduling
  * scale-out (extension; absent in the reference): jax.sharding mesh
    utilities and a transformer model family under kfunca_tpu.models

Public API mirrors the reference pybind module (register.cpp:59-225) so a
kfunca user can switch by changing the import.
"""

import jax as _jax

# The reference framework is eager with full int64/fp64 support; JAX hides
# 64-bit types by default, so opt in before any tracing happens.
_jax.config.update("jax_enable_x64", True)

from .core.dtype import ScalarType  # noqa: E402
from .core.dtype import ScalarType as dtype  # noqa: E402  (kfunca.dtype enum alias)
from .core.tensor import (  # noqa: E402
    GradFunction,
    Tensor,
    Tensor as tensor,
    empty,
    empty_like,
    empty_strided,
    from_jax,
    from_numpy,
    to_numpy,
    zeros,
)
from .ops.attention import causal_attention  # noqa: E402
from .ops.gemm import gemm  # noqa: E402
from .ops.quant import gemm_w8, quantize_cols  # noqa: E402
from .ops.shape_ops import concat as cat  # noqa: E402
from .runtime.allocator import memstat  # noqa: E402
from .runtime.autotune import autotune  # noqa: E402
from .runtime.launcher import Launcher  # noqa: E402
from .utils.compare import all_close, max_diff  # noqa: E402
from .utils.device_info import device_info  # noqa: E402

launcher = Launcher.instance()
set_device = launcher.set_device
device_count = launcher.device_count

# dtype enum values exported at module level (pybind export_values analog).
for _name, _member in {
    "bool": ScalarType.Bool,
    "byte": ScalarType.Byte,
    "char": ScalarType.Char,
    "short": ScalarType.Short,
    "int": ScalarType.Int,
    "long": ScalarType.Long,
    "half": ScalarType.Half,
    "bfloat16": ScalarType.BFloat16,
    "float": ScalarType.Float,
    "double": ScalarType.Double,
}.items():
    globals()[_name] = _member

__version__ = "0.1.0"

__all__ = [
    "ScalarType",
    "dtype",
    "Tensor",
    "tensor",
    "GradFunction",
    "empty",
    "empty_like",
    "empty_strided",
    "zeros",
    "from_numpy",
    "to_numpy",
    "cat",
    "gemm",
    "gemm_w8",
    "quantize_cols",
    "causal_attention",
    "device_info",
    "memstat",
    "Launcher",
    "launcher",
    "set_device",
    "device_count",
    "all_close",
    "max_diff",
    "autotune",
]
