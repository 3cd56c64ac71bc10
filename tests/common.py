"""Shared oracle helper (port of reference test/common.py:6-11).

The reference helper swaps atol/rtol positionally when forwarding to
np.allclose; the port keeps the *effective* tolerances identical by
forwarding the same way, so every tolerance in the ported tests means
exactly what it meant upstream.
"""

import numpy as np


def assert_allclose(tensor_a, tensor_b, atol=1e-3, rtol=1e-3):
    if not isinstance(tensor_a, np.ndarray):
        tensor_a = tensor_a.contiguous().numpy()
    if not isinstance(tensor_b, np.ndarray):
        tensor_b = tensor_b.contiguous().numpy()
    assert np.allclose(tensor_a, tensor_b, rtol=atol, atol=rtol)
