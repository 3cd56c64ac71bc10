"""Unary math family tests (extension beyond the reference's
clone/copy/convert-only unary layer): forward vs numpy, backward vs torch."""

import numpy as np
import torch

import kfunca_tpu as kfunca
from common import assert_allclose

np.random.seed(0)

UNARY = {
    "neg": (lambda x: -x, lambda t: -t),
    "abs": (np.abs, torch.abs),
    "exp": (np.exp, torch.exp),
    "log": (np.log, torch.log),
    "sqrt": (np.sqrt, torch.sqrt),
    "relu": (lambda x: np.maximum(x, 0), torch.relu),
    "sigmoid": (lambda x: 1 / (1 + np.exp(-x)), torch.sigmoid),
    "tanh": (np.tanh, torch.tanh),
}


class TestUnary:
    def test_forward_vs_numpy(self):
        for name, (np_fn, _) in UNARY.items():
            arr = np.random.uniform(0.1, 5, size=(7, 13)).astype(np.float32)
            t = kfunca.from_numpy(arr, 0)
            out = getattr(t, name)()
            assert_allclose(out, np_fn(arr).astype(np.float32))

    def test_neg_dunder_and_matmul_dunder(self):
        arr = np.random.uniform(-1, 1, size=(8, 16)).astype(np.float32)
        t = kfunca.from_numpy(arr, 0)
        assert_allclose(-t, -arr)
        w = np.random.uniform(-1, 1, size=(16, 4)).astype(np.float32)
        assert_allclose(t @ kfunca.from_numpy(w, 0), arr @ w)

    def test_backward_vs_torch(self):
        for name, (_, torch_fn) in UNARY.items():
            arr = np.random.uniform(0.2, 3, size=(4, 5)).astype(np.float32)
            g = np.random.uniform(-1, 1, size=(4, 5)).astype(np.float32)
            t = kfunca.from_numpy(arr, 0).set_requires_grad(True)
            out = getattr(t, name)()
            out.backward(kfunca.from_numpy(g, 0))
            tt = torch.from_numpy(arr).requires_grad_(True)
            torch_fn(tt).backward(torch.from_numpy(g))
            assert_allclose(t.grad(), tt.grad), name

    def test_int_unary(self):
        arr = np.array([[-3, 5, -7]], dtype=np.int32)
        t = kfunca.from_numpy(arr, 0)
        assert np.array_equal(t.abs().numpy(), np.abs(arr))
        assert np.array_equal(t.neg().numpy(), -arr)
        assert t.abs().dtype() == kfunca.ScalarType.Int
