"""Property-based gates (hypothesis) for the pure-NumPy training
kernels — randomized finite-difference and consistency checks, no Spark
session needed (fast)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ontoea_spark.training.trainer import (
    MLPHead,
    OntoEATrainer,
    TrainConfig,
    limited_loss_grads,
)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**6))
def test_limited_loss_grads_fd(seed):
    """d(loss)/d(pos_d) == 2*pos_coef*pos_d and likewise for neg —
    checked by central finite differences at random points (away from
    the relu kinks by construction of the epsilon)."""
    rng = np.random.default_rng(seed)
    n, d = 4, 3
    pos = rng.normal(size=(n, d))
    neg = rng.normal(size=(n, d))
    pm, nm, bal = 0.01, 2.0, 0.2
    loss, pc, nc = limited_loss_grads(pos, neg, pm, nm, bal)
    g_pos = 2.0 * pc[:, None] * pos
    g_neg = 2.0 * nc[:, None] * neg
    eps = 1e-7
    for arr, g in ((pos, g_pos), (neg, g_neg)):
        i, j = rng.integers(n), rng.integers(d)
        # skip points too close to a relu kink for a clean FD estimate
        s = np.sum(arr[i] * arr[i])
        if abs(s - pm) < 1e-3 or abs(s - nm) < 1e-3:
            continue
        orig = arr[i, j]
        arr[i, j] = orig + eps
        lp, _, _ = limited_loss_grads(pos, neg, pm, nm, bal)
        arr[i, j] = orig - eps
        lm, _, _ = limited_loss_grads(pos, neg, pm, nm, bal)
        arr[i, j] = orig
        fd = (lp - lm) / (2 * eps)
        assert abs(fd - g[i, j]) < 1e-5 * max(1.0, abs(fd))


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10**6))
def test_mlp_head_fd_randomized(seed):
    rng = np.random.default_rng(seed)
    d = 5
    head = MLPHead(rng, d, d, lr=0.01)
    X = rng.normal(size=(3, d))
    tgt = rng.normal(size=(3, d))
    W0, b0 = head.W.copy(), head.b.copy()

    def loss_at(Xv):
        a = np.tanh(Xv @ W0 + b0)
        z = a / np.linalg.norm(a, axis=1, keepdims=True)
        dd = z - tgt
        return float(np.sum(dd * dd))

    z, cache = head.forward(X)
    dz = 2.0 * (z - tgt)
    Xc, a, norms, zc = cache
    da = (dz - np.sum(dz * zc, axis=1, keepdims=True) * zc) / norms
    du = da * (1.0 - a * a)
    gx = du @ W0.T
    eps = 1e-6
    i, j = rng.integers(3), rng.integers(d)
    orig = X[i, j]
    X[i, j] = orig + eps
    lp = loss_at(X)
    X[i, j] = orig - eps
    lm = loss_at(X)
    X[i, j] = orig
    fd = (lp - lm) / (2 * eps)
    assert abs(fd - gx[i, j]) < 1e-4 * max(1.0, abs(fd))


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10**6))
def test_sliced_likelihood_equals_full(seed):
    """E5 with idx = all rows must take the exact same step as the full
    symmetric path (gradient decomposition dS + dS.T == row + column
    contributions)."""
    rng = np.random.default_rng(seed)
    n_cls = 6
    M = rng.random((n_cls, n_cls))
    a = OntoEATrainer(4, 2, n_cls, TrainConfig(dim=8, seed=seed % 2**31))
    b = OntoEATrainer(4, 2, n_cls, TrainConfig(dim=8, seed=seed % 2**31))
    la = a.step_likelihood(M)
    lb = b.step_likelihood(M, idx=np.arange(n_cls))
    assert abs(la - lb) < 1e-9 * max(1.0, abs(la))
    assert np.allclose(a.onto, b.onto, atol=1e-12)
