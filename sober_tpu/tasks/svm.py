"""SVM feature-selection task (mixed binary + continuous domain).

Rebuild of experiments/_svm.py: select 20 of the features (binary mask) and
3 SVR hyperparameters (epsilon, C, gamma on log scales) to minimize test
RMSE of an SVR on the UCI slice-localization data.

The UCI CSV is not vendored in the reference repo either (it points to the
UCI download); when absent, a synthetic sparse-regression dataset with the
same shape is generated so the benchmark harness stays runnable offline.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..priors.discrete import MixedBinaryPrior

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
N_FEATURES = 20


def _synthetic_uci_like(n: int = 2000, n_cols: int = 50, seed: int = 0):
    """Sparse linear-plus-nonlinear regression data standing in for the UCI
    slice dataset when it is not downloadable (zero-egress images)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, n_cols))
    informative = rng.choice(n_cols, 8, replace=False)
    w = rng.normal(size=8)
    y = x[:, informative] @ w + 0.3 * np.sin(3 * x[:, informative[0]])
    y = y + 0.05 * rng.normal(size=n)
    return np.column_stack([x, y])


def _process_uci_data(data: np.ndarray, n_features: int, seed: int = 0):
    """Feature ranking + train/test split following the reference's
    process_uci_data (experiments/_svm.py upstream of :220): keep the
    n_features columns most correlated with the target, split 50/50."""
    rng = np.random.default_rng(seed)
    x, y = data[:, :-1], data[:, -1]
    y = (y - y.mean()) / max(y.std(), 1e-12)
    corr = np.abs(np.array([
        np.corrcoef(x[:, j], y)[0, 1] if x[:, j].std() > 0 else 0.0
        for j in range(x.shape[1])]))
    keep = np.argsort(-corr)[:n_features]
    x = x[:, keep]
    n = min(len(x), 1000)
    perm = rng.permutation(len(x))[:n]
    x, y = x[perm], y[perm]
    half = n // 2
    return x[:half], y[:half], x[half:], y[half:]


class SVMFeatureSelection:
    """(experiments/_svm.py:220-268)"""

    def __init__(self, dim: int, data: np.ndarray):
        self.n_features = dim - 3
        self.dim = dim
        (self.train_x, self.train_y,
         self.test_x, self.test_y) = _process_uci_data(data, self.n_features)

    def _evaluate_true(self, x: np.ndarray) -> float:
        from sklearn.svm import SVR

        mask = x[: self.n_features] >= 0.5
        inds = np.flatnonzero(mask)
        if len(inds) == 0:
            pred = np.full_like(self.test_y, self.train_y.mean())
        else:
            epsilon = 0.01 * 10 ** (2 * x[-3])
            c = 0.01 * 10 ** (4 * x[-2])
            gamma = (1 / self.n_features) * 0.1 * 10 ** (2 * x[-1])
            model = SVR(C=c, epsilon=epsilon, gamma=gamma)
            model.fit(self.train_x[:, inds], self.train_y)
            pred = model.predict(self.test_x[:, inds])
        return math.sqrt(float(((pred - self.test_y) ** 2).mean()))

    def __call__(self, x) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x))
        return np.array([self._evaluate_true(row) for row in x])


def setup_svm(data_path: Optional[str] = None, seed: int = 0):
    """20 binary feature masks + 3 continuous hypers on [0,1], binary-first
    layout (experiments/_svm.py:270-310). Maximization convention
    (negated RMSE)."""
    n_dims_cont, n_dims_binary = 3, N_FEATURES
    dim = n_dims_cont + n_dims_binary
    path = data_path or os.path.join(_DATA_DIR,
                                     "slice_localization_data.csv")
    if os.path.exists(path):
        import pandas as pd

        data = np.asarray(pd.read_csv(path))
    else:
        data = _synthetic_uci_like(seed=seed)
    svm = SVMFeatureSelection(dim, data)
    bounds = jnp.stack([jnp.zeros(n_dims_cont), jnp.ones(n_dims_cont)])
    prior = MixedBinaryPrior(n_dims_cont, n_dims_binary, bounds,
                             continous_first=False)

    def test_function(x):
        return jnp.asarray(-svm(np.asarray(x)), jnp.float32)

    return prior, test_function
