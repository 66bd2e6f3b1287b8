"""Discrete-domain benchmark tasks: pest control, MaxSAT, Ising
sparsification.

Rebuild of experiments/_pest.py, _maxsat.py, _ising.py. MaxSAT and Ising are
re-expressed as vectorized JAX computations (the reference evaluates batch
entries in Python loops); the pest-control simulator is a stochastic host
simulator (sequential beta draws with tolerance development) and stays in
NumPy as a black box, mirroring the reference semantics.
"""
from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..priors.discrete import BinaryPrior, CategoricalPrior

# ----------------------------------------------------------------------------
# Pest control (experiments/_pest.py:10-195)
# ----------------------------------------------------------------------------

PESTCONTROL_N_CHOICE = 5
PESTCONTROL_N_STAGES = 15


def _pest_control_score(x: np.ndarray, seed: Optional[int] = 0) -> float:
    """(experiments/_pest.py:67-116). Lower is better."""
    u = 0.1
    n_stages = x.size
    n_sim = 100
    rng = np.random.RandomState(seed)

    init_alpha, init_beta = 1.0, 30.0
    spread_alpha, spread_beta = 1.0, 17.0 / 3.0
    control_alpha = 1.0
    control_price_max_discount = {1: 0.2, 2: 0.3, 3: 0.3, 4: 0.0}
    tolerance_develop_rate = {1: 1 / 7, 2: 2.5 / 7, 3: 2 / 7, 4: 0.5 / 7}
    control_price = {1: 1.0, 2: 0.8, 3: 0.7, 4: 0.5}
    control_beta = {1: 2 / 7, 2: 3 / 7, 3: 3 / 7, 4: 5 / 7}

    payed_price_sum = 0.0
    above_threshold = 0.0
    curr = rng.beta(init_alpha, init_beta, size=n_sim)
    for i in range(n_stages):
        spread_rate = rng.beta(spread_alpha, spread_beta, size=n_sim)
        xi = int(x[i])
        if xi > 0:
            control_rate = rng.beta(control_alpha, control_beta[xi],
                                    size=n_sim)
            nxt = (1.0 - control_rate) * curr
            control_beta[xi] += tolerance_develop_rate[xi] / n_stages
            payed = control_price[xi] * (
                1.0 - control_price_max_discount[xi] / n_stages
                * float(np.sum(x == xi)))
        else:
            nxt = spread_rate * (1 - curr) + curr
            payed = 0.0
        payed_price_sum += payed
        above_threshold += float(np.mean(curr > u))
        curr = nxt
    return payed_price_sum + above_threshold


class PestControl:
    """(experiments/_pest.py:119-164)"""

    def __init__(self, random_seed: int = 0):
        self.seed = random_seed
        self.dim = PESTCONTROL_N_STAGES

    def compute(self, x) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x)).astype(int)
        res = np.array([_pest_control_score(row, seed=self.seed)
                        for row in x])
        return res + 1e-6 * np.random.default_rng(0).normal(size=res.shape)


def setup_pest():
    """15 categorical stages x 5 pesticide choices
    (experiments/_pest.py:165-195). Maximization convention (negated)."""
    categories = [list(range(PESTCONTROL_N_CHOICE))] * PESTCONTROL_N_STAGES
    prior = CategoricalPrior([[float(c) for c in cat] for cat in categories])
    pest = PestControl()

    def test_function(x):
        return jnp.asarray(-pest.compute(np.asarray(x)), jnp.float32)

    return prior, test_function


# ----------------------------------------------------------------------------
# MaxSAT (experiments/_maxsat.py)
# ----------------------------------------------------------------------------

class MaxSAT:
    """Weighted MaxSAT over a .wcnf file, vectorized over batches.

    The reference loops clauses per evaluation (experiments/_maxsat.py:83-89);
    here clauses are padded to fixed arity and the whole batch is one masked
    einsum. Weights are standardized as the reference does at load time.
    """

    def __init__(self, data_path: str):
        clauses = []
        weights = []
        n_vars = 0
        with open(data_path) as f:
            for line in f:
                if line.startswith(("c", "p")):
                    if line.startswith("p"):
                        n_vars = int(line.split()[2])
                    continue
                toks = line.split()
                if not toks:
                    continue
                w = float(toks[0])
                lits = [int(t) for t in toks[1:] if int(t) != 0]
                weights.append(w)
                clauses.append(lits)
        self.n_variables = n_vars
        w = np.array(weights, np.float32)
        self.weights = (w - w.mean()) / max(w.std(), 1e-12)
        arity = max(len(c) for c in clauses)
        idx = np.zeros((len(clauses), arity), np.int32)
        sign = np.zeros((len(clauses), arity), np.float32)  # +1/-1; 0 = pad
        for i, lits in enumerate(clauses):
            for j, lit in enumerate(lits):
                idx[i, j] = abs(lit) - 1
                sign[i, j] = 1.0 if lit > 0 else -1.0
        self.idx = jnp.asarray(idx)
        self.sign = jnp.asarray(sign)

    def evaluate(self, x) -> jax.Array:
        """x: (batch, n_vars) in {0,1}. Returns negated weighted satisfied
        count (lower is better — the reference's convention,
        experiments/_maxsat.py:83-89)."""
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        vals = x[:, self.idx]                             # (b, C, A)
        want_true = (self.sign > 0)[None]
        lit_sat = jnp.where(self.sign[None] == 0.0, False,
                            jnp.where(want_true, vals > 0.5, vals < 0.5))
        satisfied = jnp.any(lit_sat, axis=2)              # (b, C)
        return -(satisfied.astype(jnp.float32) @ self.weights)


_DEFAULT_WCNF = os.path.join(os.path.dirname(__file__), "data",
                             "maxcut-johnson8-2-4.clq.wcnf")


def setup_maxsat(data_path: Optional[str] = None):
    """28-variable weighted MaxSAT (experiments/_maxsat.py:95-123)."""
    maxsat = MaxSAT(data_path or _DEFAULT_WCNF)
    prior = BinaryPrior(maxsat.n_variables)

    def test_function(x):
        return -maxsat.evaluate(x)  # maximize satisfied weight

    return prior, test_function


# ----------------------------------------------------------------------------
# Ising sparsification (experiments/_ising.py)
# ----------------------------------------------------------------------------

ISING_GRID_H = 4
ISING_GRID_W = 4
ISING_N_EDGES = 24

_HORIZONTAL_IND = np.asarray([0, 2, 4, 7, 9, 11, 14, 16, 18, 21, 22, 23])
_VERTICAL_IND = np.asarray(
    [i for i in range(24) if i not in
     {0, 2, 4, 7, 9, 11, 14, 16, 18, 21, 22, 23}])


def _all_spin_configs(n: int) -> jax.Array:
    """(2^n, n) matrix of +/-1 spins."""
    ints = jnp.arange(2**n, dtype=jnp.uint32)
    bits = (ints[:, None] >> jnp.arange(n, dtype=jnp.uint32)[None, :]) & 1
    return bits.astype(jnp.float32) * 2.0 - 1.0


class Ising:
    """4x4 Ising interaction sparsification: symmetric-KL objective between
    the original and edge-masked models (experiments/_ising.py:165-200).

    The reference loops the 65536 spin configurations per partition-function
    evaluation in Python; here the full enumeration is a single jitted
    einsum batch.
    """

    def __init__(self, lamda: float, seed: int = 0):
        self.lamda = lamda
        rng = np.random.default_rng(seed)
        h = ((rng.integers(0, 2, (ISING_GRID_H, ISING_GRID_W - 1)) * 2 - 1)
             * rng.uniform(0.05, 5.0, (ISING_GRID_H, ISING_GRID_W - 1)))
        v = ((rng.integers(0, 2, (ISING_GRID_H - 1, ISING_GRID_W)) * 2 - 1)
             * rng.uniform(0.05, 5.0, (ISING_GRID_H - 1, ISING_GRID_W)))
        self.h = jnp.asarray(h, jnp.float32)
        self.v = jnp.asarray(v, jnp.float32)

        spins = _all_spin_configs(ISING_GRID_H * ISING_GRID_W)
        self._grid = spins.reshape(-1, ISING_GRID_H, ISING_GRID_W)
        self._spins = spins
        energy = self._log_energy(self.h, self.v)
        m = jnp.max(energy)
        density = jnp.exp(energy - m)
        z = jnp.sum(density)
        self.log_partition_original = jnp.log(z) + m
        density = density / z
        self.covariance = spins.T @ (spins * density[:, None])

    def _log_energy(self, h, v):
        g = self._grid
        h_comp = jnp.einsum("shw,hw->s", g[:, :, :-1] * g[:, :, 1:], h) * 2.0
        v_comp = jnp.einsum("shw,hw->s", g[:, :-1, :] * g[:, 1:, :], v) * 2.0
        return h_comp + v_comp

    def _log_partition(self, h, v):
        e = self._log_energy(h, v)
        m = jnp.max(e)
        return jnp.log(jnp.sum(jnp.exp(e - m))) + m

    def _kld_term(self, dh, dv):
        """Sum over adjacent-pair covariances weighted by the interaction
        difference (ising_dense, experiments/_ising.py:131-146)."""
        cov = self.covariance.reshape(ISING_GRID_H, ISING_GRID_W,
                                      ISING_GRID_H, ISING_GRID_W)
        # NOTE: spin index i maps to (row i // W, col i % W)
        horiz = sum(
            dh[r, c] * cov[r, c, r, c + 1]
            for r in range(ISING_GRID_H) for c in range(ISING_GRID_W - 1))
        vert = sum(
            dv[r, c] * cov[r, c, r + 1, c]
            for r in range(ISING_GRID_H - 1) for c in range(ISING_GRID_W))
        return horiz + vert

    def evaluate_single(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.float32)
        xh = x[_HORIZONTAL_IND].reshape(ISING_GRID_H, ISING_GRID_W - 1)
        xv = x[_VERTICAL_IND].reshape(ISING_GRID_H - 1, ISING_GRID_W)
        h_s, v_s = xh * self.h, xv * self.v
        log_z_s = self._log_partition(h_s, v_s)
        kld = (2.0 * self._kld_term(self.h - h_s, self.v - v_s)
               + log_z_s - self.log_partition_original)
        return kld + self.lamda * jnp.sum(x)

    def evaluate(self, x) -> jax.Array:
        x = jnp.atleast_2d(x)
        return jax.vmap(self.evaluate_single)(x)


def setup_ising(lamda: float = 1e-4):
    """24 binary edge masks (experiments/_ising.py:201-226)."""
    prior = BinaryPrior(ISING_N_EDGES)
    ising = Ising(lamda)
    eval_jit = jax.jit(ising.evaluate)

    def test_function(x):
        return -eval_jit(x)

    return prior, test_function
