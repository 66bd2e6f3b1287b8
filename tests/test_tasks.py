"""Tests for the benchmark task zoo (discrete, drug, ECM, SVM)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sober_tpu.tasks import (
    setup_pest,
    setup_maxsat,
    setup_ising,
    setup_malaria,
    setup_solvent,
    setup_ecm_two,
    setup_svm,
    MaxSAT,
)
from sober_tpu.tasks.discrete import _DEFAULT_WCNF

KEY = jax.random.key(0)


class TestMaxSAT:
    def test_parse_wcnf(self):
        m = MaxSAT(_DEFAULT_WCNF)
        assert m.n_variables == 28
        assert m.idx.shape[0] > 100  # clauses

    def test_eval_batch_and_monotonic(self):
        prior, fn = setup_maxsat()
        x = prior.sample(KEY, 16)
        vals = np.asarray(fn(x))
        assert vals.shape == (16,)
        assert np.isfinite(vals).all()

    def test_assignments_discriminated(self):
        # note: max-cut instances are complement-symmetric, so all-ones and
        # all-zeros tie; random assignments must spread out
        prior, fn = setup_maxsat()
        x = prior.sample(KEY, 32)
        vals = np.asarray(fn(x))
        assert np.unique(vals.round(5)).size > 3


class TestIsing:
    def test_full_mask_is_optimal(self):
        """Keeping every edge reproduces the original model: KL ~ 0."""
        prior, fn = setup_ising()
        full = jnp.ones((1, 24))
        none = jnp.zeros((1, 24))
        v_full = float(fn(full)[0])
        v_none = float(fn(none)[0])
        assert abs(v_full) < 1e-2       # negated KL ~ 0
        assert v_none < v_full          # dropping all edges is worse

    def test_batch_eval(self):
        prior, fn = setup_ising()
        x = prior.sample(KEY, 8)
        assert np.asarray(fn(x)).shape == (8,)


class TestPest:
    def test_eval(self):
        prior, fn = setup_pest()
        x = prior.sample(KEY, 3)
        vals = np.asarray(fn(x))
        assert vals.shape == (3,)
        assert (vals < 0).all()  # negated cost, cost > 0


class TestDrugDatasets:
    def test_malaria_dataset(self):
        prior = setup_malaria()
        assert prior.features.shape[1] == 2048
        assert prior.n_available > 10000
        # consumable semantics
        idx = jnp.array([0, 1, 2])
        y = prior.query(idx)
        assert y.shape == (3,)
        assert prior.n_available == prior.n_total - 3

    def test_solvent_dataset(self):
        prior = setup_solvent()
        assert prior.features.shape[1] == 2048
        assert prior.n_available > 100000  # 133k molecules

    def test_tanimoto_gp_on_malaria(self):
        from sober_tpu.gp import fit_tanimoto_gp, predict_raw

        # the GP-sanity check needs real fingerprints, not the full pool
        prior = setup_malaria(n_pool=4096)
        x, y = prior.sample(KEY, 64)
        gp = fit_tanimoto_gp(x, y)
        mu, var = predict_raw(gp, x[:8])
        assert np.isfinite(np.asarray(mu)).all()
        assert (np.asarray(var) > 0).all()


class TestECM:
    def test_truth_has_high_objective(self):
        prior, fn = setup_ecm_two()
        theta_true = jnp.array([[2.0, -0.5, -1.0, 0.0, 0.5]])
        theta_off = jnp.array([[1.2, 1.5, 1.5, -1.5, -1.5]])
        d_true, ll_true = fn(theta_true)
        d_off, ll_off = fn(theta_off)
        assert float(d_true[0]) > float(d_off[0])
        assert float(ll_true[0]) > float(ll_off[0])

    def test_prior_in_bounds(self):
        prior, _ = setup_ecm_two()
        x = np.asarray(prior.sample(KEY, 500))
        assert (x >= np.array([1, -2, -2, -2, -2]) - 1e-5).all()
        assert (x <= np.array([3, 2, 2, 2, 2]) + 1e-5).all()


class TestSVM:
    def test_eval_with_synthetic_data(self):
        prior, fn = setup_svm()
        x = prior.sample(KEY, 2)
        vals = np.asarray(fn(x))
        assert vals.shape == (2,)
        assert (vals <= 0).all()  # negated RMSE

    def test_empty_feature_mask(self):
        prior, fn = setup_svm()
        x = np.zeros((1, 23), np.float32)
        x[0, -3:] = 0.5  # binary-first layout: last 3 are continuous
        val = float(fn(jnp.asarray(x))[0])
        assert np.isfinite(val)
