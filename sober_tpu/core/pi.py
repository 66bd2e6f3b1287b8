"""pi — the probability measure over global-optimum locations.

Rebuild of SOBER/_pi.py. pi(x) = Phi((mu(x) - eta) / sigma(x)): a
likelihood-free-inference style probability of improvement over the
incumbent eta (the max posterior mean at the observed inputs).

PI_FBGP (hyperposterior-weighted mixture) and PI_BQ (warped-space threshold)
live with their model families (gp/fbgp.py, gp/warped.py) but are re-exported
here for parity with the reference layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gp.exact import GPState, predict, posterior_max_mean

EPS = float(jnp.finfo(jnp.float32).eps)


def lfi(state: GPState, eta: jax.Array, x_cand: jax.Array,
        log: bool = False) -> jax.Array:
    """Phi((mu - eta)/sigma) at x_cand (SOBER/_pi.py:20-38)."""
    mu, var = predict(state, x_cand)
    z = (mu - eta) / jnp.sqrt(var)
    val = jax.scipy.special.ndtr(z)
    if log:
        return jnp.log(val + EPS)
    return val


_lfi_jit = jax.jit(lfi, static_argnames=("log",))
_eta_jit = jax.jit(posterior_max_mean)


def lfi_apply(tree, x_cand):
    """lfi as a pure function of the (state, eta) tree — the pi
    stable-callable consumed by the fused pipelines
    (core/fused_sampling.py)."""
    state, eta = tree
    return lfi(state, eta, x_cand)


class PI:
    """pi for a standard GP surrogate (SOBER/_pi.py:5-56).

    eta is computed once at construction, like the reference's
    PI.__init__ (SOBER/_pi.py:17).
    """

    pi_apply = staticmethod(lfi_apply)

    def __init__(self, model: GPState, label: str = "lfi"):
        if label != "lfi":
            raise NotImplementedError(
                "Only the 'lfi' sampler is implemented (the reference's 'ts' "
                "branch raises NotImplementedError too, SOBER/_pi.py:51-52)")
        self.model = model
        self.label = label
        self.eta = _eta_jit(model)

    @property
    def pi_tree(self):
        return (self.model, self.eta)

    def __call__(self, x_cand: jax.Array, log: bool = False) -> jax.Array:
        return _lfi_jit(self.model, self.eta, x_cand, log=log)
