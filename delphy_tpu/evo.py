"""Substitution models (HKY85) and the global evolution model parameters.

Reference semantics: core/evo_model.h (Site_evo_model / Global_evo_model) and
core/evo_hky.cpp (HKY Q-matrix derivation).  Here the model is a flat pytree of
device arrays; the single-partition case keeps B = 1.

Conventions (matching the reference):
  q_ab[a,b] (a != b) is the a->b transition rate, rows sum to zero;
  q_a(a) = -q_ab[a,a] is the escape rate from state a;
  rates are normalized so that sum_a pi_a q_a(a) == mu's units are per-site
  expected substitutions (R normalization in evo_hky.cpp:18-28).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def hky_q(kappa, pi):
    """HKY85 rate matrix normalized as in the reference (core/evo_hky.cpp:7-50).

    r[a,b] = kappa for transitions (A<->G, C<->T), 1 for transversions.
    q[a,b] = r[a,b] * pi[b] / R,  R = pi^T r pi;  diagonal = -row sum.
    """
    pi = jnp.asarray(pi, dtype=jnp.float64)
    kappa = jnp.asarray(kappa, dtype=jnp.float64)
    one = jnp.ones((), dtype=jnp.float64)
    r = jnp.array([[0.0, 1.0, 0.0, 1.0],
                   [1.0, 0.0, 1.0, 0.0],
                   [0.0, 1.0, 0.0, 1.0],
                   [1.0, 0.0, 1.0, 0.0]], dtype=jnp.float64)
    r = r + kappa * jnp.array([[0.0, 0.0, 1.0, 0.0],
                               [0.0, 0.0, 0.0, 1.0],
                               [1.0, 0.0, 0.0, 0.0],
                               [0.0, 1.0, 0.0, 0.0]], dtype=jnp.float64)
    del one
    R = pi @ r @ pi
    q = r * pi[None, :] / R
    q = q - jnp.diag(jnp.sum(q, axis=1))
    return q


class EvoParams(NamedTuple):
    """Evolution-model parameters (single HKY partition for now).

    mu: overall mutation rate [1/day/site-rate-unit]
    kappa, pi: HKY parameters
    q: derived 4x4 rate matrix (kept in sync with kappa/pi)
    alpha: site-rate-heterogeneity Gamma shape (nu_l ~ Gamma(alpha, alpha))
    nu: per-site relative rates, shape [L]
    """
    mu: jnp.ndarray
    kappa: jnp.ndarray
    pi: jnp.ndarray
    q: jnp.ndarray
    alpha: jnp.ndarray
    nu: jnp.ndarray

    @property
    def q_a(self):
        """Escape rates q_a(a) = -q[a,a], shape [4]."""
        return -jnp.diagonal(self.q)

    def with_hky(self, mu=None, kappa=None, pi=None) -> "EvoParams":
        mu = self.mu if mu is None else jnp.asarray(mu, jnp.float64)
        kappa = self.kappa if kappa is None else jnp.asarray(kappa, jnp.float64)
        pi = self.pi if pi is None else jnp.asarray(pi, jnp.float64)
        return self._replace(mu=mu, kappa=kappa, pi=pi, q=hky_q(kappa, pi))


def make_evo_params(num_sites: int, mu=1e-3 / 365.0, kappa=1.0,
                    pi=(0.25, 0.25, 0.25, 0.25), alpha=10.0, nu=None) -> EvoParams:
    pi = jnp.asarray(pi, jnp.float64)
    nu = jnp.ones((num_sites,), jnp.float64) if nu is None else jnp.asarray(nu, jnp.float64)
    return EvoParams(
        mu=jnp.asarray(mu, jnp.float64),
        kappa=jnp.asarray(kappa, jnp.float64),
        pi=pi,
        q=hky_q(kappa, pi),
        alpha=jnp.asarray(alpha, jnp.float64),
        nu=nu,
    )
