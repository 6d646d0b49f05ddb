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
    """Evolution-model parameters.

    mu: overall mutation rate [1/day/site-rate-unit]
    kappa, pi: HKY parameters
    q: derived 4x4 rate matrix of partition 0 (kept in sync with kappa/pi)
    alpha: site-rate-heterogeneity Gamma shape (nu_l ~ Gamma(alpha, alpha))
    nu: per-site relative rates, shape [L]
    part: per-site partition indices, shape [L] (all zero unless the mpox
          hack's 2-partition APOBEC model is active; reference run.h:134-178)
    q_tab: per-partition rate matrices, shape [P, 4, 4]; kernels resolve a
           site's matrix as q_tab[part[l]]
    mpox_rho: mu_star / mu (APOBEC rate ratio; 0 when the hack is off)
    """
    mu: jnp.ndarray
    kappa: jnp.ndarray
    pi: jnp.ndarray
    q: jnp.ndarray
    alpha: jnp.ndarray
    nu: jnp.ndarray
    part: jnp.ndarray
    q_tab: jnp.ndarray
    mpox_rho: jnp.ndarray

    @property
    def q_a(self):
        """Escape rates q_a(a) = -q[a,a] of partition 0, shape [4]."""
        return -jnp.diagonal(self.q)

    @property
    def qa_tab(self):
        """Per-partition escape rates, shape [P, 4]."""
        return -jnp.diagonal(self.q_tab, axis1=1, axis2=2)

    @property
    def num_partitions(self) -> int:
        return self.q_tab.shape[0]

    def with_hky(self, mu=None, kappa=None, pi=None) -> "EvoParams":
        mu = self.mu if mu is None else jnp.asarray(mu, jnp.float64)
        kappa = self.kappa if kappa is None else jnp.asarray(kappa, jnp.float64)
        pi = self.pi if pi is None else jnp.asarray(pi, jnp.float64)
        q = hky_q(kappa, pi)
        return self._replace(mu=mu, kappa=kappa, pi=pi, q=q, q_tab=q[None])

    def with_mpox_rho(self, mu=None, rho=None) -> "EvoParams":
        """Refresh the 2-partition APOBEC rate tables (reference derive_evo,
        run.cpp:400-433)."""
        mu = self.mu if mu is None else jnp.asarray(mu, jnp.float64)
        rho = self.mpox_rho if rho is None else jnp.asarray(rho, jnp.float64)
        return self._replace(mu=mu, mpox_rho=rho, q_tab=mpox_q_tab(rho))


def make_evo_params(num_sites: int, mu=1e-3 / 365.0, kappa=1.0,
                    pi=(0.25, 0.25, 0.25, 0.25), alpha=10.0, nu=None,
                    part=None) -> EvoParams:
    pi = jnp.asarray(pi, jnp.float64)
    nu = jnp.ones((num_sites,), jnp.float64) if nu is None else jnp.asarray(nu, jnp.float64)
    q = hky_q(kappa, pi)
    if part is None:
        part = jnp.zeros((num_sites,), jnp.int32)
    return EvoParams(
        mu=jnp.asarray(mu, jnp.float64),
        kappa=jnp.asarray(kappa, jnp.float64),
        pi=pi,
        q=q,
        alpha=jnp.asarray(alpha, jnp.float64),
        nu=nu,
        part=jnp.asarray(part, jnp.int32),
        q_tab=q[None],
        mpox_rho=jnp.float64(0.0),
    )


# ---------------------------------------------------------------------------
# Mpox hack: 2-partition JC + APOBEC model (reference run.h:134-178,
# run.cpp:359-433)
# ---------------------------------------------------------------------------

def jc_q():
    """Jukes-Cantor rate matrix (diag -1, off-diag 1/3) == hky_q(1, uniform)."""
    return hky_q(jnp.float64(1.0), jnp.full(4, 0.25, jnp.float64))


def mpox_q_tab(rho):
    """[Q_0, Q_1] with Q_0 = JC and Q_1 = Q_0 + APOBEC terms:
    C->T += 2 rho, G->A += 2 rho (diagonals balanced); rho = mu_star / mu.
    The factors of 2 follow the O'Toole et al convention (run.h:169-172)."""
    rho = jnp.asarray(rho, jnp.float64)
    q0 = jc_q()
    A, C, G, T = 0, 1, 2, 3
    apo = jnp.zeros((4, 4), jnp.float64)
    apo = apo.at[C, T].add(2.0).at[C, C].add(-2.0)
    apo = apo.at[G, A].add(2.0).at[G, G].add(-2.0)
    q1 = q0 + rho * apo
    return jnp.stack([q0, q1])


def apobec_context_partition(seq) -> jnp.ndarray:
    """Site partitions from APOBEC context in a reference tip sequence:
    partition 1 iff (seq[l-1]==T and seq[l] in {C,T}) or
    (seq[l+1]==A and seq[l] in {G,A}) (reference run.cpp:366-383)."""
    import numpy as np
    seq = np.asarray(seq)
    L = len(seq)
    A, C, G, T = 0, 1, 2, 3
    ctx = np.zeros(L, dtype=bool)
    ctx[1:] |= (seq[:-1] == T) & ((seq[1:] == C) | (seq[1:] == T))
    ctx[:-1] |= (seq[1:] == A) & ((seq[:-1] == G) | (seq[:-1] == A))
    return jnp.asarray(ctx.astype(np.int32))
