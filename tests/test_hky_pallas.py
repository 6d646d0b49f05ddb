"""Fused HKY chain (parallel/hky_pallas.py) vs the original move functions.

Pins the twin chain against a replay built directly on
mcmc/global_moves.hky_frequencies_move / hky_kappa_move's math
(reference run.cpp:953-1103) consuming the same uniform lanes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from delphy_tpu.evo import make_evo_params, hky_q
from delphy_tpu.parallel import hky_pallas as hp
from delphy_tpu.mcmc.global_moves import PriorConfig


def _setup(seed):
    rng = np.random.default_rng(seed)
    evo = make_evo_params(100, mu=1e-3, kappa=1.7,
                          pi=np.array([0.3, 0.2, 0.25, 0.25]), alpha=10.0)
    Ttwiddle_a = jnp.asarray(rng.uniform(1e4, 1e5, 4))
    M_ab = jnp.asarray(np.where(~np.eye(4, dtype=bool),
                                rng.integers(0, 200, (4, 4)), 0.0))
    root_freq = jnp.asarray(rng.integers(0, 40, 4).astype(np.float64))
    return evo, Ttwiddle_a, M_ab, root_freq


def _replay(u, evo, Ttwiddle_a, M_ab, root_freq, hyp, n_rounds):
    """Independent replay with numpy control flow on the same lanes."""
    kappa = float(evo.kappa)
    pi = np.asarray(evo.pi, np.float64).copy()
    q = np.asarray(hky_q(kappa, pi))
    tt = np.asarray(Ttwiddle_a)
    M = np.asarray(M_ab)
    rf = np.asarray(root_freq)
    mu = float(evo.mu)
    off = ~np.eye(4, dtype=bool)

    def delta_of(new_q, old_q):
        d = -mu * np.sum((-np.diag(new_q) + np.diag(old_q)) * tt)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(old_q > 0, new_q / np.where(old_q > 0, old_q, 1.0), 1.0)
        return d + np.sum(np.where(off & (M > 0), M * np.log(ratio), 0.0))

    for r in range(n_rounds):
        d = float(u[r, hp._U_D]) * 0.01
        ia = int(float(u[r, hp._U_IA]) * 4.0)
        ib = (ia + 1 + int(float(u[r, hp._U_IB]) * 3.0)) % 4
        new_pi = pi.copy()
        new_pi[ia] += d
        new_pi[ib] -= d
        ok = (0 < new_pi[ia] < 1) and (0 < new_pi[ib] < 1)
        if ok:
            new_q = np.asarray(hky_q(kappa, new_pi))
            delta = delta_of(new_q, q)
            delta += np.sum(np.where(rf > 0, rf * np.log(new_pi / pi), 0.0))
            if delta > 0 or np.log(max(float(u[r, hp._U_ACC_F]), 1e-30)) < delta:
                pi, q = new_pi, new_q
        scale = 0.75 + float(u[r, hp._U_SCALE]) * (1.0 / 0.75 - 0.75)
        new_kappa = kappa * scale
        new_q = np.asarray(hky_q(new_kappa, pi))
        m, s = hyp.kappa_prior_mean_log, hyp.kappa_prior_sigma_log
        lpr = ((-(np.log(new_kappa) - m) ** 2 + (np.log(kappa) - m) ** 2)
               / (2 * s * s)) + np.log(kappa / new_kappa)
        log_mh = delta_of(new_q, q) + lpr + np.log(kappa / new_kappa)
        if log_mh > 0 or np.log(max(float(u[r, hp._U_ACC_K]), 1e-30)) < log_mh:
            kappa, q = new_kappa, new_q
    return kappa, pi, q


@pytest.mark.parametrize("seed", [0, 4, 9])
def test_chain_twin_matches_replay(seed):
    evo, Ttwiddle_a, M_ab, root_freq = _setup(seed)
    hyp = PriorConfig()
    n_rounds = 10
    u = jax.random.uniform(jax.random.PRNGKey(seed), (n_rounds, 128),
                           jnp.float64)
    hypf = (float(hyp.kappa_prior_mean_log),
            float(hyp.kappa_prior_sigma_log), True, True)
    kappa_j, pi_j, q_j = hp.hky_chain_jnp(
        u, evo.mu, evo.kappa, evo.pi.reshape(1, 4),
        Ttwiddle_a.reshape(1, 4), M_ab, root_freq.reshape(1, 4), hypf,
        n_rounds)
    kappa_r, pi_r, q_r = _replay(np.asarray(u), evo, Ttwiddle_a, M_ab,
                                 root_freq, hyp, n_rounds)
    assert float(kappa_j) == pytest.approx(kappa_r, rel=1e-9)
    np.testing.assert_allclose(np.asarray(pi_j).ravel(), pi_r, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(q_j), q_r, rtol=1e-8, atol=1e-12)


def test_chain_runner_updates_evo():
    evo, Ttwiddle_a, M_ab, root_freq = _setup(2)
    out = hp.hky_chain(jax.random.PRNGKey(3), evo, Ttwiddle_a, M_ab,
                       root_freq, PriorConfig(), use_kernel=False)
    assert float(jnp.sum(out.pi)) == pytest.approx(1.0, abs=1e-9)
    assert out.q_tab.shape == (1, 4, 4)
    # q stays a proper rate matrix: rows sum to ~0
    np.testing.assert_allclose(np.asarray(jnp.sum(out.q, axis=1)), 0.0,
                               atol=1e-12)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
def test_chain_pallas_matches_twin():
    # Pinned in f32 mode: the production TPU configuration is
    # DELPHY_TPU_F32=1, and jax 0.9.0's Mosaic convert fallback recurses on
    # 64-bit-involved casts (see parallel/sweep.py:pallas_enabled), so the
    # kernels only lower with x64 off.
    with jax.enable_x64(False):
        _chain_pallas_matches_twin_body()


def _chain_pallas_matches_twin_body():
    evo, Ttwiddle_a, M_ab, root_freq = _setup(5)
    hyp = PriorConfig()
    u = jax.random.uniform(jax.random.PRNGKey(7), (10, 128), jnp.float32)
    hypf = (float(hyp.kappa_prior_mean_log),
            float(hyp.kappa_prior_sigma_log), True, True)
    args = (u, evo.mu.astype(jnp.float32), evo.kappa.astype(jnp.float32),
            evo.pi.astype(jnp.float32).reshape(1, 4),
            Ttwiddle_a.astype(jnp.float32).reshape(1, 4),
            M_ab.astype(jnp.float32), root_freq.astype(jnp.float32
                                                       ).reshape(1, 4),
            hypf, 10)
    kappa_k, pi_k, q_k = hp.hky_chain_pallas(*args)
    kappa_j, pi_j, q_j = hp.hky_chain_jnp(*args)
    assert float(kappa_k) == pytest.approx(float(kappa_j), rel=1e-4)
    np.testing.assert_allclose(np.asarray(pi_k), np.asarray(pi_j), rtol=1e-4)
