"""Skygrid coalescent-model MCMC tests: tau Gibbs, zero-mode Gibbs,
mass-preconditioned HMC (reference run.cpp:1321-2180), end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delphy_tpu import pop as popm
from delphy_tpu.ops import coalescent as coal
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.run import Run
from delphy_tpu.mcmc import global_moves as gm
from delphy_tpu.mcmc.global_moves import PriorConfig


def make_skygrid_run(seed=31, T=10, L=120, **kw):
    ref, deltas, miss, dates, names, _ = simulate_dataset(T, L, mu=2e-4, seed=seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(seed))
    return Run(tree, seed=seed, num_cells=128, local_moves_per_global_move=300,
               pop_model="skygrid", skygrid_num_parameters=8, **kw)


def test_skygrid_run_end_to_end():
    run = make_skygrid_run()
    for _ in range(3):
        run.do_mcmc_steps(300)
        run.check_derived_quantities(tol=1e-6)
    g = np.asarray(run.pop.gamma)
    assert np.all(np.isfinite(g))
    assert float(run.pop.tau) > 0
    # the flat log(1000) init must have moved
    assert not np.allclose(g, np.log(1000.0))


def test_skygrid_log_linear_run():
    run = make_skygrid_run(seed=37, skygrid_type=popm.LOG_LINEAR)
    run.do_mcmc_steps(600)
    run.check_derived_quantities(tol=1e-6)
    assert np.all(np.isfinite(np.asarray(run.pop.gamma)))


def test_skygrid_determinism():
    run_a = make_skygrid_run(seed=41)
    run_b = make_skygrid_run(seed=41)
    run_a.do_mcmc_steps(600)
    run_b.do_mcmc_steps(600)
    assert run_a.log_posterior == run_b.log_posterior
    np.testing.assert_array_equal(np.asarray(run_a.pop.gamma),
                                  np.asarray(run_b.pop.gamma))


def test_hmc_autodiff_force_matches_numeric():
    """Forces used by the HMC are -grad U; spot-check against finite
    differences (mirrors the debug_hmc check in run.cpp:1905-1930)."""
    x = jnp.array([0.0, 10.0, 20.0, 30.0])
    gamma = jnp.array([2.0, 2.5, 1.5, 3.0])
    p = popm.SkygridPopParams(x=x, gamma=gamma, type=popm.STAIRCASE,
                              tau=jnp.float64(1.3))
    hyp = PriorConfig()
    t = jnp.array([5.0, 12.0, 22.0, 28.0, 31.0, -3.0, 15.0])
    is_tip = jnp.array([True, True, True, False, True, False, False])
    grid = coal.make_grid(p, t, is_tip, -10.0, 1.0, 48)

    def U(g):
        q = p._replace(gamma=g)
        lbs = grid.cell_lbounds()
        nbar = jax.vmap(lambda a: popm.skygrid_pop_integral(q, a, a + grid.t_step))(lbs) / grid.t_step
        nbar = jnp.maximum(nbar, 1e-100)
        out = jnp.sum(grid.t_step * grid.k_bar * (grid.k_bar - 1.0) / (2.0 * nbar))
        logN = popm.skygrid_log_N(q, t)
        out += jnp.sum(jnp.where(is_tip, 0.0, logN))
        dg = g[1:] - g[:-1]
        out += 0.5 * p.tau * jnp.sum(dg ** 2)
        excess = jnp.maximum(hyp.skygrid_low_gamma_barrier_loc - g, 0.0)
        out += jnp.sum((excess / hyp.skygrid_low_gamma_barrier_scale) ** 2)
        return out

    grad = np.asarray(jax.grad(U)(gamma))
    eps = 1e-6
    for k in range(4):
        gp = gamma.at[k].add(eps)
        gm_ = gamma.at[k].add(-eps)
        num = (float(U(gp)) - float(U(gm_))) / (2 * eps)
        np.testing.assert_allclose(grad[k], num, rtol=1e-5, atol=1e-8)
