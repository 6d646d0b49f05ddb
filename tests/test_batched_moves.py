"""Exactness tests for the batched kernels: after a sweep, the incrementally
maintained log_G AND log_coal and the k_bar staircase must match full
recomputes against the same grid — this validates the cell-block coloring's
disjointness logic end to end."""

import numpy as np

import jax
import jax.numpy as jnp

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.state import pack_state
from delphy_tpu.evo import make_evo_params
from delphy_tpu import pop as popm
from delphy_tpu.ops import coalescent as coal
from delphy_tpu.ops import likelihood as lk
from delphy_tpu.mcmc import global_moves as gm
from delphy_tpu.mcmc.global_moves import PriorConfig
from delphy_tpu.mcmc.kernel import run_local_sweep
from delphy_tpu.mcmc.moves import Ledger


def test_sweep_ledger_and_kbar_exact():
    ref, deltas, miss, dates, names, _ = simulate_dataset(14, 150, mu=2e-4, seed=91)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(91))
    ts = pack_state(tree)
    evo = make_evo_params(tree.num_sites, mu=2e-4, kappa=2.0)
    pop = popm.ExpPopParams(t0=jnp.float64(200.0), n0=jnp.float64(500.0),
                            g=jnp.float64(0.0), min_pop=jnp.float64(1.0))
    hyp = PriorConfig()
    t_max_tip = float(np.max(tree.t_max[:tree.num_tips]))
    C = 128

    caches = gm.compute_caches(ts, evo)
    t_root = float(ts.t[ts.root])
    span = max(t_max_tip - t_root, 1.0)
    t_lo = t_root - 0.35 * span - 1.0
    t_step = (t_max_tip - t_lo) / C
    grid = coal.make_grid(pop, ts.t, ts.is_tip, t_lo, t_step, C)
    log_G0 = lk.calc_log_G(ts, evo, caches.lambda_i, caches.root_freq)
    log_coal0 = coal.calc_log_prior(grid, pop, ts.t, ts.is_tip)
    ledger = Ledger(log_G=log_G0, log_coal=log_coal0, log_other=jnp.float64(0.0))

    key = jax.random.PRNGKey(7)
    ts2, grid2, ledger2, key, count = jax.jit(
        run_local_sweep, static_argnames=())(
        ts, caches, grid, ledger, evo, pop, key, 2000, t_max_tip)

    assert int(count) > 500, "batched sweep attempted too few moves"
    # times moved
    assert not np.allclose(np.asarray(ts2.t), np.asarray(ts.t))

    # log_G invariant vs full recompute
    caches2 = gm.compute_caches(ts2, evo)
    log_G_re = float(lk.calc_log_G(ts2, evo, caches2.lambda_i, caches2.root_freq))
    assert abs(float(ledger2.log_G) - log_G_re) < 1e-6

    # k_bar and log_coal invariants vs full recompute on the SAME grid spec
    k_bar_re = coal.calc_k_bar(ts2.t, ts2.is_tip, grid.t_lo, grid.t_step, C)
    np.testing.assert_allclose(np.asarray(grid2.k_bar), np.asarray(k_bar_re),
                               atol=1e-8)
    log_coal_re = float(coal.calc_log_prior(
        grid2._replace(k_bar=k_bar_re), pop, ts2.t, ts2.is_tip))
    assert abs(float(ledger2.log_coal) - log_coal_re) < 1e-6

    # mutation-time bounds still respected (branch_reform + displacement bounds)
    tree2_parent = np.asarray(ts2.parent)
    mut_node = np.asarray(ts2.mut_node)
    mut_t = np.asarray(ts2.mut_t)
    t_arr = np.asarray(ts2.t)
    for j in np.nonzero((mut_node >= 0) & (mut_node != int(ts2.root)))[0]:
        n = mut_node[j]
        assert t_arr[tree2_parent[n]] < mut_t[j] <= t_arr[n] + 1e-12
