"""Coalescent grid prior tests: kernels vs brute-force oracles, delta rules vs
full recompute (reference strategy: tests/scalable_coalescent_tests.cpp)."""

import numpy as np

import jax.numpy as jnp

from delphy_tpu import pop
from delphy_tpu.ops import coalescent as coal
from delphy_tpu.phylo import build_random_tree

import oracles


def _random_tree(rng, T=10):
    L = 20
    ref = rng.integers(0, 4, size=L).astype(np.int8)
    deltas = [[] for _ in range(T)]
    miss = [[] for _ in range(T)]
    dates = [(float(rng.uniform(0, 50)),) * 2 for _ in range(T)]
    return build_random_tree(ref, deltas, miss, dates, rng=rng)


def test_k_bar_and_log_prior(rng):
    tree = _random_tree(rng)
    p = pop.ExpPopParams(t0=jnp.float64(50.0), n0=jnp.float64(30.0),
                         g=jnp.float64(0.02), min_pop=jnp.float64(1.0))
    t_lo, t_step, C = float(tree.t.min() - 5.0), 1.7, 64

    grid = coal.make_grid(p, jnp.asarray(tree.t), jnp.asarray(tree.children[:, 0] == -1),
                          t_lo, t_step, C)
    expect_k = oracles.coal_k_bar(tree, t_lo, t_step, C)
    np.testing.assert_allclose(np.asarray(grid.k_bar), expect_k, atol=1e-10)

    got = float(coal.calc_log_prior(grid, p, jnp.asarray(tree.t),
                                    jnp.asarray(tree.children[:, 0] == -1)))
    expect = oracles.coal_log_prior(
        tree, t_lo, t_step, C,
        lambda t: float(pop.exp_pop_at_time(p, t)),
        lambda a, b: float(pop.exp_pop_integral(p, a, b)))
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_displace_delta_matches_recompute(rng):
    tree = _random_tree(rng)
    is_tip = jnp.asarray(tree.children[:, 0] == -1)
    p = pop.ExpPopParams(t0=jnp.float64(50.0), n0=jnp.float64(100.0),
                         g=jnp.float64(0.0), min_pop=jnp.float64(0.0))
    t_lo, t_step, C = float(tree.t.min() - 20.0), 2.1, 64
    t = jnp.asarray(tree.t)
    grid = coal.make_grid(p, t, is_tip, t_lo, t_step, C)
    base = float(coal.calc_log_prior(grid, p, t, is_tip))

    # displace each node in turn; compare delta vs full recompute
    for node in range(tree.num_nodes):
        node_is_tip = bool(tree.is_tip(node))
        old_t = float(tree.t[node])
        new_t = old_t + float(rng.uniform(-8.0, 8.0))
        delta, new_k = coal.displace_delta(grid, p, old_t, new_t, jnp.bool_(node_is_tip))

        t2 = t.at[node].set(new_t)
        grid2 = coal.make_grid(p, t2, is_tip, t_lo, t_step, C)
        full = float(coal.calc_log_prior(grid2, p, t2, is_tip))
        np.testing.assert_allclose(float(delta), full - base, atol=1e-9,
                                   err_msg=f"node {node}")
        np.testing.assert_allclose(np.asarray(new_k), np.asarray(grid2.k_bar), atol=1e-9)


def test_grid_prior_converges_to_exact(rng):
    """The discretized grid prior approaches the exact Kingman prior as the
    cell size shrinks (reference cross-check strategy:
    tests/scalable_coalescent_tests.cpp)."""
    from delphy_tpu.ops.exact_coalescent import exact_coalescent_log_prior

    tree = _random_tree(rng)
    is_tip = tree.children[:, 0] == -1
    p = pop.ExpPopParams(t0=jnp.float64(50.0), n0=jnp.float64(80.0),
                         g=jnp.float64(0.01), min_pop=jnp.float64(1.0))
    exact = exact_coalescent_log_prior(tree.t, is_tip, p)

    t_lo = float(tree.t.min() - 3.0)
    span = float(tree.t.max() + 1.0 - t_lo)
    errs = []
    for C in (64, 256, 1024):
        grid = coal.make_grid(p, jnp.asarray(tree.t), jnp.asarray(is_tip),
                              t_lo, span / C, C)
        lp = float(coal.calc_log_prior(grid, p, jnp.asarray(tree.t),
                                       jnp.asarray(is_tip)))
        errs.append(abs(lp - exact))
    assert errs[2] < errs[0]
    assert errs[2] < 0.05 * max(abs(exact), 1.0)
