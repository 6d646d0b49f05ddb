"""Fused exp-pop chain (parallel/pop_pallas.py) vs the original formulation.

Pins (a) the row-form coalescent log prior against the vmap/exp_pop_integral
formulation of mcmc/global_moves.exp_pop_moves, over all min_pop/g regimes,
and (b) the full 50-round chain against an independent numpy replay of the
reference's move sequence (run.cpp:1237-1319) consuming the same uniforms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from delphy_tpu import pop as popm
from delphy_tpu.ops import coalescent as coal
from delphy_tpu.parallel import pop_pallas as pp
from delphy_tpu.mcmc.global_moves import PriorConfig


def _make_grid(rng, C=96, N=40):
    t = np.sort(rng.uniform(-300.0, 0.0, N))
    is_tip = np.zeros(N, bool)
    is_tip[rng.permutation(N)[: N // 2 + 1]] = True
    t_lo, t_step = -400.0, 5.0
    p = popm.ExpPopParams(t0=jnp.float64(0.0), n0=jnp.float64(500.0),
                          g=jnp.float64(0.002), min_pop=jnp.float64(1.0))
    grid = coal.make_grid(p, jnp.asarray(t), jnp.asarray(is_tip),
                          jnp.float64(t_lo), jnp.float64(t_step), C)
    return grid, jnp.asarray(t), jnp.asarray(is_tip), p


def _lp_original(p, grid, t, is_tip):
    """The exp_pop_moves coal_log_prior_for formulation (global_moves.py)."""
    lbs = grid.cell_lbounds()
    nbar = jax.vmap(lambda a: popm.exp_pop_integral(p, a, a + grid.t_step))(
        lbs) / grid.t_step
    nbar = jnp.maximum(nbar, 1e-100)
    quad = -jnp.sum(grid.t_step * grid.k_bar * (grid.k_bar - 1.0)
                    / (2.0 * nbar))
    logN = jnp.log(popm.exp_pop_at_time(p, t))
    return float(quad - jnp.sum(jnp.where(is_tip, 0.0, logN)))


@pytest.mark.parametrize("n0,g,mp", [
    (500.0, 0.002, 1.0),     # floor crosses inside the grid (g > 0)
    (500.0, -0.003, 1.0),    # g < 0 crossing
    (500.0, 0.0, 1.0),       # g == 0 with floor
    (500.0, 0.004, 0.0),     # no floor
    (0.5, 0.01, 1.0),        # floor binds over most of the grid
    (2000.0, 0.0, 0.0),      # g == 0, no floor
])
def test_lp_rows_matches_original(n0, g, mp):
    rng = np.random.default_rng(7)
    grid, t, is_tip, p0 = _make_grid(rng)
    p = p0._replace(n0=jnp.float64(n0), g=jnp.float64(g),
                    min_pop=jnp.float64(mp))
    lbs, k2, t_row, inner = pp.pack_rows(grid, t, is_tip, jnp.float64)
    got = float(pp._lp_rows(lbs, k2, t_row, inner, grid.t_step, p.t0,
                            p.min_pop, p.n0, p.g))
    want = _lp_original(p, grid, t, is_tip)
    assert got == pytest.approx(want, rel=1e-8, abs=1e-8)


def _replay_chain(u, p, grid, t, is_tip, hyp, n_rounds):
    """Independent numpy replay of the reference move sequence
    (run.cpp:1237-1319) on the same uniform lanes."""
    n0, g = float(p.n0), float(p.g)

    def lp(n0_, g_):
        q = p._replace(n0=jnp.float64(n0_), g=jnp.float64(g_))
        return _lp_original(q, grid, t, is_tip)

    cur = lp(n0, g)
    for r in range(n_rounds):
        scale = 0.75 + float(u[r, 0]) * (1.0 / 0.75 - 0.75)
        new_n0 = n0 * scale
        lpr = (-(hyp.pop_inv_n0_prior_alpha + 1.0) * np.log(scale)
               - hyp.pop_inv_n0_prior_beta * (1.0 / new_n0 - 1.0 / n0))
        new_lp = lp(new_n0, g)
        log_mh = (new_lp - cur) + lpr - np.log(scale)
        if log_mh > 0 or np.log(max(float(u[r, 1]), 1e-30)) < log_mh:
            n0, cur = new_n0, new_lp
        delta = (2.0 * float(u[r, 2]) - 1.0) / 365.0
        new_g = g + delta
        ok = hyp.pop_g_min <= new_g <= hyp.pop_g_max
        lpr = (abs(g - hyp.pop_g_prior_mu)
               - abs(new_g - hyp.pop_g_prior_mu)) / hyp.pop_g_prior_scale
        new_lp = lp(n0, new_g)
        log_mh = (new_lp - cur) + lpr
        if ok and (log_mh > 0
                   or np.log(max(float(u[r, 3]), 1e-30)) < log_mh):
            g, cur = new_g, new_lp
    return n0, g


@pytest.mark.parametrize("seed", [0, 3])
def test_chain_twin_matches_replay(seed):
    rng = np.random.default_rng(seed)
    grid, t, is_tip, p = _make_grid(rng)
    hyp = PriorConfig()
    key = jax.random.PRNGKey(seed)
    n_rounds = 50
    u = jax.random.uniform(key, (n_rounds, 128), jnp.float64)

    lbs, k2, t_row, inner = pp.pack_rows(grid, t, is_tip, jnp.float64)
    n0_j, g_j = pp.exp_pop_chain_jnp(
        u, lbs, k2, t_row, inner, grid.t_step, p.t0, p.min_pop,
        p.n0, p.g, pp._hyp_floats(hyp), n_rounds)
    n0_r, g_r = _replay_chain(np.asarray(u), p, grid, t, is_tip, hyp,
                              n_rounds)
    assert float(n0_j) == pytest.approx(n0_r, rel=1e-7)
    assert float(g_j) == pytest.approx(g_r, rel=1e-7, abs=1e-12)


def test_chain_runner_updates_params():
    rng = np.random.default_rng(1)
    grid, t, is_tip, p = _make_grid(rng)
    out = pp.exp_pop_chain(jax.random.PRNGKey(2), p, grid, t, is_tip,
                           PriorConfig(), use_kernel=False)
    assert float(out.n0) > 0.0
    assert PriorConfig().pop_g_min <= float(out.g) <= PriorConfig().pop_g_max
    # 50 rounds should move n0 (the 1/x prior + coalescent data both pull)
    assert float(out.n0) != pytest.approx(float(p.n0))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas TPU kernel needs a TPU backend")
def test_chain_pallas_matches_twin():
    # f32 mode only: see tests/test_hky_pallas.py (Mosaic 64-bit convert
    # fallback recursion) — production TPU runs are DELPHY_TPU_F32=1.
    with jax.enable_x64(False):
        _chain_pallas_matches_twin_body()


def _chain_pallas_matches_twin_body():
    rng = np.random.default_rng(5)
    grid, t, is_tip, p = _make_grid(rng)
    hyp = PriorConfig()
    u = jax.random.uniform(jax.random.PRNGKey(9), (50, 128), jnp.float32)
    lbs, k2, t_row, inner = pp.pack_rows(grid, t, is_tip, jnp.float32)
    args = (u, lbs, k2, t_row, inner, grid.t_step.astype(jnp.float32),
            p.t0.astype(jnp.float32), p.min_pop.astype(jnp.float32),
            p.n0.astype(jnp.float32), p.g.astype(jnp.float32),
            pp._hyp_floats(hyp), 50)
    n0_k, g_k = pp.exp_pop_chain_pallas(*args)
    n0_j, g_j = pp.exp_pop_chain_jnp(*args)
    assert float(n0_k) == pytest.approx(float(n0_j), rel=1e-4)
    assert float(g_k) == pytest.approx(float(g_j), rel=1e-4, abs=1e-9)
