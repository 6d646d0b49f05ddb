"""Statistical tests of the MCMC samplers, mirroring the reference's
tests/distributions_tests.cpp: bounds + distribution-shape checks for the
bounded-exponential node-time proposal and the K-truncated Poisson used by
the mutational-history sampler; plus a Wilson-Balding move test (the
reference implements but does not enable it, subrun.cpp:450-490 — here it is
pinned by a ledger-delta invariant so it does not rot)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from delphy_tpu.mcmc.moves import bounded_exp_sample
from delphy_tpu.topo.history import sample_k_truncated_poisson

import oracles


# ---------------------------------------------------------------------------
# Bounded exponential (distributions.h:38-68)
# ---------------------------------------------------------------------------

def _bexp_samples(lam, a, b, n, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    f = jax.jit(jax.vmap(lambda k: bounded_exp_sample(
        k, jnp.float64(lam), jnp.float64(a), jnp.float64(b))))
    return np.asarray(f(keys))


@pytest.mark.parametrize("lam,a,b", [
    (2.3, 2.0, 5.0), (-2.3, 2.0, 5.0), (0.0, -1.0, 3.0),
    (40.0, 0.0, 1.0), (-0.01, -100.0, 100.0),
])
def test_bounded_exp_within_bounds_and_mean(lam, a, b):
    """Samples lie in [a,b] and their mean matches the analytic mean of
    p(x) ∝ e^{lam x} on [a,b] within 5 sigma."""
    n = 40_000
    xs = _bexp_samples(lam, a, b, n)
    assert np.all(xs >= a) and np.all(xs <= b)

    if lam == 0.0:
        mean = (a + b) / 2.0
        var = (b - a) ** 2 / 12.0
    else:
        # E[x] = (b e^{lam b} - a e^{lam a})/(e^{lam b} - e^{lam a}) - 1/lam
        # computed in a shifted frame (x-a) for numerical stability
        w = lam * (b - a)
        ew = math.expm1(w)
        mean = a + ((b - a) * (ew + 1.0)) / ew - 1.0 / lam
        var = np.var(xs)  # empirical variance is fine for the z-test scale
    z = abs(xs.mean() - mean) / math.sqrt(max(var, 1e-30) / n)
    assert z < 5.0, (xs.mean(), mean, z)


def test_bounded_exp_quantiles():
    """Empirical CDF matches the analytic inverse CDF at the quartiles
    (a sharper shape check than the mean)."""
    lam, a, b = 1.7, -1.0, 2.0
    xs = _bexp_samples(lam, a, b, 40_000, seed=3)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        x_q = a + math.log1p(q * math.expm1(lam * (b - a))) / lam
        emp = np.mean(xs <= x_q)
        # binomial stddev
        sd = math.sqrt(q * (1 - q) / len(xs))
        assert abs(emp - q) < 5 * sd, (q, emp)


def test_bounded_exp_semi_infinite():
    """Unbounded-on-one-side usage as in the reference test: lam>0 with
    a=-inf gives b - Expo(lam); lam<0 with b=+inf gives a + Expo(-lam).
    The engine calls it with finite substitutes; check the tail behavior via
    large windows."""
    lam = 2.3
    xs = _bexp_samples(lam, -1e6, 5.0, 20_000, seed=5)
    assert np.all(xs <= 5.0)
    # distance below b is Expo(lam): mean 1/lam
    d = 5.0 - xs
    assert abs(d.mean() - 1 / lam) < 5 * d.std() / math.sqrt(len(d))

    xs = _bexp_samples(-lam, 3.0, 1e6, 20_000, seed=6)
    assert np.all(xs >= 3.0)
    d = xs - 3.0
    assert abs(d.mean() - 1 / lam) < 5 * d.std() / math.sqrt(len(d))


# ---------------------------------------------------------------------------
# K-truncated Poisson (distributions.h:77-165)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lam", [0.01, 0.1, 1.0, 10.0])
@pytest.mark.parametrize("min_k", [0, 1, 2, 5, 20])
def test_k_truncated_poisson_ratio(lam, min_k):
    """The reference's ratio test (distributions_tests.cpp:29-67): over
    100k samples, count(K)/count(K+1) ≈ (K+1)/lam within 3-sigma counting
    noise, K = max(min_k, floor(lam)); every sample >= min_k."""
    rng = np.random.default_rng(12345)
    K = max(min_k, int(math.floor(lam)))
    n = 100_000
    count_K = count_K1 = 0
    for _ in range(n):
        k = sample_k_truncated_poisson(rng, lam, min_k)
        assert k >= min_k
        if k == K:
            count_K += 1
        elif k == K + 1:
            count_K1 += 1
    assert count_K >= 10 and count_K1 >= 10
    expected = (K + 1) / lam
    lo = (count_K - 3 * math.sqrt(count_K)) / (count_K1 + 3 * math.sqrt(count_K1))
    hi = (count_K + 3 * math.sqrt(count_K)) / (count_K1 - 3 * math.sqrt(count_K1))
    assert lo < expected < hi, (lo, expected, hi)


# ---------------------------------------------------------------------------
# Wilson-Balding (subrun.cpp:450-490; disabled by default, like the ref)
# ---------------------------------------------------------------------------

def test_wilson_balding_ledger_and_integrity():
    """Run many Wilson-Balding proposals on a small tree: the tree stays
    consistent and the mixer's accumulated delta_log_G matches the oracle
    log_G difference exactly (the incremental-vs-recompute discipline)."""
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.phylo import build_random_tree
    from delphy_tpu.evo import make_evo_params
    from delphy_tpu.topo.graft import SprContext
    from delphy_tpu.topo.mixer import TopologyMixer, HostCoalGrid, HostExpPop

    T, L = 12, 80
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=4e-3, missing_fraction=0.1, seed=21)
    rng = np.random.default_rng(77)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    evo = make_evo_params(L, mu=4e-3, kappa=2.0, pi=(0.28, 0.22, 0.26, 0.24),
                          nu=rng.gamma(8.0, 1 / 8.0, size=L))

    mixer = TopologyMixer(tree, rng, num_cells=64)
    ctx = SprContext(tree, float(evo.mu), np.asarray(evo.nu),
                     np.asarray(evo.q), np.asarray(evo.pi))
    pop = HostExpPop(float(np.max(tree.t)), 500.0, 0.0, 1.0)
    grid = HostCoalGrid(tree, pop, 64, float(np.max(tree.t)))
    mixer.t_max_tip = float(np.max(tree.t))

    lg0 = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                        np.asarray(evo.q), np.asarray(evo.pi))
    for _ in range(400):
        mixer._wilson_balding(ctx, grid)
    tree.check_integrity()
    lg1 = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                        np.asarray(evo.q), np.asarray(evo.pi))
    np.testing.assert_allclose(lg1 - lg0, mixer.delta_log_G,
                               rtol=1e-9, atol=1e-9)
    assert mixer.n_accepted > 0, "WB should accept at least one move in 400"


def test_native_incomplete_gamma_vs_scipy():
    """The native kernel's gamma_Q / gamma_Qinv against scipy (the
    reference's safe_gamma_math discipline, tests/safe_gamma_math_tests.cpp:
    double-only policies, round-trip inversion)."""
    import pytest
    from delphy_tpu.native import (native_available, native_gamma_q,
                                   native_gamma_q_inv)
    if not native_available():
        pytest.skip("no native toolchain")
    from scipy.special import gammaincc, gammainccinv

    rng = np.random.default_rng(11)
    for _ in range(200):
        a = float(10.0 ** rng.uniform(-2, 2))
        x = float(10.0 ** rng.uniform(-3, 2.5))
        want = float(gammaincc(a, x))
        got = native_gamma_q(a, x)
        assert abs(got - want) < 1e-9 + 1e-9 * abs(want), (a, x, got, want)
        # inverse: judged by the forward round-trip (in deep tails Q is
        # nearly flat in x, so x-space agreement with scipy is ill-posed)
        q = float(np.clip(want, 1e-12, 1 - 1e-12))
        x_back = native_gamma_q_inv(a, q)
        q_back = native_gamma_q(a, x_back)
        assert abs(q_back - q) <= 1e-8 + 1e-8 * q, (a, q, x_back, q_back)
        # and in the bulk it matches scipy's inverse directly
        if 1e-6 < q < 1 - 1e-6:
            want_back = float(gammainccinv(a, q))
            assert abs(x_back - want_back) <= 1e-6 * max(1.0, abs(want_back)), \
                (a, q, x_back, want_back)


def test_jit_history_matches_host():
    """The jitted constrained-history sampler (ops/history.py) must produce
    the same (event count, path, time) distribution as the host sampler
    (topo/history.py; reference spr_move.cpp:1164-1370)."""
    import jax
    import jax.numpy as jnp
    from delphy_tpu.ops import history as jh
    from delphy_tpu.topo.history import sample_mutational_history

    T_dur, mu = 0.8, 1.3          # mu*T ~ 1: nontrivial k distribution
    frm, to = 0, 2
    B = 30_000

    # device samples
    key = jax.random.PRNGKey(3)
    ks, states, times = jh.sample_constrained_histories(
        key, jnp.zeros(B, jnp.int32) + frm, jnp.zeros(B, jnp.int32) + to,
        jnp.float64(T_dur), jnp.float64(mu))
    ks = np.asarray(ks)
    states = np.asarray(states)
    times = np.asarray(times)

    # host samples (single-site deltas)
    rng = np.random.default_rng(11)
    host_ks, host_first, host_t1 = [], [], []
    for _ in range(B // 3):
        muts = sample_mutational_history(rng, 1, T_dur, mu, {0: (frm, to)})
        host_ks.append(len(muts))
        host_first.append(muts[0].to)
        host_t1.append(muts[0].t)

    # event-count distribution agreement (chi-square-ish: max abs freq diff)
    for k in (1, 2, 3, 4):
        f_dev = float(np.mean(ks == k))
        f_host = float(np.mean(np.asarray(host_ks) == k))
        assert abs(f_dev - f_host) < 0.02, (k, f_dev, f_host)
    # first-jump state distribution
    for s in range(4):
        f_dev = float(np.mean(states[:, 0] == s))
        f_host = float(np.mean(np.asarray(host_first) == s))
        assert abs(f_dev - f_host) < 0.02, (s, f_dev, f_host)
    # first event time distribution: mean and spread (order statistics of
    # uniforms given k, marginalized over the same k distribution)
    assert abs(times[:, 0].mean() - np.mean(host_t1)) < 0.02
    assert abs(times[:, 0].std() - np.std(host_t1)) < 0.02
    # endpoint constraint holds everywhere
    last = states[np.arange(B), ks - 1]
    assert (last == to).all()
    # k >= 1 (min_k) and times sorted within the mask
    assert (ks >= 1).all()
    for i in range(0, B, 2500):
        tt = times[i, :ks[i]]
        assert (np.diff(tt) >= 0).all() and (tt <= 0).all() and (tt >= -T_dur).all()


def test_jit_roundtrip_mask_rate_matches_host_skip():
    """The per-site Bernoulli round-trip mask has the same hit rate as the
    host's geometric skip (they sample the same product measure)."""
    import jax
    import jax.numpy as jnp
    from delphy_tpu.ops import history as jh
    from delphy_tpu.topo.history import sample_mutational_history

    T_dur, mu, L = 0.9, 0.8, 400
    key = jax.random.PRNGKey(5)
    hits = []
    for i in range(60):
        m = jh.sample_roundtrip_mask(jax.random.fold_in(key, i),
                                     L, jnp.float64(T_dur), jnp.float64(mu))
        hits.append(float(np.mean(np.asarray(m))))
    dev_rate = float(np.mean(hits))

    rng = np.random.default_rng(17)
    host_hits = 0
    reps = 300
    for _ in range(reps):
        muts = sample_mutational_history(rng, L, T_dur, mu, {})
        host_hits += len({m.site for m in muts})
    host_rate = host_hits / (reps * L)
    # the host's skip samples candidate sites at the tricky rate and then
    # ACCEPTS only round trips ending at the start state; the device mask is
    # the candidate rate, so host_rate <= dev_rate, within the acceptance
    # fraction for k>=2 paths returning to start (~1/3 for small mu*T)
    assert 0.15 * dev_rate < host_rate <= dev_rate * 1.05, \
        (dev_rate, host_rate)


def test_jit_unconstrained_history_matches_host():
    """Backward-Gillespie unconstrained history: event-count distribution,
    per-site chain consistency (each site's forward chain ends at A), and
    time ordering vs the host sampler."""
    import jax
    import jax.numpy as jnp
    from delphy_tpu.ops import history as jh
    from delphy_tpu.topo.history import sample_unconstrained_mutational_history

    L, T_dur, mu = 25, 0.7, 0.15   # mu*L*T ~ 2.6 events on average
    B = 8000
    key = jax.random.PRNGKey(7)
    ks, sites, frm, to, times = jax.vmap(
        lambda kk: jh.sample_unconstrained_history(
            kk, L, jnp.float64(T_dur), jnp.float64(mu)))(
        jax.random.split(key, B))
    ks = np.asarray(ks); sites = np.asarray(sites)
    frm = np.asarray(frm); to = np.asarray(to); times = np.asarray(times)

    rng = np.random.default_rng(4)
    host_ks = [len(sample_unconstrained_mutational_history(rng, L, T_dur, mu))
               for _ in range(4000)]
    for kk in range(6):
        f_dev = float(np.mean(ks == kk))
        f_host = float(np.mean(np.asarray(host_ks) == kk))
        assert abs(f_dev - f_host) < 0.03, (kk, f_dev, f_host)

    # structural invariants on a sample of rows
    for i in range(0, B, 400):
        k = ks[i]
        if k == 0:
            continue
        ss, ff, tt, t_ = sites[i, :k], frm[i, :k], to[i, :k], times[i, :k]
        assert (np.diff(t_) >= 0).all() and (t_ <= 0).all() and (t_ >= -T_dur).all()
        assert (ff != tt).all()
        # each site's chain is consistent forward in time and ends at A (0)
        for l in set(ss.tolist()):
            idx = np.nonzero(ss == l)[0]
            chain_f, chain_t = ff[idx], tt[idx]
            for j in range(len(idx) - 1):
                assert chain_t[j] == chain_f[j + 1], (l, chain_f, chain_t)
            assert chain_t[-1] == 0
