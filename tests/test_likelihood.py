"""Oracle micro-tree tests for the EMAT likelihood kernels.

Mirrors the reference's hand-built-fixture strategy
(tests/phylo_tree_calc_tests.cpp): small trees with explicit mutations and
missations, checked against direct-formula host oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from delphy_tpu.evo import make_evo_params, hky_q
from delphy_tpu.phylo import FlatTree, Mutation, NO_NODE, build_random_tree
from delphy_tpu.state import pack_state
from delphy_tpu.ops import likelihood as lk

import oracles


def make_micro_tree():
    """5-node tree (3 tips, 2 inner), L=6 sites, with mutations, a missation
    interval, and a from-state exception.

       r(4)
       /  \
     i(3)  c(2)
     / \
   a(0) b(1)
    """
    L = 6
    ref = np.array([0, 1, 2, 3, 0, 1], dtype=np.int8)  # A C G T A C
    parent = np.array([3, 3, 4, 4, NO_NODE], dtype=np.int32)
    children = np.array([[NO_NODE, NO_NODE], [NO_NODE, NO_NODE], [NO_NODE, NO_NODE],
                         [0, 1], [2, 4 * 0 - 1]], dtype=np.int32)
    children[4] = [3, 2]
    t = np.array([0.0, -1.0, 1.0, -5.0, -10.0])
    t_min = np.array([-0.5, -1.5, 0.5, -np.inf, -np.inf])
    t_max = np.array([0.5, -0.5, 1.5, np.inf, np.inf])

    mutations = [[] for _ in range(5)]
    # root deltas vs ref (t = -inf equivalent)
    mutations[4] = [Mutation(site=0, from_=0, to=2, t=-1e30)]  # A->G at site 0
    # branch to inner node 3: two mutations, one site mutated twice
    mutations[3] = [Mutation(site=1, from_=1, to=3, t=-8.0),
                    Mutation(site=1, from_=3, to=0, t=-6.5)]
    # tip branches
    mutations[0] = [Mutation(site=2, from_=2, to=1, t=-2.0)]
    mutations[1] = [Mutation(site=0, from_=2, to=3, t=-3.0)]
    mutations[2] = [Mutation(site=3, from_=3, to=0, t=-4.0)]

    miss_intervals = [[] for _ in range(5)]
    miss_from_states = [{} for _ in range(5)]
    miss_intervals[2] = [(4, 6)]          # sites 4,5 missing at tip 2
    miss_intervals[1] = [(2, 3)]          # site 2 missing at tip 1
    miss_intervals[0] = [(5, 6)]
    # from-state exception example: at tip 1, site 0's state when entering the
    # missing... (site 0 is not missing at tip1; use a proper case: make site 0
    # missing at tip 0 where upstream state is G (root delta), not ref A)
    miss_intervals[0] = [(0, 1), (5, 6)]
    miss_from_states[0] = {0: 2}
    # drop tip 0's site-2 mutation? keep; site 2 fine.
    # But wait: tip 1's branch has a mutation at site 0 (G->T) and no missation
    # there; consistent.

    tree = FlatTree(parent=parent, children=children, t=t, t_min=t_min, t_max=t_max,
                    root=4, ref_seq=ref, mutations=mutations,
                    miss_intervals=miss_intervals, miss_from_states=miss_from_states,
                    name=["a", "b", "c"])
    return tree


@pytest.fixture
def micro():
    tree = make_micro_tree()
    evo = make_evo_params(tree.num_sites, mu=0.013, kappa=3.0,
                          pi=(0.3, 0.2, 0.25, 0.25), alpha=1.0,
                          nu=np.array([1.0, 0.5, 2.0, 1.0, 0.7, 1.3]))
    return tree, evo


def test_micro_tree_integrity(micro):
    tree, _ = micro
    tree.check_integrity()


def test_ref_cum_Q(micro):
    tree, evo = micro
    ts = pack_state(tree)
    cum = np.asarray(lk.calc_ref_cum_Q(ts, evo))
    qa = -np.diagonal(np.asarray(evo.q))
    expect = np.concatenate([[0.0], np.cumsum(
        np.asarray(evo.mu) * np.asarray(evo.nu) * qa[tree.ref_seq])])
    np.testing.assert_allclose(cum, expect, rtol=1e-12)


def test_lambda_i(micro):
    tree, evo = micro
    ts = pack_state(tree)
    cum = lk.calc_ref_cum_Q(ts, evo)
    lam, _ = lk.calc_lambda_i(ts, evo, cum)
    expect = oracles.lambda_i_all(tree, float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q))
    np.testing.assert_allclose(np.asarray(lam), expect, rtol=1e-10)


def test_log_G(micro):
    tree, evo = micro
    ts = pack_state(tree)
    cum = lk.calc_ref_cum_Q(ts, evo)
    lam, _ = lk.calc_lambda_i(ts, evo, cum)
    cnt, _ = lk.calc_ref_state_prefix(ts, evo)
    root_freq = lk.calc_root_state_frequencies(ts, evo, cnt)
    got = float(lk.calc_log_G(ts, evo, lam, root_freq))
    expect = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                           np.asarray(evo.q), np.asarray(evo.pi))
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_counters(micro):
    tree, evo = micro
    ts = pack_state(tree)
    assert int(lk.calc_num_muts(ts)) == 5
    mab = np.asarray(lk.calc_num_muts_ab(ts))
    assert mab.sum() == 5
    assert mab[1, 3] == 1 and mab[3, 0] == 2 and mab[2, 1] == 1 and mab[2, 3] == 1
    ml = np.asarray(lk.calc_num_muts_l(ts))
    np.testing.assert_array_equal(ml, [1, 2, 1, 1, 0, 0])


def test_Ttwiddle(micro):
    tree, evo = micro
    ts = pack_state(tree)
    tin, tout = tree.euler_positions()
    tin_j, tout_j = jnp.asarray(tin), jnp.asarray(tout)
    _, nucum = lk.calc_ref_state_prefix(ts, evo)
    twa = np.asarray(lk.calc_Ttwiddle_a(ts, evo, tin_j, tout_j, nucum))
    expect_a = oracles.Ttwiddle_a(tree, np.asarray(evo.nu))
    np.testing.assert_allclose(twa, expect_a, rtol=1e-10)

    twl = np.asarray(lk.calc_Ttwiddle_l(ts, evo, tin_j, tout_j))
    expect_l = oracles.Ttwiddle_l(tree, np.asarray(evo.q))
    np.testing.assert_allclose(twl, expect_l, rtol=1e-10, atol=1e-12)


def test_num_sites_missing(micro):
    tree, evo = micro
    ts = pack_state(tree)
    cnt, _ = lk.calc_ref_state_prefix(ts, evo)
    got = np.asarray(lk.calc_num_sites_missing(ts, cnt))
    expect = np.array([len(tree.missing_sites_at(n)) for n in range(tree.num_nodes)])
    np.testing.assert_array_equal(got, expect)


def test_random_tree_consistency(rng):
    """Random larger tree: kernels vs oracles end to end."""
    L, T = 40, 12
    ref = rng.integers(0, 4, size=L).astype(np.int8)
    tip_deltas, tip_miss, tip_dates = [], [], []
    for i in range(T):
        sites = rng.choice(L, size=rng.integers(0, 6), replace=False)
        tip_deltas.append([(int(s), int((ref[s] + rng.integers(1, 4)) % 4)) for s in sites])
        if rng.random() < 0.5:
            s = int(rng.integers(0, L - 3))
            tip_miss.append([(s, s + int(rng.integers(1, 4)))])
        else:
            tip_miss.append([])
        d = float(rng.uniform(0, 60))
        tip_dates.append((d, d))
    # drop deltas inside the tip's own missing intervals (they'd be unobserved)
    for i in range(T):
        missing = set()
        for (s, e) in tip_miss[i]:
            missing.update(range(s, e))
        tip_deltas[i] = [(s, to) for (s, to) in tip_deltas[i] if s not in missing]
    tree = build_random_tree(ref, tip_deltas, tip_miss, tip_dates, rng=rng)
    tree.check_integrity()

    evo = make_evo_params(L, mu=0.004, kappa=2.5, pi=(0.2, 0.3, 0.3, 0.2),
                          nu=rng.gamma(5.0, 0.2, size=L))
    ts = pack_state(tree)
    cum = lk.calc_ref_cum_Q(ts, evo)
    lam, _ = lk.calc_lambda_i(ts, evo, cum)
    np.testing.assert_allclose(
        np.asarray(lam),
        oracles.lambda_i_all(tree, float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q)),
        rtol=1e-9)

    cnt, nucum = lk.calc_ref_state_prefix(ts, evo)
    root_freq = lk.calc_root_state_frequencies(ts, evo, cnt)
    got = float(lk.calc_log_G(ts, evo, lam, root_freq))
    expect = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                           np.asarray(evo.q), np.asarray(evo.pi))
    np.testing.assert_allclose(got, expect, rtol=1e-9)

    tin, tout = tree.euler_positions()
    twa = np.asarray(lk.calc_Ttwiddle_a(ts, evo, jnp.asarray(tin), jnp.asarray(tout), nucum))
    np.testing.assert_allclose(twa, oracles.Ttwiddle_a(tree, np.asarray(evo.nu)), rtol=1e-9)
    twl = np.asarray(lk.calc_Ttwiddle_l(ts, evo, jnp.asarray(tin), jnp.asarray(tout)))
    np.testing.assert_allclose(twl, oracles.Ttwiddle_l(tree, np.asarray(evo.q)),
                               rtol=1e-9, atol=1e-12)


def test_hky_q_properties():
    q = np.asarray(hky_q(2.0, jnp.array([0.1, 0.2, 0.3, 0.4])))
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-14)
    pi = np.array([0.1, 0.2, 0.3, 0.4])
    # normalization: sum_a pi_a q_a == 1 (R normalization)
    np.testing.assert_allclose(-(pi * np.diagonal(q)).sum(), 1.0, rtol=1e-12)
    # detailed balance: pi_a q_ab == pi_b q_ba
    for a in range(4):
        for b in range(4):
            np.testing.assert_allclose(pi[a] * q[a, b], pi[b] * q[b, a], rtol=1e-12)
