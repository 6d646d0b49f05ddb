"""Topology-move machinery tests: graft round-trips, delta_log_G consistency
vs the oracle, move reversibility, full mixer bursts with integrity checks.

Mirrors the reference's SPR test strategy (tests/spr_move_tests.cpp:
ASCII-diagrammed micro-trees + randomized round-trip stress with exact
likelihood bookkeeping)."""

import copy
import math

import numpy as np
import pytest

from delphy_tpu.evo import make_evo_params
from delphy_tpu.phylo import build_random_tree, NO_NODE
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.topo.graft import SprContext, _sibling
from delphy_tpu.topo.mixer import TopologyMixer, HostCoalGrid
from delphy_tpu import pop as popm

import oracles


def make_tree(seed=0, T=10, L=60, missing_fraction=0.15, mu=4e-3):
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=mu, missing_fraction=missing_fraction, seed=seed)
    rng = np.random.default_rng(seed + 1000)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    evo = make_evo_params(L, mu=mu, kappa=2.0, pi=(0.28, 0.22, 0.26, 0.24),
                          nu=rng.gamma(8.0, 1 / 8.0, size=L))
    return tree, evo, rng


def make_ctx(tree, evo):
    return SprContext(tree, float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q),
                      np.asarray(evo.pi))


def tree_fingerprint(tree):
    muts = []
    for n in range(tree.num_nodes):
        for m in tree.mutations[n]:
            muts.append((n, m.site, m.from_, m.to, round(m.t, 9)))
    miss = [(n, tuple(tree.miss_intervals[n]),
             tuple(sorted(tree.miss_from_states[n].items())))
            for n in range(tree.num_nodes)]
    return (tree.root, tuple(np.asarray(tree.parent)), tuple(sorted(muts)),
            tuple(miss), tuple(np.round(np.asarray(tree.t), 9)))


def oracle_log_G(tree, evo):
    return oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                         np.asarray(evo.q), np.asarray(evo.pi))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_graft_peel_apply_roundtrip(seed):
    tree, evo, rng = make_tree(seed=seed)
    ctx = make_ctx(tree, evo)
    before = tree_fingerprint(tree)
    lg_before = oracle_log_G(tree, evo)
    for X in range(tree.num_nodes):
        if X == tree.root:
            continue
        ctx.begin_move()
        g = ctx.analyze_graft(X)
        ctx.peel_graft(g)
        tree.check_integrity()
        ctx.apply_graft(g)
        tree.check_integrity()
        assert tree_fingerprint(tree) == before, f"roundtrip failed for X={X}"
    np.testing.assert_allclose(oracle_log_G(tree, evo), lg_before, rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 5])
def test_move_and_move_back_roundtrip(seed):
    tree, evo, rng = make_tree(seed=seed)
    ctx = make_ctx(tree, evo)
    before = tree_fingerprint(tree)
    N = tree.num_nodes
    for trial in range(30):
        X = int(rng.integers(0, N))
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        old_S = _sibling(tree, P, X)
        old_t_P = float(tree.t[P])
        # random valid regraft target: any node not in X's subtree, with
        # parent time < min(t_X, t_SS)
        in_subtree = set()
        stack = [X]
        while stack:
            n = stack.pop()
            in_subtree.add(n)
            for c in tree.children[n]:
                if c != NO_NODE:
                    stack.append(int(c))
        cands = [n for n in range(N) if n not in in_subtree and n != P]
        SS = int(rng.choice(cands))
        GG = int(tree.parent[SS]) if SS != tree.root else NO_NODE
        hi = min(float(tree.t[X]), float(tree.t[SS]))
        lo = float(tree.t[GG]) if GG != NO_NODE else hi - 30.0
        if lo >= hi:
            continue
        new_t_P = float(rng.uniform(lo, hi))

        ctx.begin_move()
        g = ctx.analyze_graft(X)
        ctx.peel_graft(g)
        ctx.move(X, SS, new_t_P)
        tree.check_integrity()
        ctx.move(X, old_S, old_t_P)
        ctx.apply_graft(g)
        tree.check_integrity()
        assert tree_fingerprint(tree) == before, f"trial {trial}, X={X}, SS={SS}"


@pytest.mark.parametrize("seed", [0, 7])
def test_delta_log_G_consistency(seed):
    """After a full move + proposed graft, the oracle log_G change equals
    new.delta_log_G - old.delta_log_G (the invariant behind the incremental
    ledger updates of subrun.cpp:665-669)."""
    tree, evo, rng = make_tree(seed=seed, T=12, L=80)
    ctx = make_ctx(tree, evo)
    N = tree.num_nodes
    done = 0
    for trial in range(60):
        if done >= 15:
            break
        lg_before = oracle_log_G(tree, evo)
        X = int(rng.integers(0, N))
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        in_subtree = set()
        stack = [X]
        while stack:
            n = stack.pop()
            in_subtree.add(n)
            for c in tree.children[n]:
                if c != NO_NODE:
                    stack.append(int(c))
        cands = [n for n in range(N) if n not in in_subtree and n != P]
        SS = int(rng.choice(cands))
        GG = int(tree.parent[SS]) if SS != tree.root else NO_NODE
        hi = min(float(tree.t[X]), float(tree.t[SS]))
        lo = float(tree.t[GG]) if GG != NO_NODE else hi - 30.0
        if lo >= hi:
            continue
        new_t_P = float(rng.uniform(lo, hi))

        ctx.begin_move()
        old_g = ctx.analyze_graft(X)
        ctx.peel_graft(old_g)
        ctx.move(X, SS, new_t_P)
        new_g = ctx.propose_new_graft(X, rng)
        ctx.apply_graft(new_g)
        tree.check_integrity()
        lg_after = oracle_log_G(tree, evo)
        np.testing.assert_allclose(
            lg_after - lg_before, new_g.delta_log_G - old_g.delta_log_G,
            rtol=1e-8, atol=1e-8,
            err_msg=f"trial {trial}: X={X} SS={SS} t={new_t_P}")
        done += 1
    assert done >= 10


def test_mixer_burst_preserves_tips_and_mixes():
    tree, evo, rng = make_tree(seed=11, T=14, L=120, mu=5e-3)
    seqs_before = [tree.sequence_at(i) for i in range(tree.num_tips)]
    missing_before = [tree.missing_sites_at(i) for i in range(tree.num_tips)]
    parents_before = np.asarray(tree.parent).copy()

    pop = popm.ExpPopParams(t0=200.0, n0=100.0, g=0.0, min_pop=1.0)
    mixer = TopologyMixer(tree, rng, num_cells=128)
    t_max_tip = float(np.max(tree.t_max[:tree.num_tips]))
    mixer.run_burst(300, float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q),
                    np.asarray(evo.pi), pop, t_max_tip)
    tree.check_integrity()
    assert mixer.n_accepted > 0, "no topology moves accepted in 300 proposals"
    assert not np.array_equal(np.asarray(tree.parent), parents_before), \
        "topology unchanged after accepted moves"
    for i in range(tree.num_tips):
        assert tree.missing_sites_at(i) == missing_before[i]
        got = tree.sequence_at(i)
        for l in range(tree.num_sites):
            if l not in missing_before[i]:
                assert got[l] == seqs_before[i][l], f"tip {i} site {l} corrupted"
    lg = oracle_log_G(tree, evo)
    assert math.isfinite(lg)
