"""Jit bounded SPR-study (ops/spr_study.py) vs the host DFS builder.

The host SprStudyBuilder with max_muts_from_start=1 is the oracle (it is
itself validated against likelihood oracles and the native C++ twin); the
jit 0-1-BFS must enumerate exactly the same region set with the same
min_muts and time bounds, including missing-at-X sites (uncounted,
uncomposed crossings), the detachment accounting, and the t_X trim."""

import numpy as np
import pytest

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree, NO_NODE
from delphy_tpu.topo.study import SprStudyBuilder
from delphy_tpu.ops.spr_study import bounded_spr_study, pack_study_tree


def _key(r):
    return (r.branch, r.mut_idx, round(r.t_min, 12), round(r.t_max, 12),
            r.min_muts)


def _host_regions(tree, X, t_X, missing, seed_b, seed_i, d0, ccr):
    b = SprStudyBuilder(tree, X, t_X, missing, max_muts_from_start=1)
    b.seed_fill_from(seed_b, seed_i, d0, ccr)
    return sorted(_key(r) for r in b.result)


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_jit_study_matches_host_dfs(seed):
    T, L = 14, 200
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=5e-3, missing_fraction=0.1, seed=seed)
    rng = np.random.default_rng(seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    packed = pack_study_tree(tree)

    n_checked = 0
    mm_seen = set()
    for trial in range(40):
        X = int(rng.integers(0, tree.num_nodes))
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        a, b2 = tree.children[P]
        S = int(b2) if int(a) == X else int(a)
        if S == NO_NODE:
            continue
        t_X = float(tree.t[X])
        ccr = bool(rng.integers(0, 2))
        # seed deltas: the genuine P->X path deltas (X's branch mutations
        # composed in time order) — the delta-chain algebra asserts
        # consistency with the tree, so arbitrary maps are not valid input
        from delphy_tpu.topo import site_deltas as sd
        d0 = {}
        for m in tree.mutations[X]:
            sd.push_back(d0, m.site, m.from_, m.to)
        # missing set: random subset of mutation sites, excluding d0's
        # (production missing_at_X never overlaps the deltas to X)
        all_sites = sorted({m.site for b in range(tree.num_nodes)
                            for m in tree.mutations[b]} - set(d0))
        k = int(rng.integers(0, max(1, len(all_sites) // 3)))
        missing = set(int(s) for s in
                      rng.choice(all_sites, size=k, replace=False)) \
            if k else set()

        host = _host_regions(tree, X, t_X, missing, S, 0, d0, ccr)
        jit_ = sorted(_key(r) for r in bounded_spr_study(
            tree, X, t_X, missing, S, 0, d0, ccr, packed=packed))
        assert jit_ == host, (trial, X, S, ccr, len(host), len(jit_))
        n_checked += 1
        mm_seen.update(r[4] - len(d0) for r in host)
    assert n_checked >= 20
    # the one-crossing composition paths (+1 add, 0 update, -1 cancel) must
    # actually have been exercised, not just the distance-0 plateau
    assert 1 in mm_seen and (0 in mm_seen or -1 in mm_seen), mm_seen


def test_jit_study_weights_and_densities_match_host():
    """study_log_weights / pick_nexus_region / pick_time_in_region /
    log_alpha_in_region against the host SprStudy on the same region lists
    (same formulas, spr_study.cpp:226-547)."""
    import jax.numpy as jnp
    from delphy_tpu.topo.study import SprStudy
    from delphy_tpu.ops.spr_study import (pack_regions, study_log_weights,
                                          pick_nexus_region,
                                          pick_time_in_region,
                                          log_alpha_in_region)

    T, L = 16, 300
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=5e-3, missing_fraction=0.08, seed=9)
    rng = np.random.default_rng(9)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    t_max_tip = float(np.max(np.asarray(tree.t)[:T]))

    checked_root = 0
    for trial in range(30):
        X = int(rng.integers(0, tree.num_nodes))
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        a, b2 = tree.children[P]
        S = int(b2) if int(a) == X else int(a)
        t_X = float(tree.t[X])
        b = SprStudyBuilder(tree, X, t_X, set(), max_muts_from_start=1)
        b.seed_fill_from(S, 0, {}, True)
        if not b.result:
            continue
        lambda_X = 0.002 * L
        f = 0.8
        host = SprStudy(b, lambda_X, f, t_X, t_max_tip)
        mu = host.mu

        reg = pack_regions(tree, host.regions)
        lw = np.asarray(study_log_weights(reg, jnp.float64(lambda_X),
                                          jnp.float64(f), jnp.float64(t_X),
                                          jnp.float64(t_max_tip),
                                          jnp.float64(mu)))
        # host stores log_W_over_Wmax AFTER subtracting log_Wmax
        host_lw = np.array([r.log_W_over_Wmax for r in host.regions])
        got = lw - max(lw[np.isfinite(lw)].max(), 0.0) \
            if not np.isfinite(lw).any() else lw - lw.max()
        np.testing.assert_allclose(got, host_lw, rtol=1e-10, atol=1e-10)

        for u in (0.037, 0.5, 0.912):
            i_jit = int(pick_nexus_region(jnp.float64(u), jnp.asarray(lw)))
            # host consumes u*sum_W from an rng; inject via a stub rng
            class _U:
                def uniform(self, lo, hi):
                    return u * (hi - lo) + lo
            i_host = host.pick_nexus_region(_U())
            assert i_jit == i_host, (u, i_jit, i_host)

            t_jit = float(pick_time_in_region(
                jnp.float64(u), jnp.int32(i_jit), reg, jnp.float64(lambda_X),
                jnp.float64(f), jnp.float64(t_X), jnp.float64(t_max_tip)))
            class _U2:
                def uniform(self, lo, hi):
                    return lo + u * (hi - lo)
            t_host = host.pick_time_in_region(i_host, _U2())
            if host.regions[i_host].is_above_root():
                checked_root += 1
                assert abs(t_jit - t_host) < 1e-6 * max(
                    1.0, abs(t_host)), (t_jit, t_host)
            else:
                np.testing.assert_allclose(t_jit, t_host, rtol=1e-12)

            la_jit = float(log_alpha_in_region(
                jnp.int32(i_jit), jnp.float64(t_jit), jnp.asarray(lw), reg,
                jnp.float64(lambda_X), jnp.float64(f), jnp.float64(t_X),
                jnp.float64(t_max_tip)))
            la_host = host.log_alpha_in_region(i_host, t_host)
            np.testing.assert_allclose(la_jit, la_host, rtol=1e-8,
                                       atol=1e-8)

        # force the above-root branch (gamma-integral weights, inverse-Q
        # time sampling) whenever this study has one
        for i_r, r in enumerate(host.regions):
            if not r.is_above_root():
                continue
            checked_root += 1
            t_jit = float(pick_time_in_region(
                jnp.float64(0.41), jnp.int32(i_r), reg,
                jnp.float64(lambda_X), jnp.float64(f), jnp.float64(t_X),
                jnp.float64(t_max_tip)))
            class _U3:
                def uniform(self, lo, hi):
                    return lo + 0.41 * (hi - lo)
            t_host = host.pick_time_in_region(i_r, _U3())
            assert abs(t_jit - t_host) < 1e-6 * max(1.0, abs(t_host))
            la_jit = float(log_alpha_in_region(
                jnp.int32(i_r), jnp.float64(t_jit), jnp.asarray(lw), reg,
                jnp.float64(lambda_X), jnp.float64(f), jnp.float64(t_X),
                jnp.float64(t_max_tip)))
            la_host = host.log_alpha_in_region(i_r, t_host)
            np.testing.assert_allclose(la_jit, la_host, rtol=1e-6, atol=1e-6)
            break
    assert checked_root >= 1, "no above-root region exercised"


def test_jit_study_flood_vmaps_over_detach_candidates():
    """The flood kernel is fixed-shape per tree, so a BATCH of detach
    candidates X enumerates in one vmapped call — the shape of a future
    device-batched SPR proposal stage. Each batched result must equal the
    per-X host DFS."""
    import jax
    import jax.numpy as jnp
    from delphy_tpu.ops.spr_study import _bounded_flood

    T, L = 12, 150
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=6e-3, missing_fraction=0.0, seed=13)
    rng = np.random.default_rng(13)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    p = pack_study_tree(tree)
    R, M = p["R"], p["M"]
    rid_base = p["rid_base"]
    r_above = jnp.asarray(p["m_branch"] + np.arange(M, dtype=np.int64))
    counted = jnp.ones(M, dtype=bool)
    ones = jnp.ones(M, dtype=jnp.int32)

    # batch: every non-root node as X, seeded at its sibling
    Xs, seeds = [], []
    for X in range(tree.num_nodes):
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        a, b2 = tree.children[P]
        S = int(b2) if int(a) == X else int(a)
        Xs.append(X)
        seeds.append(int(rid_base[S]))
    Xs = np.array(Xs)
    seeds = np.array(seeds)

    flood_b = jax.vmap(
        lambda s, lo, hi: _bounded_flood(
            R, s, lo, hi, r_above, counted, jnp.asarray(p["jr_parent"]),
            jnp.asarray(p["jr_child"]), jnp.int32(0), ones, ones))
    reach0, reach1, _ = flood_b(jnp.asarray(seeds),
                                jnp.asarray(rid_base[Xs]),
                                jnp.asarray(rid_base[Xs] + p["nb"][Xs]))
    reach0 = np.asarray(reach0)
    reach1 = np.asarray(reach1)

    for row, X in enumerate(Xs):
        P = int(tree.parent[X])
        a, b2 = tree.children[P]
        S = int(b2) if int(a) == X else int(a)
        # raw DFS visit set (before the detachment rewrites, which the
        # wrapper applies host-side and the per-X test already pins)
        b = SprStudyBuilder(tree, int(X), float(tree.t[X]), set(),
                            max_muts_from_start=1)
        b._raw_fill(S, 0, {})
        host_rids = sorted(int(rid_base[r.branch]) + r.mut_idx
                           for r in b.result)
        got = sorted(np.nonzero(reach0[row] | reach1[row])[0].tolist())
        assert got == host_rids, (X, got, host_rids)


def test_jit_find_region_matches_host():
    import jax.numpy as jnp
    from delphy_tpu.topo.study import SprStudy
    from delphy_tpu.ops.spr_study import pack_regions, find_region

    ref, deltas, miss, dates, names, _ = simulate_dataset(
        10, 150, mu=6e-3, missing_fraction=0.0, seed=23)
    rng = np.random.default_rng(23)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    X = next(i for i in range(tree.num_nodes)
             if i != tree.root and int(tree.parent[i]) != tree.root)
    P = int(tree.parent[X])
    a, b2 = tree.children[P]
    S = int(b2) if int(a) == X else int(a)
    b = SprStudyBuilder(tree, X, float(tree.t[X]), set(), 1)
    b.seed_fill_from(S, 0, {}, True)
    host = SprStudy(b, 0.5, 0.8, float(tree.t[X]),
                    float(np.max(np.asarray(tree.t))))
    reg = pack_regions(tree, host.regions)
    for r in host.regions[:8]:
        tt = 0.5 * (max(r.t_min, r.t_max - 10.0) + r.t_max)
        i_host = host.find_region(r.branch, tt)
        i_jit = int(find_region(jnp.int64(r.branch), jnp.float64(tt), reg))
        assert i_host == i_jit, (r.branch, tt, i_host, i_jit)
    # a miss
    assert int(find_region(jnp.int64(tree.root), jnp.float64(1e18), reg)) \
        == host.find_region(tree.root, 1e18) == -1
