"""Device SPR-with-missations machinery (ops/spr_miss.py) vs the host graft
oracle (topo/graft.py, itself pinned to the native production kernel)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree, rereference_to_root_sequence
from delphy_tpu.topo.graft import SprContext
from delphy_tpu.evo import make_evo_params
from delphy_tpu.ops import spr_miss as sm
from delphy_tpu.ops import runset as rsn


def _make_tree(T=24, L=400, seed=3, missing_fraction=0.08):
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=2e-3, missing_fraction=missing_fraction, seed=seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(seed))
    rereference_to_root_sequence(tree)
    tree.check_integrity()
    return tree


def _ctx_and_pack(tree, mu=2e-3, kappa=2.0):
    L = tree.num_sites
    evo = make_evo_params(L, mu=mu, kappa=kappa)
    ctx = SprContext(tree, mu, np.asarray(evo.nu), np.asarray(evo.q),
                     np.asarray(evo.pi), can_change_root=False)
    # generous fs width: random (non-parsimony) test trees slide many
    # mutations, each adding sibling from-state entries
    p = sm.pack_tree_miss(tree, WF_=4 * max(
        len(ms) for ms in tree.mutations) + 32)
    args = dict(
        mu=jnp.float64(mu), nu=jnp.asarray(evo.nu),
        qatab=jnp.asarray(ctx.qa_tab.reshape(-1)),
        qtab=jnp.asarray(ctx.q_tab.reshape(-1)),
        part=jnp.asarray(ctx.part),
        ref_cum_Q=jnp.asarray(ctx.ref_cum_Q),
        ref_seq=jnp.asarray(tree.ref_seq.astype(np.int32)),
        lambda_ref=jnp.float64(ctx.lambda_ref),
    )
    return ctx, p, args


def test_pack_unpack_roundtrip():
    tree = _make_tree()
    p = sm.pack_tree_miss(tree)
    out = sm.unpack_tree_miss(p, tree)
    out.check_integrity()
    for n in range(tree.num_nodes):
        assert out.miss_intervals[n] == tree.miss_intervals[n]
        assert out.miss_from_states[n] == tree.miss_from_states[n]
        assert out.mutations[n] == tree.mutations[n]


def test_lambda_and_missing_reads_match_host():
    tree = _make_tree()
    ctx, p, a = _ctx_and_pack(tree)
    lam = jax.jit(jax.vmap(lambda X: sm.lambda_at_dev_miss(
        p, X, a["lambda_ref"], a["mu"], a["nu"], a["qatab"], a["part"],
        a["ref_cum_Q"], a["ref_seq"])))(jnp.arange(tree.num_nodes))
    nm = jax.jit(jax.vmap(lambda X: sm.num_missing_at_dev(p, X)))(
        jnp.arange(tree.num_nodes))
    for n in range(tree.num_nodes):
        assert float(lam[n]) == pytest.approx(ctx.lambda_at(n), rel=1e-12,
                                              abs=1e-12)
        assert int(nm[n]) == ctx.num_missing_at(n)


def test_missing_at_row_matches_host():
    tree = _make_tree(seed=7)
    ctx, p, a = _ctx_and_pack(tree)
    WR = 32
    L = tree.num_sites
    for X in range(tree.num_nodes):
        rs, re, cnt, ok = jax.jit(sm.missing_at_row,
                                  static_argnames=("WR_out",))(p, X, WR_out=WR)
        assert bool(ok)
        mask = np.asarray(rsn.contains_many(rs, re, jnp.arange(L)))
        expect = np.array([ctx._is_site_missing_at(X, s) for s in range(L)])
        np.testing.assert_array_equal(mask, expect)


def test_fs_row_ops():
    ref_seq = jnp.asarray(np.array([0, 1, 2, 3] * 4, np.int32))
    fsite = jnp.asarray(np.array([3, 7, -1, -1], np.int32))
    fstate = jnp.asarray(np.array([1, 0, 0, 0], np.int32))
    # get: present / absent
    assert int(sm.fs_get(fsite, fstate, ref_seq, jnp.int32(3))) == 1
    assert int(sm.fs_get(fsite, fstate, ref_seq, jnp.int32(5))) == 1  # ref
    # set to ref erases
    fs2, st2, ok = sm.fs_set(fsite, fstate, ref_seq, jnp.int32(3),
                             jnp.int32(3))
    assert bool(ok) and 3 not in np.asarray(fs2).tolist()
    # upsert
    fs3, st3, ok = sm.fs_set(fsite, fstate, ref_seq, jnp.int32(7),
                             jnp.int32(2))
    assert bool(ok)
    i = np.asarray(fs3).tolist().index(7)
    assert int(st3[i]) == 2
    # append
    fs4, st4, ok = sm.fs_set(fsite, fstate, ref_seq, jnp.int32(9),
                             jnp.int32(3))
    assert bool(ok) and 9 in np.asarray(fs4).tolist()
    # overflow
    full_s = jnp.asarray(np.array([0, 4, 8, 12], np.int32))
    full_v = jnp.asarray(np.array([1, 1, 1, 1], np.int32))
    _, _, ok = sm.fs_set(full_s, full_v, ref_seq, jnp.int32(9), jnp.int32(3))
    assert not bool(ok)


def _host_analysis(ctx, X):
    g = ctx._start_graft_analysis(X)
    ctx._finish_graft_analysis(g)
    return g


def _row_to_sites(rs, re, cnt, L):
    out = set()
    for s, e in rsn.row_to_intervals(rs, re, cnt):
        out.update(range(s, min(e, L)))
    return out


def test_start_inner_dev_matches_host():
    """Analysis parity: per-branch-info A/B/T, warm/hot sets, partial
    lambdas, hot mutations and composed hot deltas equal the host
    _start_inner on missation-laden trees (can_change_root=False)."""
    import functools
    n_multi = 0
    for seed in range(6):
        tree = _make_tree(T=16, L=300, seed=seed, missing_fraction=0.12)
        ctx, p, a = _ctx_and_pack(tree)
        ctx.begin_move()
        L = tree.num_sites
        WRB = 2 * p["rs"].shape[1] + 8
        WH_ = 4 * p["msite"].shape[1]
        f = jax.jit(functools.partial(sm.start_inner_dev, WRB=WRB, WH_=WH_))
        for X in range(tree.num_nodes):
            if X == tree.root or int(tree.parent[X]) == tree.root:
                continue
            g = _host_analysis(ctx, X)
            G, ok = f(p, X, a)
            assert bool(ok), (seed, X)
            n_bi = int(G["n_bi"])
            assert n_bi == len(g.branch_infos), (seed, X)
            n_multi += int(n_bi > 1)
            for k, bi in enumerate(g.branch_infos):
                assert int(G["A"][k]) == bi.A
                assert int(G["B"][k]) == bi.B
                assert float(G["T"][k]) == pytest.approx(bi.T_to_X, abs=0)
                # sets
                dev_hot = _row_to_sites(G["hot_rs"][k], G["hot_re"][k],
                                        G["hot_cnt"][k], L)
                if bool(G["compl_"][k]):
                    dev_hot = set(range(L)) - dev_hot
                host_hot = (set(range(L)) - bi.hot_sites.excluded
                            if hasattr(bi.hot_sites, "excluded")
                            else set(bi.hot_sites))
                assert dev_hot == host_hot, (seed, X, k)
                if k > 0:
                    dev_warm = _row_to_sites(G["warm_rs"][k],
                                             G["warm_re"][k],
                                             G["warm_cnt"][k], L)
                    assert dev_warm == set(bi.warm_sites), (seed, X, k)
                # lambdas
                assert float(G["plA"][k]) == pytest.approx(
                    bi.partial_lambda_at_A, rel=1e-9, abs=1e-12), (seed, X, k)
                assert float(G["plX"][k]) == pytest.approx(
                    bi.partial_lambda_at_X, rel=1e-9, abs=1e-12), (seed, X, k)
                # hot mutations (site, from, to, t) in order
                hm = [(int(G["hm_s"][k][i]), int(G["hm_f"][k][i]),
                       int(G["hm_t2"][k][i]), float(G["hm_tt"][k][i]))
                      for i in range(int(G["hm_cnt"][k]))]
                hh = [(m.site, m.from_, m.to, m.t) for m in bi.hot_muts_to_X]
                assert hm == hh, (seed, X, k)
                # composed hot deltas
                hd = {int(G["hd_s"][k][i]): (int(G["hd_f"][k][i]),
                                             int(G["hd_t"][k][i]))
                      for i in range(int(G["hd_cnt"][k]))}
                assert hd == {s: (ft[0], ft[1]) if isinstance(ft, tuple)
                              else (ft.from_, ft.to)
                              for s, ft in bi.hot_deltas_to_X.items()}, \
                    (seed, X, k)
    assert n_multi >= 10, f"only {n_multi} multi-BI cases exercised"


def _trees_equal(a, b, check_fs=True):
    assert a.root == b.root
    np.testing.assert_array_equal(a.parent, b.parent)
    np.testing.assert_array_equal(np.sort(np.asarray(a.children), axis=1),
                                  np.sort(np.asarray(b.children), axis=1))
    np.testing.assert_allclose(a.t, b.t, rtol=0, atol=0)
    for n in range(a.num_nodes):
        ma = [(m.site, m.from_, m.to, m.t) for m in a.mutations[n]]
        mb = [(m.site, m.from_, m.to, m.t) for m in b.mutations[n]]
        assert ma == mb, (n, ma, mb)
        assert a.miss_intervals[n] == b.miss_intervals[n], n
        if check_fs:
            assert a.miss_from_states[n] == b.miss_from_states[n], n


def _valid_targets(tree, X):
    """Branches SS (not root, not in X's subtree, not X) with a regraft
    window below t_X."""
    t = tree.t
    X_sub = set()
    stack = [X]
    while stack:
        n = stack.pop()
        X_sub.add(n)
        c0, c1 = tree.children[n]
        if int(c0) >= 0:
            stack.extend([int(c0), int(c1)])
    P = int(tree.parent[X])
    out = []
    for SS in range(tree.num_nodes):
        if SS in X_sub or SS == tree.root:
            continue
        GG = int(tree.parent[SS]) if SS != P else int(tree.parent[P])
        lo = float(t[GG]) if GG >= 0 else -np.inf
        hi = min(float(t[SS if SS != P else _sib(tree, P, X)]),
                 float(t[X]))
        if hi > lo:
            out.append((SS, lo, hi))
    return out


def _sib(tree, parent, child):
    a, b = tree.children[parent]
    return int(b) if int(a) == child else int(a)


def test_peel_move_apply_match_host():
    """End-to-end surgical parity on missation-laden trees: device
    finish/peel/move/apply reproduce the host graft pipeline exactly —
    including the missation factoring cascade and from-state slides."""
    import functools
    rng = np.random.default_rng(77)
    n_cases = 0
    for seed in range(5):
        tree0 = _make_tree(T=14, L=250, seed=seed + 20, missing_fraction=0.15)
        for trial in range(6):
            tree = tree0.copy()
            ctx, p, a = _ctx_and_pack(tree)
            ctx.begin_move()
            mu_prop = ctx.mu_jc()
            WRB = 2 * p["rs"].shape[1] + 8
            WH_ = 4 * p["msite"].shape[1]
            inner = [X for X in range(tree.num_nodes)
                     if X != tree.root and int(tree.parent[X]) != tree.root]
            X = int(rng.choice(inner))
            # keep the regraft window short: these random (non-parsimony)
            # trees run so hot that a distant regraft legitimately overflows
            # the mutation rows (the device correctly rejects via ok=False);
            # parity needs performable moves
            targets = [(SS, lo, hi) for (SS, lo, hi)
                       in _valid_targets(tree, X)
                       if float(tree.t[X]) - hi < 120.0]
            if not targets:
                continue
            SS, lo, hi = targets[int(rng.integers(len(targets)))]
            t_new = float(rng.uniform(max(lo, hi - 50.0), hi))
            if t_new >= hi or t_new <= lo:
                continue

            # ---- host pipeline ----
            g_old = ctx.analyze_graft(X)
            ctx.peel_graft(g_old)
            host_peel = tree.copy()
            ctx.move(X, SS, t_new)
            host_move = tree.copy()
            g_new = ctx.propose_new_graft(X, rng)
            ctx.apply_graft(g_new)
            host_apply = tree.copy()

            # ---- device pipeline ----
            G, ok = jax.jit(functools.partial(sm.start_inner_dev, WRB=WRB,
                                              WH_=WH_))(p, X, a)
            assert bool(ok)
            dG_dev, al_dev = sm.finish_dev(p, G, a, jnp.float64(mu_prop),
                                           tree.num_sites)
            assert float(dG_dev) == pytest.approx(g_old.delta_log_G,
                                                  rel=1e-9, abs=1e-9)
            assert float(al_dev) == pytest.approx(g_old.log_alpha_mut,
                                                  rel=1e-9, abs=1e-9)
            p_peel, ok = jax.jit(sm.peel_inner_dev)(p, G, a)
            assert bool(ok)
            _trees_equal(sm.unpack_tree_miss(p_peel, tree0), host_peel)

            p_move, ok = jax.jit(sm.move_dev)(p_peel, X, SS,
                                              jnp.float64(t_new), a)
            assert bool(ok), (seed, trial, X, SS)
            _trees_equal(sm.unpack_tree_miss(p_move, tree0), host_move)

            # analysis at the new position + inject the host's proposal
            G2, ok = jax.jit(functools.partial(sm.start_inner_dev, WRB=WRB,
                                               WH_=WH_))(p_move, X, a)
            assert bool(ok)
            assert int(G2["n_bi"]) == len(g_new.branch_infos)
            hm_s = np.full((sm.BI_MAX, WH_), -1, np.int32)
            hm_f = np.zeros((sm.BI_MAX, WH_), np.int32)
            hm_t2 = np.zeros((sm.BI_MAX, WH_), np.int32)
            hm_tt = np.full((sm.BI_MAX, WH_), np.inf)
            hm_cnt = np.zeros(sm.BI_MAX, np.int32)
            for k, bi in enumerate(g_new.branch_infos):
                for i, m in enumerate(bi.hot_muts_to_X):
                    hm_s[k, i], hm_f[k, i], hm_t2[k, i], hm_tt[k, i] = \
                        m.site, m.from_, m.to, m.t
                hm_cnt[k] = len(bi.hot_muts_to_X)
            G2 = dict(G2, hm_s=jnp.asarray(hm_s), hm_f=jnp.asarray(hm_f),
                      hm_t2=jnp.asarray(hm_t2), hm_tt=jnp.asarray(hm_tt),
                      hm_cnt=jnp.asarray(hm_cnt))
            p_app, ok = jax.jit(sm.apply_inner_dev)(p_move, G2, a)
            assert bool(ok), (seed, trial, X, SS)
            _trees_equal(sm.unpack_tree_miss(p_app, tree0), host_apply)
            out = sm.unpack_tree_miss(p_app, tree0)
            out.check_integrity()
            n_cases += 1
    assert n_cases >= 15, n_cases


def test_spr1_step_miss_chain_ledger_and_integrity():
    """Chain of jitted missation-aware SPR1 moves: every accepted move's
    delta_log_G equals the oracle log_G difference, the tree stays valid in
    canonical missation form, observed tip data is preserved, and both
    accepts and multi-branch-info analyses occur."""
    import oracles

    MU = 4e-4
    T, L = 12, 300
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=MU, missing_fraction=0.08, seed=31)
    rng = np.random.default_rng(31)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    rereference_to_root_sequence(tree)
    tree.check_integrity()
    ctx, p, a = _ctx_and_pack(tree, mu=MU)
    a = dict(a, mu=jnp.float64(MU))
    t_max_tip = float(np.max(np.asarray(tree.t_max)[:tree.num_tips]))
    WRB = 2 * p["rs"].shape[1] + 8
    WH_ = 2 * p["msite"].shape[1]

    def oracle_lg(tr):
        return oracles.log_G(tr, MU, np.asarray(a["nu"]),
                             np.asarray(ctx.q), np.asarray(ctx.pi))

    lg = oracle_lg(tree)
    key = jax.random.PRNGKey(4)
    n_acc = n_perf = n_multi = 0
    tip_obs = []
    for i in range(tree.num_tips):
        seq = tree.sequence_at(i).copy()
        observed = np.ones(L, bool)
        for l in tree.missing_sites_at(i):
            observed[l] = False
        tip_obs.append((seq, observed))
    for it in range(150):
        key, k = jax.random.split(key)
        p2, acc, dlg, perf, diag = sm.spr1_step_miss(
            k, p, L, a, jnp.float64(t_max_tip), WRB=WRB, WH_=WH_)
        n_perf += int(perf)
        if bool(perf):
            n_multi += int(int(diag["n_bi_old"]) > 1
                           or int(diag["n_bi_new"]) > 1)
        if bool(acc):
            n_acc += 1
            back = sm.unpack_tree_miss(p2, tree)
            back.check_integrity()
            lg2 = oracle_lg(back)
            np.testing.assert_allclose(lg2 - lg, float(dlg),
                                       rtol=1e-9, atol=1e-9)
            lg = lg2
            for i in range(back.num_tips):
                seq, observed = tip_obs[i]
                got = back.sequence_at(i)
                assert (got[observed] == seq[observed]).all(), i
                # missing sites stay missing (missation sets per tip are
                # invariant under SPR)
                miss_now = np.zeros(L, bool)
                for l in back.missing_sites_at(i):
                    miss_now[l] = True
                assert (miss_now == ~observed).all(), i
            p = p2
    assert n_perf >= 50, n_perf
    assert n_acc >= 5, n_acc
    assert n_multi >= 3, n_multi


def test_spr1_sweep_miss_matches_stepwise():
    """The scanned sweep equals a Python loop of spr1_step_miss on the same
    keys, and its accumulated delta_log_G matches the oracle recompute."""
    import oracles

    MU = 4e-4
    T, L = 10, 200
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=MU, missing_fraction=0.1, seed=41)
    rng = np.random.default_rng(41)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    rereference_to_root_sequence(tree)
    ctx, p, a = _ctx_and_pack(tree, mu=MU)
    a = dict(a, mu=jnp.float64(MU))
    t_max_tip = float(np.max(np.asarray(tree.t_max)[:tree.num_tips]))
    WRB = 2 * p["rs"].shape[1] + 8
    WH_ = 2 * p["msite"].shape[1]
    n_moves = 40
    key = jax.random.PRNGKey(11)

    p_sweep, n_acc, dlg_tot, n_perf = sm.spr1_sweep_miss(
        key, p, L, n_moves, a, jnp.float64(t_max_tip), WRB=WRB, WH_=WH_)

    keys = jax.random.split(key, n_moves)
    p_step = p
    acc2 = 0
    dlg2 = 0.0
    for i in range(n_moves):
        p_step, acc, dlg, perf, _ = sm.spr1_step_miss(
            keys[i], p_step, L, a, jnp.float64(t_max_tip), WRB=WRB, WH_=WH_)
        acc2 += int(acc)
        dlg2 += float(dlg)
    assert int(n_acc) == acc2
    for k in p:
        np.testing.assert_array_equal(np.asarray(p_sweep[k]),
                                      np.asarray(p_step[k]), err_msg=k)
    lg0 = oracles.log_G(tree, MU, np.asarray(a["nu"]), np.asarray(ctx.q),
                        np.asarray(ctx.pi))
    back = sm.unpack_tree_miss(p_sweep, tree)
    back.check_integrity()
    lg1 = oracles.log_G(back, MU, np.asarray(a["nu"]), np.asarray(ctx.q),
                        np.asarray(ctx.pi))
    np.testing.assert_allclose(lg1 - lg0, float(dlg_tot), rtol=1e-9,
                               atol=1e-8)
