"""Jitted SPR1 building blocks (ops/spr_move.py) vs host oracles on
missation-free trees."""

import numpy as np
import jax.numpy as jnp

import oracles
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree, NO_NODE
from delphy_tpu.evo import make_evo_params
from delphy_tpu.ops.spr_move import (pack_tree, unpack_tree, detach_attach,
                                     branch_log_G, log_alpha_mut)


def _no_miss_tree(T=12, L=150, seed=5):
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=6e-3, missing_fraction=0.0, seed=seed)
    rng = np.random.default_rng(seed)
    return build_random_tree(ref, deltas, [[] for _ in range(T)], dates,
                             names=names, rng=rng), rng


def _evo(L, rng):
    return make_evo_params(L, mu=6e-3, kappa=2.0, pi=(0.3, 0.2, 0.3, 0.2),
                           nu=rng.gamma(8.0, 1 / 8.0, size=L))


def _logG(tree, evo):
    return oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                         np.asarray(evo.q), np.asarray(evo.pi))


def test_pack_unpack_identity():
    tree, rng = _no_miss_tree()
    evo = _evo(tree.num_sites, rng)
    p = pack_tree(tree)
    back = unpack_tree(p, tree)
    back.check_integrity()
    np.testing.assert_allclose(_logG(back, evo), _logG(tree, evo), rtol=1e-12)


def test_detach_attach_roundtrip_restores_log_G():
    """Detach X and re-attach at the identical position with the identical
    branch history: the resulting tree must have the same log_G and pass
    integrity (node id P is reused; S/X child order is canonical)."""
    tree, rng = _no_miss_tree(seed=7)
    evo = _evo(tree.num_sites, rng)
    lg0 = _logG(tree, evo)
    p0 = pack_tree(tree)
    W = int(np.asarray(p0["msite"]).shape[1])

    n_done = 0
    for X in range(tree.num_nodes):
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        if P == tree.root:
            continue  # v1 restriction: inner moves only
        a, b = tree.children[P]
        S = int(b) if int(a) == X else int(a)
        t_P = float(tree.t[P])
        h = np.asarray(p0["msite"][X]), np.asarray(p0["mfrom"][X]), \
            np.asarray(p0["mto"][X]), np.asarray(p0["mt"][X]), \
            int(np.asarray(p0["mcount"][X]))
        p1 = detach_attach(p0, jnp.int32(X), jnp.int32(S),
                           jnp.float64(t_P), jnp.asarray(h[0]),
                           jnp.asarray(h[1]), jnp.asarray(h[2]),
                           jnp.asarray(h[3]), jnp.int32(h[4]))
        back = unpack_tree(p1, tree)
        back.check_integrity()
        np.testing.assert_allclose(_logG(back, evo), lg0, rtol=1e-10)
        n_done += 1
    assert n_done >= 5


def test_branch_log_G_matches_host():
    from delphy_tpu.topo.graft import SprContext
    tree, rng = _no_miss_tree(seed=9)
    evo = _evo(tree.num_sites, rng)
    ctx = SprContext(tree, float(evo.mu), np.asarray(evo.nu),
                     np.asarray(evo.q), np.asarray(evo.pi))
    p = pack_tree(tree)
    part = jnp.asarray(np.asarray(evo.part, dtype=np.int64))
    qtab = jnp.asarray(np.asarray(evo.q_tab, dtype=np.float64).reshape(-1))
    # per-partition escape rates: qatab[p*4 + a] = -q[p][a][a]
    q_tab_np = np.asarray(evo.q_tab, dtype=np.float64)
    qatab = jnp.asarray(
        np.stack([-np.diag(q_tab_np.reshape(-1, 4, 4)[i])
                  for i in range(q_tab_np.reshape(-1, 4, 4).shape[0])])
        .reshape(-1))
    for X in range(tree.num_nodes):
        if X == tree.root or not tree.mutations[X]:
            continue
        P = int(tree.parent[X])
        lam_X = ctx.lambda_at(X)
        want = ctx.branch_log_G(float(tree.t[P]), float(tree.t[X]), lam_X,
                                tree.mutations[X])
        got = float(branch_log_G(
            jnp.float64(tree.t[P]), jnp.float64(tree.t[X]),
            jnp.float64(lam_X), p["msite"][X], p["mfrom"][X], p["mto"][X],
            p["mt"][X], p["mcount"][X], jnp.float64(evo.mu),
            jnp.asarray(np.asarray(evo.nu, dtype=np.float64)), qtab, qatab,
            part))
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_log_alpha_mut_matches_host_graft():
    from delphy_tpu.topo.graft import SprContext
    tree, rng = _no_miss_tree(seed=11)
    evo = _evo(tree.num_sites, rng)
    ctx = SprContext(tree, float(evo.mu), np.asarray(evo.nu),
                     np.asarray(evo.q), np.asarray(evo.pi))
    L = tree.num_sites
    checked = 0
    for X in range(tree.num_nodes):
        if X == tree.root or int(tree.parent[X]) == tree.root:
            continue
        ctx.begin_move()
        g = ctx.analyze_graft(X)
        if g.rooty or len(g.branch_infos) != 1:
            continue
        bi = g.branch_infos[0]
        mu_prop = ctx.mu_proposal
        got = float(log_alpha_mut(
            jnp.float64(L), jnp.float64(bi.T_to_X),
            jnp.float64(len(bi.hot_muts_to_X)),
            jnp.float64(len(bi.hot_deltas_to_X)), jnp.float64(mu_prop)))
        np.testing.assert_allclose(got, g.log_alpha_mut, rtol=1e-12)
        checked += 1
    assert checked >= 5


def test_deltas_between_dev_matches_host():
    from delphy_tpu.topo import site_deltas as sd
    from delphy_tpu.ops.spr_move import deltas_between_dev

    tree, rng = _no_miss_tree(T=14, L=120, seed=13)
    p = pack_tree(tree)
    checked = 0
    for trial in range(30):
        ba = int(rng.integers(0, tree.num_nodes))
        bb = int(rng.integers(0, tree.num_nodes))
        if ba == tree.root or bb == tree.root:
            continue
        ta = float(rng.uniform(tree.t[int(tree.parent[ba])], tree.t[ba]))
        tb = float(rng.uniform(tree.t[int(tree.parent[bb])], tree.t[bb]))
        want = sd.deltas_between(tree, (ba, ta), (bb, tb))
        s, f, t_, cnt, ok = deltas_between_dev(
            p, jnp.int32(ba), jnp.float64(ta), jnp.int32(bb),
            jnp.float64(tb))
        assert bool(ok)
        got = {int(s[i]): (int(f[i]), int(t_[i])) for i in range(int(cnt))}
        assert got == want, (trial, ba, bb, got, want)
        checked += 1
    assert checked >= 15


def test_study_regions_matches_host_peeled_builder():
    """study_regions (padded tree -> flood -> detachment rewrites) equals
    the host builder run exactly as mixer._spr1 does: analyze + peel, then
    seed at (old_S, 0) with the closed deltas, can_change_root=False."""
    from delphy_tpu.topo.graft import SprContext
    from delphy_tpu.topo.mixer import TopologyMixer
    from delphy_tpu.ops.spr_move import study_regions, compose_events
    from delphy_tpu.topo.study import SprStudyBuilder

    tree, rng = _no_miss_tree(T=14, L=150, seed=17)
    evo = _evo(tree.num_sites, rng)

    checked = 0
    for trial in range(25):
        work = tree.copy()
        ctx = SprContext(work, float(evo.mu), np.asarray(evo.nu),
                         np.asarray(evo.q), np.asarray(evo.pi),
                         can_change_root=False)
        X = int(rng.integers(0, work.num_nodes))
        if X == work.root or int(work.parent[X]) == work.root:
            continue
        P = int(work.parent[X])
        a, b = work.children[P]
        S = int(b) if int(a) == X else int(a)
        t_X = float(work.t[X])

        ctx.begin_move()
        g = ctx.analyze_graft(X)
        ctx.peel_graft(g)
        d0 = TopologyMixer._summarize_closed(ctx, g)
        builder = SprStudyBuilder(work, X, t_X, set(), max_muts_from_start=1)
        builder.seed_fill_from(S, 0, d0, False)
        host = sorted((r.branch, r.mut_idx, round(r.t_min, 10),
                       round(r.t_max, 10), r.min_muts)
                      for r in builder.result)

        # device: pack the PRE-peel tree; d0 from the composed X row
        p = pack_tree(tree)
        W = int(np.asarray(p["msite"]).shape[1])
        ds, df, dt_, dc = compose_events(
            p["msite"][X], p["mfrom"][X], p["mto"][X],
            jnp.arange(W) < p["mcount"][X])
        assert {int(ds[i]): (int(df[i]), int(dt_[i]))
                for i in range(int(dc))} == d0
        reg = study_regions(p, jnp.int32(X), jnp.float64(t_X),
                            ds, dt_, dc, jnp.int32(S))
        alive = np.asarray(reg["alive"])
        got = sorted(
            (int(np.asarray(reg["branch"])[r]),
             int(np.asarray(reg["mut_idx"])[r]),
             round(float(np.asarray(reg["t_min"])[r]), 10),
             round(float(np.asarray(reg["t_max"])[r]), 10),
             int(np.asarray(reg["mm"])[r]))
            for r in np.nonzero(alive)[0])
        assert got == host, (trial, X, S, len(got), len(host))
        checked += 1
    assert checked >= 10


def test_jit_spr1_step_chain_ledger_and_integrity():
    """Run a chain of jitted SPR1 moves: every accepted move's delta_log_G
    must equal the oracle log_G difference exactly, the tree must stay
    valid, tip data preserved, and some moves must accept."""
    import jax
    from delphy_tpu.ops.spr_move import spr1_step

    # realistic per-site-per-day rate (pathogen-scale mu*T per branch ~0.1,
    # cf. BASELINE configs): the proposal's delta/round-trip site counts
    # then fit the kernel's H_D/H_RT slots with room to spare
    MU = 4e-4
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        12, 300, mu=MU, missing_fraction=0.0, seed=19)
    rng = np.random.default_rng(19)
    tree = build_random_tree(ref, deltas, [[] for _ in range(12)], dates,
                             names=names, rng=rng)
    from delphy_tpu.evo import make_evo_params
    evo = make_evo_params(tree.num_sites, mu=MU, kappa=2.0,
                          pi=(0.3, 0.2, 0.3, 0.2),
                          nu=rng.gamma(8.0, 1 / 8.0, size=tree.num_sites))
    L = tree.num_sites
    p = pack_tree(tree)  # auto W covers the root-delta row
    ref_seq = jnp.asarray(np.asarray(tree.ref_seq, dtype=np.int32))
    nu = jnp.asarray(np.asarray(evo.nu, dtype=np.float64))
    part = jnp.asarray(np.asarray(evo.part, dtype=np.int64))
    q3 = np.asarray(evo.q_tab, dtype=np.float64).reshape(-1, 4, 4)
    qtab = jnp.asarray(q3.reshape(-1))
    qatab = jnp.asarray(np.stack([-np.diag(q3[i]) for i in range(q3.shape[0])]
                                 ).reshape(-1))
    # lambda_ref = sum_l mu * nu_l * qa(l, ref_l)
    ref_np = np.asarray(tree.ref_seq)
    part_np = np.asarray(evo.part)
    qa_np = np.stack([-np.diag(q3[i]) for i in range(q3.shape[0])])
    lambda_ref = float(np.sum(float(evo.mu) * np.asarray(evo.nu)
                              * qa_np[part_np, ref_np]))
    t_max_tip = float(np.max(np.asarray(tree.t_max)[:tree.num_tips]))

    lg = _logG(tree, evo)
    key = jax.random.PRNGKey(2)
    n_acc = n_elig = 0
    tip_seqs = [tree.sequence_at(i).copy() for i in range(tree.num_tips)]
    for it in range(120):
        key, k = jax.random.split(key)
        p2, acc, dlg, elig, diag = spr1_step(
            k, p, ref_seq, L, jnp.float64(evo.mu), nu, qtab, qatab, part,
            jnp.float64(lambda_ref), jnp.float64(t_max_tip))
        n_elig += int(elig)
        if bool(acc):
            n_acc += 1
            back = unpack_tree(p2, tree)
            back.check_integrity()
            lg2 = _logG(back, evo)
            np.testing.assert_allclose(lg2 - lg, float(dlg),
                                       rtol=1e-9, atol=1e-9)
            lg = lg2
            # tip data preserved
            for i in range(back.num_tips):
                assert (back.sequence_at(i) == tip_seqs[i]).all(), i
            p = p2
    assert n_elig >= 40, n_elig
    assert n_acc >= 5, n_acc


def test_jit_spr1_sweep_matches_stepwise():
    """spr1_sweep (lax.scan of n moves in one program) equals the python
    loop of spr1_step on the same keys, and its accumulated delta_log_G
    matches the oracle recompute."""
    import jax
    from delphy_tpu.ops.spr_move import spr1_step, spr1_sweep

    MU = 4e-4
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        10, 250, mu=MU, missing_fraction=0.0, seed=23)
    rng = np.random.default_rng(23)
    tree = build_random_tree(ref, deltas, [[] for _ in range(10)], dates,
                             names=names, rng=rng)
    from delphy_tpu.evo import make_evo_params
    evo = make_evo_params(tree.num_sites, mu=MU, kappa=2.0,
                          pi=(0.25,) * 4,
                          nu=rng.gamma(8.0, 1 / 8.0, size=tree.num_sites))
    L = tree.num_sites
    p0 = pack_tree(tree)
    ref_seq = jnp.asarray(np.asarray(tree.ref_seq, dtype=np.int32))
    nu = jnp.asarray(np.asarray(evo.nu))
    part = jnp.asarray(np.asarray(evo.part, dtype=np.int64))
    q3 = np.asarray(evo.q_tab, dtype=np.float64).reshape(-1, 4, 4)
    qtab = jnp.asarray(q3.reshape(-1))
    qa_np = np.stack([-np.diag(q3[i]) for i in range(q3.shape[0])])
    qatab = jnp.asarray(qa_np.reshape(-1))
    lambda_ref = float(np.sum(MU * np.asarray(evo.nu)
                              * qa_np[np.asarray(evo.part),
                                      np.asarray(tree.ref_seq)]))
    t_max_tip = float(np.max(np.asarray(tree.t_max)[:10]))
    args = (ref_seq, L, jnp.float64(MU), nu, qtab, qatab, part,
            jnp.float64(lambda_ref), jnp.float64(t_max_tip))

    key = jax.random.PRNGKey(9)
    n = 48
    p_sw, n_acc, dlg_tot, n_el = spr1_sweep(
        key, p0, ref_seq, L, n, jnp.float64(MU), nu, qtab, qatab, part,
        jnp.float64(lambda_ref), jnp.float64(t_max_tip))

    # stepwise replay with the same key schedule
    p = p0
    dlg_sum = 0.0
    acc_sum = 0
    for k in jax.random.split(key, n):
        p, acc, dlg, elig, _ = spr1_step(k, p, *args)
        dlg_sum += float(dlg)
        acc_sum += int(acc)
    assert acc_sum == int(n_acc) and acc_sum >= 2
    np.testing.assert_allclose(float(dlg_tot), dlg_sum, rtol=1e-12)
    for name in ("parent", "children", "t", "mcount"):
        np.testing.assert_array_equal(np.asarray(p_sw[name]),
                                      np.asarray(p[name]))

    # oracle: the accumulated delta equals the total log_G change
    evo_ = evo
    before = _logG(tree, evo_)
    after_tree = unpack_tree(p_sw, tree)
    after_tree.check_integrity()
    after = _logG(after_tree, evo_)
    np.testing.assert_allclose(after - before, float(dlg_tot),
                               rtol=1e-9, atol=1e-9)


def test_jit_slide_step_chain_ledger_and_integrity():
    """Chain of jitted subtree-slide moves: oracle ledger identity on every
    accepted move, integrity + tip data preserved, some accepts."""
    import jax
    from delphy_tpu.ops.spr_move import slide_step

    MU = 4e-4
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        12, 300, mu=MU, missing_fraction=0.0, seed=29)
    rng = np.random.default_rng(29)
    tree = build_random_tree(ref, deltas, [[] for _ in range(12)], dates,
                             names=names, rng=rng)
    from delphy_tpu.evo import make_evo_params
    evo = make_evo_params(tree.num_sites, mu=MU, kappa=2.0, pi=(0.25,) * 4,
                          nu=rng.gamma(8.0, 1 / 8.0, size=tree.num_sites))
    L = tree.num_sites
    p = pack_tree(tree)
    ref_seq = jnp.asarray(np.asarray(tree.ref_seq, dtype=np.int32))
    nu = jnp.asarray(np.asarray(evo.nu))
    part = jnp.asarray(np.asarray(evo.part, dtype=np.int64))
    q3 = np.asarray(evo.q_tab, dtype=np.float64).reshape(-1, 4, 4)
    qtab = jnp.asarray(q3.reshape(-1))
    qa_np = np.stack([-np.diag(q3[i]) for i in range(q3.shape[0])])
    qatab = jnp.asarray(qa_np.reshape(-1))
    lambda_ref = float(np.sum(MU * np.asarray(evo.nu)
                              * qa_np[np.asarray(evo.part),
                                      np.asarray(tree.ref_seq)]))
    t_max_tip = float(np.max(np.asarray(tree.t_max)[:12]))

    lg = _logG(tree, evo)
    key = jax.random.PRNGKey(4)
    n_acc = n_elig = 0
    tip_seqs = [tree.sequence_at(i).copy() for i in range(tree.num_tips)]
    for it in range(150):
        key, k = jax.random.split(key)
        p2, acc, dlg, elig = slide_step(
            k, p, ref_seq, L, jnp.float64(MU), nu, qtab, qatab, part,
            jnp.float64(lambda_ref), jnp.float64(t_max_tip))
        n_elig += int(elig)
        if bool(acc):
            n_acc += 1
            back = unpack_tree(p2, tree)
            back.check_integrity()
            lg2 = _logG(back, evo)
            np.testing.assert_allclose(lg2 - lg, float(dlg),
                                       rtol=1e-9, atol=1e-9)
            lg = lg2
            for i in range(back.num_tips):
                assert (back.sequence_at(i) == tip_seqs[i]).all(), i
            p = p2
    assert n_elig >= 50, n_elig
    assert n_acc >= 10, n_acc


def test_jit_spr1_sweep_vmaps_over_chains():
    """spr1_sweep vmaps over a batch of independent chains (shape-uniform
    packed trees): each lane equals its own single-chain run — the
    multi-chain data-parallel shape on device."""
    import jax
    from delphy_tpu.ops.spr_move import spr1_sweep

    MU = 4e-4
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        10, 250, mu=MU, missing_fraction=0.0, seed=23)
    rng = np.random.default_rng(23)
    tree = build_random_tree(ref, deltas, [[] for _ in range(10)], dates,
                             names=names, rng=rng)
    from delphy_tpu.evo import make_evo_params
    evo = make_evo_params(tree.num_sites, mu=MU, kappa=2.0, pi=(0.25,) * 4,
                          nu=rng.gamma(8.0, 1 / 8.0, size=tree.num_sites))
    L = tree.num_sites
    p0 = pack_tree(tree)
    ref_seq = jnp.asarray(np.asarray(tree.ref_seq, dtype=np.int32))
    nu = jnp.asarray(np.asarray(evo.nu))
    part = jnp.asarray(np.asarray(evo.part, dtype=np.int64))
    q3 = np.asarray(evo.q_tab, dtype=np.float64).reshape(-1, 4, 4)
    qtab = jnp.asarray(q3.reshape(-1))
    qa_np = np.stack([-np.diag(q3[i]) for i in range(q3.shape[0])])
    qatab = jnp.asarray(qa_np.reshape(-1))
    lambda_ref = float(np.sum(MU * np.asarray(evo.nu)
                              * qa_np[np.asarray(evo.part),
                                      np.asarray(tree.ref_seq)]))
    t_max_tip = float(np.max(np.asarray(tree.t_max)[:10]))

    B, n = 3, 24
    keys = jax.random.split(jax.random.PRNGKey(31), B)
    pB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), p0)
    run_one = lambda k, pp: spr1_sweep(
        k, pp, ref_seq, L, n, jnp.float64(MU), nu, qtab, qatab, part,
        jnp.float64(lambda_ref), jnp.float64(t_max_tip))
    pB2, n_accB, dlgB, n_elB = jax.vmap(run_one)(keys, pB)

    for b in range(B):
        p_i, n_acc_i, dlg_i, _ = run_one(keys[b], p0)
        assert int(n_accB[b]) == int(n_acc_i)
        np.testing.assert_allclose(float(dlgB[b]), float(dlg_i), rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(pB2["parent"][b]),
                                      np.asarray(p_i["parent"]))
    assert int(n_accB.sum()) >= 2


def test_straddling_mask_matches_host_enumeration():
    """_straddling_mask equals the host's enumerate_straddling at the
    slide's call-site configurations (t_cut strictly below anc's time never
    occurs there: anc is an ancestor being slid through, so t_cut > t[anc])
    — this pins the Hastings-ratio inputs the ledger tests cannot see."""
    from delphy_tpu.topo.mixer import _enumerate_straddling
    from delphy_tpu.ops.spr_move import _straddling_mask

    tree, rng = _no_miss_tree(T=14, L=100, seed=37)
    p = pack_tree(tree)
    parent = p["parent"]
    t = p["t"]
    N = tree.num_nodes
    checked = 0
    for trial in range(60):
        anc = int(rng.integers(0, N))
        if tree.is_tip(anc):
            continue
        X = int(rng.integers(0, N))
        if X == tree.root:
            continue
        # call-site shape: t_cut strictly later than anc's time, within the
        # subtree's time range
        t_cut = float(rng.uniform(tree.t[anc] + 1e-9,
                                  np.max(np.asarray(tree.t)) + 1.0))
        want = []
        _enumerate_straddling(tree, anc, t_cut, X, want)
        # host starts at anc: with t_cut > t[anc] it always recurses, so anc
        # itself is excluded — matching the mask's semantics
        got = sorted(np.nonzero(np.asarray(_straddling_mask(
            parent, t, jnp.int32(anc), jnp.float64(t_cut), jnp.int32(X),
            p["root"])))[0].tolist())
        assert got == sorted(want), (trial, anc, X, t_cut, got, want)
        checked += 1
    assert checked >= 15


def test_jit_mixed_move_chain_stress():
    """600 alternating SPR1/slide moves: ledger identity at the end (total
    accumulated delta == oracle diff), integrity + tip data preserved."""
    import jax
    from delphy_tpu.ops.spr_move import spr1_step, slide_step

    MU = 4e-4
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        14, 250, mu=MU, missing_fraction=0.0, seed=41)
    rng = np.random.default_rng(41)
    tree = build_random_tree(ref, deltas, [[] for _ in range(14)], dates,
                             names=names, rng=rng)
    from delphy_tpu.evo import make_evo_params
    evo = make_evo_params(tree.num_sites, mu=MU, kappa=2.0, pi=(0.25,) * 4,
                          nu=rng.gamma(8.0, 1 / 8.0, size=tree.num_sites))
    L = tree.num_sites
    p = pack_tree(tree)
    ref_seq = jnp.asarray(np.asarray(tree.ref_seq, dtype=np.int32))
    nu = jnp.asarray(np.asarray(evo.nu))
    part = jnp.asarray(np.asarray(evo.part, dtype=np.int64))
    q3 = np.asarray(evo.q_tab, dtype=np.float64).reshape(-1, 4, 4)
    qtab = jnp.asarray(q3.reshape(-1))
    qa_np = np.stack([-np.diag(q3[i]) for i in range(q3.shape[0])])
    qatab = jnp.asarray(qa_np.reshape(-1))
    lambda_ref = float(np.sum(MU * np.asarray(evo.nu)
                              * qa_np[np.asarray(evo.part),
                                      np.asarray(tree.ref_seq)]))
    t_max_tip = float(np.max(np.asarray(tree.t_max)[:14]))
    args = (ref_seq, L, jnp.float64(MU), nu, qtab, qatab, part,
            jnp.float64(lambda_ref), jnp.float64(t_max_tip))

    lg0 = _logG(tree, evo)
    key = jax.random.PRNGKey(6)
    dlg_total = 0.0
    n_acc = 0
    for it in range(600):
        key, k = jax.random.split(key)
        if it % 2 == 0:
            p2, acc, dlg, _, _ = spr1_step(k, p, *args)
        else:
            p2, acc, dlg, _ = slide_step(k, p, *args)
        if bool(acc):
            n_acc += 1
            dlg_total += float(dlg)
            p = p2
    back = unpack_tree(p, tree)
    back.check_integrity()
    np.testing.assert_allclose(_logG(back, evo) - lg0, dlg_total,
                               rtol=1e-8, atol=1e-8)
    for i in range(back.num_tips):
        assert (back.sequence_at(i) == tree.sequence_at(i)).all()
    assert n_acc >= 30, n_acc
