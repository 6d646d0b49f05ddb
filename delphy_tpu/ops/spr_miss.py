"""Jitted SPR machinery for trees WITH missations (inner moves,
can_change_root=False — the per-part production regime: only the one part
containing the global root runs rooty moves, topo/parallel.py:97).

This extends the missation-free device move (ops/spr_move.py) with the
reference's warm/hot missation machinery (core/spr_move.cpp:9-316,
868-1070) re-designed as fixed-shape array programs:

- per-branch missations as padded interval-run rows (ops/runset.py) plus
  small from-state rows (site, state) — the device twin of the native
  kernel's interval-run `Sites` + flat fs maps (topo_native.cpp);
- the graft analysis's sliding-set walk (host: topo/graft.py _start_inner)
  as a bounded lax.while whose per-level set ops are run-row merges;
- peel/apply mutation slides with per-sibling from-state updates as bounded
  path loops over the fs rows;
- detach/attach missation factoring (host: graft.py move(); native:
  topo_native.cpp SprContext::move) as run unions/minus/intersections with
  fixed caps — cap overflow rejects the proposal (same contract as the
  delta buffers in ops/spr_move.py).

All host-twin formulas cite topo/graft.py, which is itself pinned
move-for-move to the native production kernel (tests/test_native_topo.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..phylo import FlatTree, Mutation
from . import runset as rsn
from .spr_move import (P_MAX, D_MAX, BIG_T, compose_events, branch_log_G,
                       detach, attach, deltas_between_dev)

BI_MAX = 8    # branch-info slots for the sliding walk (host walk depth)
WF = 16       # from-state row slots per node
WH = 64       # hot-mutation / hot-delta slots per branch info


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------

def pack_tree_miss(tree: FlatTree, W: int | None = None,
                   WR: int | None = None, WF_: int | None = None):
    """FlatTree -> padded rows: mutations (as ops/spr_move.pack_tree) plus
    missation run rows (N, WR) and from-state rows (N, WF)."""
    N = tree.num_nodes
    counts = np.array([len(tree.mutations[b]) for b in range(N)])
    if W is None:
        W = int(max(8, 2 * counts.max() + 4))
    rcounts = np.array([len(tree.miss_intervals[b]) for b in range(N)])
    if WR is None:
        WR = int(max(8, 2 * rcounts.max() + 4))
    fcounts = np.array([len(tree.miss_from_states[b]) for b in range(N)])
    wf = WF_ if WF_ is not None else int(max(WF, 2 * fcounts.max() + 4))

    msite = np.full((N, W), -1, dtype=np.int32)
    mfrom = np.zeros((N, W), dtype=np.int32)
    mto = np.zeros((N, W), dtype=np.int32)
    mt = np.full((N, W), np.inf)
    rs = np.full((N, WR), int(rsn.BIG), np.int32)
    re = np.full((N, WR), int(rsn.BIG), np.int32)
    fsite = np.full((N, wf), -1, np.int32)
    fstate = np.zeros((N, wf), np.int32)
    for b in range(N):
        for i, m in enumerate(tree.mutations[b]):
            msite[b, i], mfrom[b, i], mto[b, i], mt[b, i] = \
                m.site, m.from_, m.to, m.t
        for i, (s, e) in enumerate(tree.miss_intervals[b]):
            rs[b, i], re[b, i] = s, e
        for i, (s, f) in enumerate(sorted(tree.miss_from_states[b].items())):
            fsite[b, i], fstate[b, i] = s, f
    return dict(
        parent=jnp.asarray(np.asarray(tree.parent, dtype=np.int32)),
        children=jnp.asarray(np.asarray(tree.children, dtype=np.int32)),
        t=jnp.asarray(np.asarray(tree.t, dtype=np.float64)),
        mcount=jnp.asarray(counts.astype(np.int32)),
        msite=jnp.asarray(msite), mfrom=jnp.asarray(mfrom),
        mto=jnp.asarray(mto), mt=jnp.asarray(mt),
        rs=jnp.asarray(rs), re=jnp.asarray(re),
        rcnt=jnp.asarray(rcounts.astype(np.int32)),
        fsite=jnp.asarray(fsite), fstate=jnp.asarray(fstate),
        fcnt=jnp.asarray(fcounts.astype(np.int32)),
        root=jnp.int32(int(tree.root)),
    )


def unpack_tree_miss(p, tree_template: FlatTree) -> FlatTree:
    out = tree_template.copy()
    out.parent = np.asarray(p["parent"], dtype=out.parent.dtype)
    out.children = np.asarray(p["children"], dtype=out.children.dtype)
    out.t = np.asarray(p["t"], dtype=np.float64)
    N = out.num_nodes
    mc = np.asarray(p["mcount"])
    ms, mf, mtt, mti = (np.asarray(p["msite"]), np.asarray(p["mfrom"]),
                        np.asarray(p["mto"]), np.asarray(p["mt"]))
    out.mutations = [
        [Mutation(site=int(ms[b, i]), from_=int(mf[b, i]), to=int(mtt[b, i]),
                  t=float(mti[b, i])) for i in range(int(mc[b]))]
        for b in range(N)
    ]
    rs, re, rc = np.asarray(p["rs"]), np.asarray(p["re"]), np.asarray(p["rcnt"])
    out.miss_intervals = [
        [(int(rs[b, i]), int(re[b, i])) for i in range(int(rc[b]))]
        for b in range(N)
    ]
    fsi, fst, fc = (np.asarray(p["fsite"]), np.asarray(p["fstate"]),
                    np.asarray(p["fcnt"]))
    # fs rows may be unsorted / contain holes after device surgery: collect
    # the first fcnt ACTIVE lanes (site >= 0)
    out.miss_from_states = []
    for b in range(N):
        d = {}
        for i in range(fsi.shape[1]):
            if fsi[b, i] >= 0:
                d[int(fsi[b, i])] = int(fst[b, i])
        out.miss_from_states.append(d)
    return out


# ---------------------------------------------------------------------------
# From-state row ops (small fixed rows; absent site => ref state)
# ---------------------------------------------------------------------------

def fs_get(fsite_row, fstate_row, ref_seq, site):
    """graft.py _get_from_state: row value or ref."""
    hit = fsite_row == site
    return jnp.where(jnp.any(hit),
                     jnp.sum(jnp.where(hit, fstate_row, 0)),
                     ref_seq[jnp.maximum(site, 0)].astype(jnp.int32))


def fs_set(fsite_row, fstate_row, ref_seq, site, state):
    """graft.py _set_from_state: ref state erases, else upsert.  Returns
    (fsite, fstate, ok); ok=False when an append finds no free lane."""
    is_ref = state == ref_seq[jnp.maximum(site, 0)].astype(jnp.int32)
    hit = fsite_row == site
    present = jnp.any(hit)
    # erase
    fsite_e = jnp.where(hit, -1, fsite_row)
    # update in place
    fstate_u = jnp.where(hit, state, fstate_row)
    # append into the first free lane
    free = fsite_row < 0
    first_free = jnp.argmax(free)
    can_append = jnp.any(free)
    fsite_a = fsite_row.at[first_free].set(jnp.int32(site))
    fstate_a = fstate_row.at[first_free].set(jnp.int32(state))
    fsite_out = jnp.where(is_ref, fsite_e,
                          jnp.where(present, fsite_row,
                                    jnp.where(can_append, fsite_a,
                                              fsite_row)))
    fstate_out = jnp.where(is_ref, fstate_row,
                           jnp.where(present, fstate_u,
                                     jnp.where(can_append, fstate_a,
                                               fstate_row)))
    ok = is_ref | present | can_append
    return fsite_out, fstate_out, ok


# ---------------------------------------------------------------------------
# Read-side lambda math (host twins: graft.py SprContext)
# ---------------------------------------------------------------------------

def _qa_at(qatab, part, site, state):
    s = jnp.maximum(site, 0)
    return qatab[part[s] * 4 + state]


def delta_lambda_across_branch_dev(p, node, mu, nu, qatab, part, ref_cum_Q,
                                   ref_seq):
    """graft.py delta_lambda_across_branch: mutation terms + run-telescoped
    missation subtraction + from-state corrections."""
    W = p["msite"].shape[1]
    sel = jnp.arange(W) < p["mcount"][node]
    s = jnp.maximum(p["msite"][node], 0)
    dmut = mu * nu[s] * (_qa_at(qatab, part, s, p["mto"][node])
                         - _qa_at(qatab, part, s, p["mfrom"][node]))
    out = jnp.sum(jnp.where(sel, dmut, 0.0))
    WR = p["rs"].shape[1]
    rsel = jnp.arange(WR) < p["rcnt"][node]
    rlo = jnp.clip(p["rs"][node], 0, ref_cum_Q.shape[0] - 1)
    rhi = jnp.clip(p["re"][node], 0, ref_cum_Q.shape[0] - 1)
    out -= jnp.sum(jnp.where(rsel, ref_cum_Q[rhi] - ref_cum_Q[rlo], 0.0))
    fsel = p["fsite"][node] >= 0
    fsi = jnp.maximum(p["fsite"][node], 0)
    dfs = mu * nu[fsi] * (_qa_at(qatab, part, fsi, p["fstate"][node])
                          - _qa_at(qatab, part, fsi,
                                   ref_seq[fsi].astype(jnp.int32)))
    out -= jnp.sum(jnp.where(fsel, dfs, 0.0))
    return out


def lambda_at_dev_miss(p, X, lambda_ref, mu, nu, qatab, part, ref_cum_Q,
                       ref_seq):
    """graft.py lambda_at: bounded root walk."""
    def cond(c):
        cur, acc, steps = c
        return (cur >= 0) & (steps < P_MAX)

    def body(c):
        cur, acc, steps = c
        acc = acc + delta_lambda_across_branch_dev(
            p, jnp.maximum(cur, 0), mu, nu, qatab, part, ref_cum_Q, ref_seq)
        return p["parent"][jnp.maximum(cur, 0)], acc, steps + 1

    _, acc, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(X, jnp.int32), 0.0, jnp.int32(0)))
    return lambda_ref + acc


def num_missing_at_dev(p, X):
    def cond(c):
        cur, acc, steps = c
        return (cur >= 0) & (steps < P_MAX)

    def body(c):
        cur, acc, steps = c
        n = jnp.maximum(cur, 0)
        acc = acc + rsn.row_size(p["rs"][n], p["re"][n], p["rcnt"][n])
        return p["parent"][n], acc, steps + 1

    _, acc, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(X, jnp.int32), jnp.int32(0), jnp.int32(0)))
    return acc


def missing_at_row(p, X, WR_out: int):
    """Union of missation runs at or above X as one run row (host
    _is_site_missing_at / native miss_at_or_above).  Returns
    (rs, re, cnt, ok)."""
    def cond(c):
        cur, rs, re, cnt, ok, steps = c
        return (cur >= 0) & (steps < P_MAX)

    def body(c):
        cur, rs, re, cnt, ok, steps = c
        n = jnp.maximum(cur, 0)
        rs2, re2, cnt2, ok2 = rsn.combine(
            rs, re, cnt, p["rs"][n][:WR_out] if p["rs"].shape[1] >= WR_out
            else p["rs"][n], p["re"][n][:WR_out]
            if p["re"].shape[1] >= WR_out else p["re"][n],
            p["rcnt"][n], op="union", WR_out=WR_out)
        return (p["parent"][n], rs2, re2, cnt2, ok & ok2, steps + 1)

    rs0 = jnp.full(WR_out, rsn.BIG, jnp.int32)
    re0 = jnp.full(WR_out, rsn.BIG, jnp.int32)
    _, rs, re, cnt, ok, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(X, jnp.int32), rs0, re0, jnp.int32(0),
                     jnp.bool_(True), jnp.int32(0)))
    return rs, re, cnt, ok


def lam_over_miss_dev(rs, re, cnt, fsite_row, fstate_row, in_set_mask,
                      mu, nu, qatab, part, ref_cum_Q, ref_seq):
    """graft.py _lam_over_miss over a run row + from-state row: the lambda
    contribution of a sliding missation set just above its position.
    `in_set_mask` restricts the fs row to sites in the set (host passes the
    dict already filtered; we re-check membership)."""
    WR = rs.shape[0]
    rsel = jnp.arange(WR) < cnt
    rlo = jnp.clip(rs, 0, ref_cum_Q.shape[0] - 1)
    rhi = jnp.clip(re, 0, ref_cum_Q.shape[0] - 1)
    out = jnp.sum(jnp.where(rsel, ref_cum_Q[rhi] - ref_cum_Q[rlo], 0.0))
    fsel = (fsite_row >= 0) & in_set_mask
    fsi = jnp.maximum(fsite_row, 0)
    corr = mu * nu[fsi] * (_qa_at(qatab, part, fsi, fstate_row)
                           - _qa_at(qatab, part, fsi,
                                    ref_seq[fsi].astype(jnp.int32)))
    return out + jnp.sum(jnp.where(fsel, corr, 0.0))


# ---------------------------------------------------------------------------
# Graft analysis: the sliding-set walk (host twin: graft.py _start_inner,
# can_change_root=False; reference spr_move.cpp:582-740)
# ---------------------------------------------------------------------------


def _widen_row(row, WRB: int):
    """Pad a node-width run row to the analysis width WRB (requires
    WRB >= node width; enforced at trace time)."""
    WRn = row.shape[0]
    assert WRB >= WRn, (WRB, WRn)
    return jnp.concatenate([row, jnp.full(WRB - WRn, rsn.BIG, jnp.int32)]) \
        if WRB > WRn else row


def _sibling_dev(p, parent, child):
    c0 = p["children"][parent, 0]
    c1 = p["children"][parent, 1]
    return jnp.where(c0 == child, c1, c0)


def _mut_dlam(p, node, mu, nu, qatab, part, sign=+1):
    """Sum over node's mutations of mu*nu*(qa(to)-qa(from)) (sign=+1) or the
    reverse (sign=-1)."""
    W = p["msite"].shape[1]
    sel = jnp.arange(W) < p["mcount"][node]
    s = jnp.maximum(p["msite"][node], 0)
    d = mu * nu[s] * (_qa_at(qatab, part, s, p["mto"][node])
                      - _qa_at(qatab, part, s, p["mfrom"][node]))
    return sign * jnp.sum(jnp.where(sel, d, 0.0))


def _first_occurrence_per_site(msite, mask):
    """mask restricted to the FIRST (earliest, rows are time-sorted) masked
    occurrence of each site."""
    W = msite.shape[0]
    same_before = (msite[None, :] == msite[:, None]) & mask[None, :] \
        & (jnp.arange(W)[None, :] < jnp.arange(W)[:, None])
    return mask & ~jnp.any(same_before, axis=1)


def start_inner_dev(p, X, c, WRB: int, WH_: int = WH):
    """Device _start_inner (graft.py:300-397), can_change_root=False.

    Returns (G, ok) where G holds per-branch-info arrays over BI_MAX slots:
      A, B (int32), T (f64), active (bool),
      hot/warm as run rows (BI_MAX, WRB) + counts; slot 0's sets are
      complements (row stores the EXCLUDED sites: empty for warm, miss_S for
      hot) flagged by compl[k],
      plA, plX (f64), hot mutations hm_* (BI_MAX, WH) + hm_cnt,
      hot deltas hd_* (BI_MAX, WH) + hd_cnt (site-sorted).
    """
    mu, nu, qatab, qtab, part = c["mu"], c["nu"], c["qatab"], c["qtab"], \
        c["part"]
    ref_cum_Q, ref_seq, lambda_ref = c["ref_cum_Q"], c["ref_seq"], \
        c["lambda_ref"]
    parent_a, t = p["parent"], p["t"]
    N, W = p["msite"].shape
    WFS = p["fsite"].shape[1]
    root = p["root"]
    X = jnp.asarray(X, jnp.int32)
    P = parent_a[X]
    S = _sibling_dev(p, P, X)
    t_X = t[X]
    t_P = t[P]

    # --- slot 0 (P->X level) ---
    A_arr = jnp.full(BI_MAX, -1, jnp.int32).at[0].set(P)
    B_arr = jnp.full(BI_MAX, -1, jnp.int32).at[0].set(X)
    T_arr = jnp.zeros(BI_MAX).at[0].set(t_X - t_P)
    active = jnp.zeros(BI_MAX, bool).at[0].set(True)
    compl_ = jnp.zeros(BI_MAX, bool).at[0].set(True)
    warm_rs = jnp.full((BI_MAX, WRB), rsn.BIG, jnp.int32)
    warm_re = jnp.full((BI_MAX, WRB), rsn.BIG, jnp.int32)
    warm_cnt = jnp.zeros(BI_MAX, jnp.int32)       # slot 0: excluded = empty
    hot_rs = jnp.full((BI_MAX, WRB), rsn.BIG, jnp.int32)
    hot_re = jnp.full((BI_MAX, WRB), rsn.BIG, jnp.int32)
    hot_cnt = jnp.zeros(BI_MAX, jnp.int32)
    WRn = p["rs"].shape[1]
    hot_rs = hot_rs.at[0].set(_widen_row(p["rs"][S], WRB))
    hot_re = hot_re.at[0].set(_widen_row(p["re"][S], WRB))
    hot_cnt = hot_cnt.at[0].set(p["rcnt"][S])     # excluded = miss_S
    plA = jnp.zeros(BI_MAX)
    plX = jnp.zeros(BI_MAX)

    # sliding set starts as miss_S, sliding from-states as S's fs row
    srs = _widen_row(p["rs"][S], WRB)
    sre = _widen_row(p["re"][S], WRB)
    scnt = p["rcnt"][S]
    sfsite = p["fsite"][S]
    sfstate = p["fstate"][S]

    lam_X_node = lambda_at_dev_miss(p, X, lambda_ref, mu, nu, qatab, part,
                                    ref_cum_Q, ref_seq)
    in_s0 = rsn.contains_many(srs, sre, jnp.maximum(sfsite, 0))
    next_plB = lam_over_miss_dev(srs, sre, scnt, sfsite, sfstate, in_s0,
                                 mu, nu, qatab, part, ref_cum_Q, ref_seq)
    plA0 = lam_X_node + _mut_dlam(p, X, mu, nu, qatab, part, sign=-1) \
        - next_plB
    plA = plA.at[0].set(plA0)

    ok = jnp.bool_(True)

    # --- the sliding walk: levels 1..BI_MAX-1 ---
    def level(i, carry):
        (cur, par, srs, sre, scnt, sfsite, sfstate, partial_lambda, walking,
         ok, A_arr, B_arr, T_arr, active, warm_rs, warm_re, warm_cnt,
         hot_rs, hot_re, hot_cnt, plA) = carry
        k = i + 1
        sib = _sibling_dev(p, par, cur)

        # mutations of cur at sliding sites: lambda flip + from-state slides
        msk = (jnp.arange(W) < p["mcount"][cur]) & rsn.contains_many(
            srs, sre, jnp.maximum(p["msite"][cur], 0))
        s_ = jnp.maximum(p["msite"][cur], 0)
        dl = mu * nu[s_] * (_qa_at(qatab, part, s_, p["mfrom"][cur])
                            - _qa_at(qatab, part, s_, p["mto"][cur]))
        partial_lambda_new = partial_lambda + jnp.sum(
            jnp.where(msk, dl, 0.0))
        first = _first_occurrence_per_site(p["msite"][cur], msk)

        def upd_fs(j, fsfs):
            fsite_r, fstate_r, ok_ = fsfs
            site = p["msite"][cur][j]
            frm = p["mfrom"][cur][j]
            ns, nv, ok2 = fs_set(fsite_r, fstate_r, ref_seq, site, frm)
            do = first[j]
            return (jnp.where(do, ns, fsite_r), jnp.where(do, nv, fstate_r),
                    ok_ & jnp.where(do, ok2, True))

        sfsite_n, sfstate_n, ok_fs = jax.lax.fori_loop(
            0, W, upd_fs, (sfsite, sfstate, jnp.bool_(True)))

        # warm_k = sliding; hot_k = warm - miss(sib); sliding' = warm - hot
        sib_rs = p["rs"][sib]
        sib_re = p["re"][sib]
        h_rs, h_re, h_cnt, ok1 = rsn.combine(
            srs, sre, scnt, _widen_row(sib_rs, WRB), _widen_row(sib_re, WRB),
            p["rcnt"][sib], op="minus", WR_out=WRB)
        n_rs, n_re, n_cnt, ok2 = rsn.combine(
            srs, sre, scnt, h_rs, h_re, h_cnt, op="minus", WR_out=WRB)

        # prune sliding from-states to the new sliding set
        keep_fs = rsn.contains_many(n_rs, n_re, jnp.maximum(sfsite_n, 0)) \
            & (sfsite_n >= 0)
        sfsite_p = jnp.where(keep_fs, sfsite_n, -1)

        in_sn = rsn.contains_many(n_rs, n_re, jnp.maximum(sfsite_p, 0))
        next_plB = lam_over_miss_dev(n_rs, n_re, n_cnt, sfsite_p, sfstate_n,
                                     in_sn, mu, nu, qatab, part, ref_cum_Q,
                                     ref_seq)
        at_root = par == root
        # can_change_root=False at the part root: hot = warm, plA absorbs the
        # remaining sliding lambda (graft.py:359-361)
        h_rs = jnp.where(at_root, srs, h_rs)
        h_re = jnp.where(at_root, sre, h_re)
        h_cnt = jnp.where(at_root, scnt, h_cnt)
        plA_k = jnp.where(at_root, partial_lambda_new,
                          partial_lambda_new - next_plB)

        do = walking
        A_arr = A_arr.at[k].set(jnp.where(do, par, A_arr[k]))
        B_arr = B_arr.at[k].set(jnp.where(do, cur, B_arr[k]))
        T_arr = T_arr.at[k].set(jnp.where(do, t_X - t[par], T_arr[k]))
        active = active.at[k].set(jnp.where(do, True, active[k]))
        warm_rs = warm_rs.at[k].set(jnp.where(do, srs, warm_rs[k]))
        warm_re = warm_re.at[k].set(jnp.where(do, sre, warm_re[k]))
        warm_cnt = warm_cnt.at[k].set(jnp.where(do, scnt, warm_cnt[k]))
        hot_rs = hot_rs.at[k].set(jnp.where(do, h_rs, hot_rs[k]))
        hot_re = hot_re.at[k].set(jnp.where(do, h_re, hot_re[k]))
        hot_cnt = hot_cnt.at[k].set(jnp.where(do, h_cnt, hot_cnt[k]))
        plA = plA.at[k].set(jnp.where(do, plA_k, plA[k]))
        ok = ok & jnp.where(do, ok1 & ok2 & ok_fs, True)

        # advance
        cont = do & ~at_root & (n_cnt > 0)
        cur_n = jnp.where(cont, par, cur)
        par_n = jnp.where(cont, parent_a[jnp.maximum(par, 0)], par)
        srs = jnp.where(do & ~at_root, n_rs, jnp.where(
            do, jnp.full(WRB, rsn.BIG, jnp.int32), srs))
        sre = jnp.where(do & ~at_root, n_re, jnp.where(
            do, jnp.full(WRB, rsn.BIG, jnp.int32), sre))
        scnt = jnp.where(do & ~at_root, n_cnt, jnp.where(do, 0, scnt))
        sfsite_o = jnp.where(do & ~at_root, sfsite_p, jnp.where(
            do, jnp.full(WFS, -1, jnp.int32), sfsite))
        partial_lambda = jnp.where(do, next_plB, partial_lambda)
        walking = cont
        return (cur_n, par_n, srs, sre, scnt, sfsite_o, sfstate_n,
                partial_lambda, walking, ok, A_arr, B_arr, T_arr, active,
                warm_rs, warm_re, warm_cnt, hot_rs, hot_re, hot_cnt, plA)

    walking0 = scnt > 0
    carry = (P, parent_a[P], srs, sre, scnt, sfsite, sfstate, next_plB,
             walking0, ok, A_arr, B_arr, T_arr, active, warm_rs, warm_re,
             warm_cnt, hot_rs, hot_re, hot_cnt, plA)
    carry = jax.lax.fori_loop(0, BI_MAX - 1, level, carry)
    (cur, par, srs, sre, scnt, sfsite, sfstate, partial_lambda, walking,
     ok, A_arr, B_arr, T_arr, active, warm_rs, warm_re, warm_cnt,
     hot_rs, hot_re, hot_cnt, plA) = carry
    ok = ok & ~walking  # walk exhausted BI_MAX levels

    # --- distribute hot mutations along the hot path (graft.py:373-386) ---
    # candidates: all mutations of every active bi's branch B_i
    Bc = jnp.maximum(B_arr, 0)
    cand_site = p["msite"][Bc]            # (BI, W)
    cand_from = p["mfrom"][Bc]
    cand_to = p["mto"][Bc]
    cand_t = p["mt"][Bc]
    cand_valid = (jnp.arange(W)[None, :] < p["mcount"][Bc][:, None]) \
        & active[:, None]
    # in_warm per source level i (slot 0 warm = ALL sites)
    in_warm = jax.vmap(
        lambda rs_, re_, site: rsn.contains_many(rs_, re_, site))(
        warm_rs, warm_re, jnp.maximum(cand_site, 0))
    in_warm = jnp.where(compl_[:, None], True, in_warm)  # slot0 warm=ALL
    src_ok = cand_valid & in_warm                         # (BI, W)

    def in_hot_row(k, sites):
        m = rsn.contains_many(hot_rs[k], hot_re[k], jnp.maximum(sites, 0))
        return jnp.where(compl_[k], ~m, m)

    flat_site = cand_site.reshape(-1)
    flat_from = cand_from.reshape(-1)
    flat_to = cand_to.reshape(-1)
    flat_t = cand_t.reshape(-1)
    flat_src = jnp.repeat(jnp.arange(BI_MAX), W)
    flat_ok = src_ok.reshape(-1)

    def fill_row(k, arrs):
        hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok_ = arrs
        sel = flat_ok & (flat_src <= k) & active[k] \
            & in_hot_row(k, flat_site)
        nsel = jnp.sum(sel).astype(jnp.int32)
        ok_ = ok_ & (nsel <= WH_)
        # time-ascending order = the host's final hot_muts order
        order = jnp.argsort(jnp.where(sel, flat_t, jnp.inf))
        idx = order[:WH_]
        lane = jnp.arange(WH_)
        good = lane < nsel
        hm_s = hm_s.at[k].set(jnp.where(good, flat_site[idx], -1))
        hm_f = hm_f.at[k].set(jnp.where(good, flat_from[idx], 0))
        hm_t2 = hm_t2.at[k].set(jnp.where(good, flat_to[idx], 0))
        hm_tt = hm_tt.at[k].set(jnp.where(good, flat_t[idx], jnp.inf))
        hm_cnt = hm_cnt.at[k].set(nsel)
        return hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok_

    hm_s = jnp.full((BI_MAX, WH_), -1, jnp.int32)
    hm_f = jnp.zeros((BI_MAX, WH_), jnp.int32)
    hm_t2 = jnp.zeros((BI_MAX, WH_), jnp.int32)
    hm_tt = jnp.full((BI_MAX, WH_), jnp.inf)
    hm_cnt = jnp.zeros(BI_MAX, jnp.int32)
    hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok = jax.lax.fori_loop(
        0, BI_MAX, fill_row, (hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok))

    # --- hot deltas (composition in time order) + plX ---
    def per_bi(k):
        ds, df, dt_, dc = compose_events(hm_s[k], hm_f[k], hm_t2[k],
                                         jnp.arange(WH_) < hm_cnt[k])
        s_ = jnp.maximum(hm_s[k], 0)
        dlam = mu * nu[s_] * (_qa_at(qatab, part, s_, hm_t2[k])
                              - _qa_at(qatab, part, s_, hm_f[k]))
        plX_k = plA[k] + jnp.sum(
            jnp.where(jnp.arange(WH_) < hm_cnt[k], dlam, 0.0))
        return ds, df, dt_, dc, plX_k

    hd_s, hd_f, hd_t, hd_cnt, plX = jax.vmap(per_bi)(jnp.arange(BI_MAX))
    plX = jnp.where(active, plX, 0.0)

    n_bi = jnp.sum(active).astype(jnp.int32)
    G = dict(A=A_arr, B=B_arr, T=T_arr, active=active, compl_=compl_,
             warm_rs=warm_rs, warm_re=warm_re, warm_cnt=warm_cnt,
             hot_rs=hot_rs, hot_re=hot_re, hot_cnt=hot_cnt,
             plA=plA, plX=plX,
             hm_s=hm_s, hm_f=hm_f, hm_t2=hm_t2, hm_tt=hm_tt, hm_cnt=hm_cnt,
             hd_s=hd_s, hd_f=hd_f, hd_t=hd_t, hd_cnt=hd_cnt,
             n_bi=n_bi, t_P=t_P, S=S, X=X)
    return G, ok
