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
        # np.array(copy=True): jnp.asarray on CPU can ZERO-COPY a numpy
        # buffer, aliasing the live FlatTree arrays — later host-side tree
        # mutations would silently corrupt the packed tree
        parent=jnp.asarray(np.array(tree.parent, dtype=np.int32, copy=True)),
        children=jnp.asarray(np.array(tree.children, dtype=np.int32,
                                      copy=True)),
        t=jnp.asarray(np.array(tree.t, dtype=np.float64, copy=True)),
        mcount=jnp.asarray(counts.astype(np.int32)),
        msite=jnp.asarray(msite), mfrom=jnp.asarray(mfrom),
        mto=jnp.asarray(mto), mt=jnp.asarray(mt),
        rs=jnp.asarray(rs), re=jnp.asarray(re),
        rcnt=jnp.asarray(rcounts.astype(np.int32)),
        fsite=jnp.asarray(fsite), fstate=jnp.asarray(fstate),
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
    fsi, fst = np.asarray(p["fsite"]), np.asarray(p["fstate"])
    # fs rows may be unsorted / contain holes after device surgery: collect
    # the ACTIVE lanes (site >= 0)
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


def fs_bulk_add(fsite_row, fstate_row, add_site, add_val, add_mask):
    """Append (site, value) pairs into free lanes, all at once.  Pre: the
    added sites are NOT already present in the row (callers add sites the
    node is newly gaining) and values are non-ref.  Returns
    (fsite, fstate, ok); ok=False when free lanes run out."""
    WFn = fsite_row.shape[0]
    A = add_site.shape[0]
    n_add = jnp.sum(add_mask).astype(jnp.int32)
    free = fsite_row < 0
    n_free = jnp.sum(free).astype(jnp.int32)
    ok = n_add <= n_free
    # rank of each added entry among the adds; rank of each free lane
    add_rank = jnp.cumsum(add_mask) - 1
    free_rank = jnp.cumsum(free) - 1
    # free lane index for each rank (scatter free lanes by rank)
    lane_of_rank = jnp.full(WFn + 1, WFn, jnp.int32).at[
        jnp.where(free, free_rank, WFn)].set(
        jnp.arange(WFn, dtype=jnp.int32))[:WFn]
    tgt = jnp.where(add_mask & (add_rank < n_free),
                    lane_of_rank[jnp.clip(add_rank, 0, WFn - 1)], WFn)
    fsite_out = jnp.concatenate(
        [fsite_row, jnp.zeros(1, fsite_row.dtype)]).at[tgt].set(
        jnp.where(add_mask, add_site, 0))[:WFn]
    fstate_out = jnp.concatenate(
        [fstate_row, jnp.zeros(1, fstate_row.dtype)]).at[tgt].set(
        jnp.where(add_mask, add_val, 0))[:WFn]
    # untouched lanes keep their values (scatter only wrote targeted lanes)
    return fsite_out, fstate_out, ok


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

        nf = jnp.sum(first).astype(jnp.int32)
        f_ids = jnp.argsort(~first, stable=True)

        def upd_fs(fsfs):
            i2, fsite_r, fstate_r, ok_ = fsfs
            j = f_ids[i2]
            ns, nv, ok2 = fs_set(fsite_r, fstate_r, ref_seq,
                                 p["msite"][cur][j], p["mfrom"][cur][j])
            return i2 + 1, ns, nv, ok_ & ok2

        _, sfsite_n, sfstate_n, ok_fs = jax.lax.while_loop(
            lambda fsfs: fsfs[0] < nf, upd_fs,
            (jnp.int32(0), sfsite, sfstate, jnp.bool_(True)))

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


# ---------------------------------------------------------------------------
# Finish: delta_log_G + log_alpha_mut (host graft.py _finish_graft_analysis;
# reference spr_move.cpp:246-316, 799-866).  Inner, all-closed variant.
# ---------------------------------------------------------------------------

def finish_dev(p, G, c, mu_prop, L: int):
    mu, nu, qatab, qtab, part = c["mu"], c["nu"], c["qatab"], c["qtab"], \
        c["part"]
    t_X = p["t"][G["X"]]
    WH_ = G["hm_s"].shape[1]

    def per_bi(k):
        dG = branch_log_G(t_X - G["T"][k], t_X, G["plX"][k], G["hm_s"][k],
                          G["hm_f"][k], G["hm_t2"][k], G["hm_tt"][k],
                          G["hm_cnt"][k], mu, nu, qtab, qatab, part)
        # hot-site count; B == X (slot 0) uses the adjusted count
        # (graft.py:489-492)
        size_h = rsn.row_size(G["hot_rs"][k], G["hot_re"][k],
                              G["hot_cnt"][k])
        Lh = jnp.where(G["compl_"][k], L - size_h, size_h)
        size_w = rsn.row_size(G["warm_rs"][k], G["warm_re"][k],
                              G["warm_cnt"][k])
        Lw = jnp.where(G["compl_"][k], L - size_w, size_w)
        n_miss_X = num_missing_at_dev(p, G["X"])
        Lh = jnp.where(k == 0, (L - n_miss_X) - (Lw - Lh), Lh)
        T = G["T"][k]
        M = G["hm_cnt"][k].astype(jnp.float64)
        d = G["hd_cnt"][k].astype(jnp.float64)
        Lh = Lh.astype(jnp.float64)
        al = -mu_prop * Lh * T + M * jnp.log(mu_prop / 3.0)
        P_AC = -0.25 * jnp.expm1(-4.0 / 3.0 * mu_prop * T)
        P_AC = jnp.maximum(P_AC, 1e-300)
        al -= ((Lh - d) * jnp.log1p(-3.0 * P_AC) + d * jnp.log(P_AC))
        return dG, al

    dGs, als = jax.vmap(per_bi)(jnp.arange(BI_MAX))
    act = G["active"]
    return (jnp.sum(jnp.where(act, dGs, 0.0)),
            jnp.sum(jnp.where(act, als, 0.0)))


# ---------------------------------------------------------------------------
# Peel (host graft.py _peel_inner, closed-final variant;
# reference spr_move.cpp:868-975)
# ---------------------------------------------------------------------------

def _path_and_sibs(p, X, B):
    """Junction path X -> B (exclusive): arrays of (sib, level_valid) for
    each junction between X and B, bottom-up."""
    parent_a = p["parent"]

    def cond(carry):
        cur, i, sibs, n = carry
        return (cur != B) & (cur >= 0) & (i < P_MAX) \
            & (parent_a[jnp.maximum(cur, 0)] >= 0)

    def body(carry):
        cur, i, sibs, n = carry
        par = parent_a[jnp.maximum(cur, 0)]
        sib = _sibling_dev(p, jnp.maximum(par, 0), cur)
        sibs = sibs.at[i].set(sib)
        return par, i + 1, sibs, n + 1

    sibs = jnp.full(P_MAX, -1, jnp.int32)
    _, _, sibs, n_levels = jax.lax.while_loop(
        cond, body, (jnp.asarray(X, jnp.int32), jnp.int32(0), sibs,
                     jnp.int32(0)))
    return sibs, n_levels


def peel_inner_dev(p, G, c):
    """Remove the graft's warm mutations: warm muts of each bi's branch
    slide down to the P->X level (from-state updates on every junction
    sibling along the way), X's branch becomes the composed nexus deltas at
    t_mid.  Host: graft.py _peel_inner (final closed)."""
    ref_seq = c["ref_seq"]
    X = G["X"]
    N, W = p["msite"].shape
    WH_ = G["hm_s"].shape[1]
    t_P = G["t_P"]
    t_X = p["t"][X]
    ok = jnp.bool_(True)

    msite, mfrom, mto, mt = p["msite"], p["mfrom"], p["mto"], p["mt"]
    mcount = p["mcount"]
    fsite, fstate = p["fsite"], p["fstate"]

    def per_bi(carry):
        k, msite, mfrom, mto, mt, mcount, fsite, fstate, ok = carry
        B = jnp.maximum(G["B"][k], 0)
        act = G["active"][k] & (G["B"][k] != X)
        in_warm = rsn.contains_many(G["warm_rs"][k], G["warm_re"][k],
                                    jnp.maximum(msite[B], 0))
        in_warm = jnp.where(G["compl_"][k], True, in_warm)
        sel = (jnp.arange(W) < mcount[B]) & in_warm & act

        # slide from-states: reversed order so the EARLIEST mutation's
        # from_state sticks (host iterates reversed and overwrites);
        # iterate only the selected muts (compacted, usually a handful)
        sibs, n_levels = _path_and_sibs(p, X, G["B"][k])
        nsel = jnp.sum(sel).astype(jnp.int32)
        sel_ids = jnp.argsort(~sel, stable=True)  # selected lanes first

        def per_mut(ms):
            i, fsite, fstate, ok = ms
            j = sel_ids[jnp.clip(nsel - 1 - i, 0, W - 1)]  # reversed order
            site = msite[B][j]
            frm = mfrom[B][j]

            def per_level(ls):
                li, fsite, fstate, ok = ls
                sib = jnp.maximum(sibs[li], 0)
                ns, nv, ok2 = fs_set(fsite[sib], fstate[sib], ref_seq,
                                     site, frm)
                fsite = fsite.at[sib].set(ns)
                fstate = fstate.at[sib].set(nv)
                return li + 1, fsite, fstate, ok & ok2

            _, fsite, fstate, ok = jax.lax.while_loop(
                lambda ls: ls[0] < n_levels, per_level,
                (jnp.int32(0), fsite, fstate, ok))
            return i + 1, fsite, fstate, ok

        _, fsite, fstate, ok = jax.lax.while_loop(
            lambda ms: ms[0] < nsel, per_mut,
            (jnp.int32(0), fsite, fstate, ok))

        # keep = non-warm muts, order preserved
        keep = (jnp.arange(W) < mcount[B]) & ~in_warm
        nkeep = jnp.sum(keep).astype(jnp.int32)
        order = jnp.argsort(~keep, stable=True)
        lane = jnp.arange(W)
        row_s = jnp.where(lane < nkeep, msite[B][order], -1)
        row_f = jnp.where(lane < nkeep, mfrom[B][order], 0)
        row_t2 = jnp.where(lane < nkeep, mto[B][order], 0)
        row_tt = jnp.where(lane < nkeep, mt[B][order], jnp.inf)
        msite = msite.at[B].set(jnp.where(act, row_s, msite[B]))
        mfrom = mfrom.at[B].set(jnp.where(act, row_f, mfrom[B]))
        mto = mto.at[B].set(jnp.where(act, row_t2, mto[B]))
        mt = mt.at[B].set(jnp.where(act, row_tt, mt[B]))
        mcount = mcount.at[B].set(jnp.where(act, nkeep, mcount[B]))
        return k + 1, msite, mfrom, mto, mt, mcount, fsite, fstate, ok

    _, msite, mfrom, mto, mt, mcount, fsite, fstate, ok = \
        jax.lax.while_loop(
            lambda cr: cr[0] < G["n_bi"], per_bi,
            (jnp.int32(0), msite, mfrom, mto, mt, mcount, fsite, fstate,
             ok))

    # X's row := all hot_deltas at t_mid (disjoint sites), site-sorted
    t_mid = 0.5 * (t_P + t_X)
    all_s = jnp.where(
        (jnp.arange(WH_)[None, :] < G["hd_cnt"][:, None]) &
        G["active"][:, None], G["hd_s"], jnp.int32(2 ** 30)).reshape(-1)
    all_f = G["hd_f"].reshape(-1)
    all_t2 = G["hd_t"].reshape(-1)
    order = jnp.argsort(all_s)
    n_del = jnp.sum(all_s < 2 ** 30).astype(jnp.int32)
    ok = ok & (n_del <= W)
    lane = jnp.arange(W)
    take = order[:W]
    msite = msite.at[X].set(
        jnp.where(lane < n_del, all_s[take], -1).astype(jnp.int32))
    mfrom = mfrom.at[X].set(jnp.where(lane < n_del, all_f[take], 0))
    mto = mto.at[X].set(jnp.where(lane < n_del, all_t2[take], 0))
    mt = mt.at[X].set(jnp.where(lane < n_del, t_mid, jnp.inf))
    mcount = mcount.at[X].set(n_del)

    p2 = dict(p, msite=msite, mfrom=mfrom, mto=mto, mt=mt, mcount=mcount,
              fsite=fsite, fstate=fstate)
    return p2, ok


# ---------------------------------------------------------------------------
# The prune-regraft surgery with missation factoring (host graft.py move();
# native topo_native.cpp SprContext::move; reference spr_move.cpp:1101-1160)
# Operates on the PEELED tree; inner moves (P != root, SS != root branch).
# ---------------------------------------------------------------------------

def _node_runs(p, n):
    return p["rs"][n], p["re"][n], p["rcnt"][n]


def _set_node_runs(p_rs, p_re, p_rcnt, n, rs, re, cnt):
    return (p_rs.at[n].set(rs), p_re.at[n].set(re), p_rcnt.at[n].set(cnt))


def move_dev(p, X, SS, t_new, c):
    """detach X, regraft on branch SS at t_new.  Returns (p2, ok)."""
    ref_seq = c["ref_seq"]
    N, W = p["msite"].shape
    WR = p["rs"].shape[1]
    WFn = p["fsite"].shape[1]
    root = p["root"]
    X = jnp.asarray(X, jnp.int32)
    P = p["parent"][X]
    S = _sibling_dev(p, P, X)
    SS = jnp.where(SS == P, S, SS)
    old_t_P = p["t"][P]
    ok = jnp.bool_(True)

    # 1. strip X's (peeled) row into nexus->X deltas (already site-sorted,
    # disjoint, at t_mid)
    dnx_s = p["msite"][X]
    dnx_f = p["mfrom"][X]
    dnx_t = p["mto"][X]
    dnx_c = p["mcount"][X]

    # 2a. X inherits every missation at or above its old position.  Run
    # union accumulated bottom-up; from-states move via the small fs rows
    # (only non-ref from-states have entries; already-missing-at-X sites
    # keep X's own entry) — same design as the native kernel's detach.
    rs_a, re_a, cnt_a = _node_runs(p, X)
    fsX, fvX = p["fsite"][X], p["fstate"][X]

    def inherit(carry):
        cur, rs_a, re_a, cnt_a, fsX, fvX, ok = carry
        n = jnp.maximum(cur, 0)
        site_r = p["fsite"][n]
        add = (site_r >= 0) \
            & rsn.contains_many(p["rs"][n], p["re"][n],
                                jnp.maximum(site_r, 0)) \
            & ~rsn.contains_many(rs_a, re_a, jnp.maximum(site_r, 0))
        fsX, fvX, okb = fs_bulk_add(fsX, fvX, site_r, p["fstate"][n], add)
        rs2, re2, cnt2, ok2 = rsn.combine(rs_a, re_a, cnt_a, p["rs"][n],
                                          p["re"][n], p["rcnt"][n],
                                          op="union", WR_out=WR)
        return (p["parent"][n], rs2, re2, cnt2, fsX, fvX, ok & ok2 & okb)

    _, rs_a, re_a, cnt_a, fsX, fvX, ok = jax.lax.while_loop(
        lambda cr: cr[0] >= 0, inherit,
        (P, rs_a, re_a, cnt_a, fsX, fvX, ok))

    p_rs = p["rs"].at[X].set(rs_a)
    p_re = p["re"].at[X].set(re_a)
    p_rcnt = p["rcnt"].at[X].set(cnt_a)
    p_fs = p["fsite"].at[X].set(fsX)
    p_fv = p["fstate"].at[X].set(fvX)

    # 2b. structural detach (muts merge G->P->S, wiring; ops/spr_move.detach)
    p1 = dict(p, rs=p_rs, re=p_re, rcnt=p_rcnt, fsite=p_fs, fstate=p_fv)
    # X's row must not merge anywhere: detach only touches P/S rows.
    # detach/attach (ops/spr_move) return mutation-only dicts; re-attach the
    # missation arrays around them.
    pd, S_det, Pf = detach(p1, X)
    pd = dict(pd, rs=p1["rs"], re=p1["re"], rcnt=p1["rcnt"],
              fsite=p1["fsite"], fstate=p1["fstate"])
    G_node = p["parent"][P]

    # 2c. merge missations P -> S (disjoint), clear P
    rsS, reS, cntS, okm = rsn.combine(*_node_runs(p1, P), *_node_runs(p1, S),
                                      op="union", WR_out=WR)
    ok = ok & okm
    p_rs, p_re, p_rcnt = (pd["rs"], pd["re"], pd["rcnt"])
    p_rs, p_re, p_rcnt = _set_node_runs(p_rs, p_re, p_rcnt, S, rsS, reS,
                                        cntS)
    p_rs, p_re, p_rcnt = _set_node_runs(
        p_rs, p_re, p_rcnt, P, jnp.full(WR, rsn.BIG, jnp.int32),
        jnp.full(WR, rsn.BIG, jnp.int32), jnp.int32(0))
    p_fs, p_fv = pd["fsite"], pd["fstate"]

    nsS, nvS, okb = fs_bulk_add(p_fs[S], p_fv[S], p1["fsite"][P],
                                p1["fstate"][P], p1["fsite"][P] >= 0)
    p_fs = p_fs.at[S].set(nsS)
    p_fv = p_fv.at[S].set(nvS)
    ok = ok & okb
    p_fs = p_fs.at[P].set(jnp.full(WFn, -1, jnp.int32))

    pd = dict(pd, rs=p_rs, re=p_re, rcnt=p_rcnt, fsite=p_fs, fstate=p_fv)

    # 2d. normalization cascade up from the old junction G
    def cascade_cond(carry):
        cur, pd_rs, pd_re, pd_rcnt, pd_fs, pd_fv, ok = carry
        n = jnp.maximum(cur, 0)
        c0 = jnp.maximum(pd["children"][n, 0], 0)
        c1 = jnp.maximum(pd["children"][n, 1], 0)
        _, _, ccnt, _ = rsn.combine(
            pd_rs[c0], pd_re[c0], pd_rcnt[c0], pd_rs[c1], pd_re[c1],
            pd_rcnt[c1], op="intersect", WR_out=WR)
        return (cur >= 0) & (ccnt > 0)

    def cascade(carry):
        cur, pd_rs, pd_re, pd_rcnt, pd_fs, pd_fv, ok = carry
        n = jnp.maximum(cur, 0)
        c0 = jnp.maximum(pd["children"][n, 0], 0)
        c1 = jnp.maximum(pd["children"][n, 1], 0)
        crs, cre, ccnt, ok1 = rsn.combine(
            pd_rs[c0], pd_re[c0], pd_rcnt[c0], pd_rs[c1], pd_re[c1],
            pd_rcnt[c1], op="intersect", WR_out=WR)

        # move c0's fs entries in common up to cur (bulk; cur has no entry
        # at these sites — they were not in its miss); drop both children's
        m0 = (pd_fs[c0] >= 0) & rsn.contains_many(
            crs, cre, jnp.maximum(pd_fs[c0], 0))
        nsn, nvn, okb = fs_bulk_add(pd_fs[n], pd_fv[n], pd_fs[c0],
                                    pd_fv[c0], m0)
        pd_fs = pd_fs.at[n].set(nsn)
        pd_fv = pd_fv.at[n].set(nvn)
        pd_fs = pd_fs.at[c0].set(jnp.where(m0, -1, pd_fs[c0]))
        m1 = (pd_fs[c1] >= 0) & rsn.contains_many(
            crs, cre, jnp.maximum(pd_fs[c1], 0))
        pd_fs = pd_fs.at[c1].set(jnp.where(m1, -1, pd_fs[c1]))

        r0s, r0e, r0c, ok2 = rsn.combine(pd_rs[c0], pd_re[c0], pd_rcnt[c0],
                                         crs, cre, ccnt, op="minus",
                                         WR_out=WR)
        r1s, r1e, r1c, ok3 = rsn.combine(pd_rs[c1], pd_re[c1], pd_rcnt[c1],
                                         crs, cre, ccnt, op="minus",
                                         WR_out=WR)
        rns, rne, rnc, ok4 = rsn.combine(pd_rs[n], pd_re[n], pd_rcnt[n],
                                         crs, cre, ccnt, op="union",
                                         WR_out=WR)
        pd_rs = pd_rs.at[c0].set(r0s).at[c1].set(r1s).at[n].set(rns)
        pd_re = pd_re.at[c0].set(r0e).at[c1].set(r1e).at[n].set(rne)
        pd_rcnt = pd_rcnt.at[c0].set(r0c).at[c1].set(r1c).at[n].set(rnc)
        ok = ok & ok1 & ok2 & ok3 & ok4 & okb
        return (pd["parent"][n], pd_rs, pd_re, pd_rcnt, pd_fs, pd_fv, ok)

    _, p_rs, p_re, p_rcnt, p_fs, p_fv, ok = jax.lax.while_loop(
        cascade_cond, cascade,
        (G_node, pd["rs"], pd["re"], pd["rcnt"], pd["fsite"], pd["fstate"],
         ok))
    pd = dict(pd, rs=p_rs, re=p_re, rcnt=p_rcnt, fsite=p_fs, fstate=p_fv)

    # 3. recompose nexus deltas through the pruned tree; crossings at sites
    # missing at X become from-state updates on X
    bs, bf, bt, bc, okd = deltas_between_dev(pd, SS, t_new, S_det, old_t_P)
    ok = ok & okd
    in_missX = rsn.contains_many(pd["rs"][X], pd["re"][X],
                                 jnp.maximum(bs, 0))
    lane_ok = jnp.arange(bs.shape[0]) < bc
    cross = lane_ok & in_missX
    n_cross = jnp.sum(cross).astype(jnp.int32)
    cross_ids = jnp.argsort(~cross, stable=True)

    def fs_cross(carry):
        i, p_fs, p_fv, ok = carry
        j = cross_ids[i]
        ns, nv, ok2 = fs_set(p_fs[X], p_fv[X], ref_seq, bs[j], bf[j])
        p_fs = p_fs.at[X].set(ns)
        p_fv = p_fv.at[X].set(nv)
        return i + 1, p_fs, p_fv, ok & ok2

    _, p_fs, p_fv, ok = jax.lax.while_loop(
        lambda cr: cr[0] < n_cross, fs_cross,
        (jnp.int32(0), pd["fsite"], pd["fstate"], ok))
    pd = dict(pd, fsite=p_fs, fstate=p_fv)
    keep = lane_ok & ~in_missX
    bs_k = jnp.where(keep, bs, -1)

    # compose d_new_to_old (filtered) with nexus deltas
    cat_s = jnp.concatenate([
        bs_k, jnp.where(jnp.arange(dnx_s.shape[0]) < dnx_c, dnx_s, -1)])
    cat_f = jnp.concatenate([bf, dnx_f])
    cat_t = jnp.concatenate([bt, dnx_t])
    nds, ndf, ndt, ndc = compose_events(cat_s, cat_f, cat_t, cat_s >= 0)
    ok = ok & (ndc <= W)

    # 4a. un-factor missations above the attach point that X's data
    # invalidates: one downward pass over the path root..GG..SS carrying the
    # accumulated need-set and pending from-states
    GG = pd["parent"][SS]
    path = jnp.full(P_MAX, -1, jnp.int32).at[0].set(SS)

    def up_body(i, carry):
        path, depth = carry
        cur = path[i]
        nxt = jnp.where(cur >= 0, pd["parent"][jnp.maximum(cur, 0)], -1)
        path = path.at[i + 1].set(nxt)
        depth = jnp.where(nxt >= 0, i + 1, depth)
        return path, depth

    path, depth = jax.lax.fori_loop(0, P_MAX - 1, up_body,
                                    (path, jnp.int32(0)))

    def down_body(carry):
        (wi, p_rs, p_re, p_rcnt, p_fs, p_fv, acc_rs, acc_re, acc_cnt,
         pend_s, pend_v, ok) = carry
        Wn = jnp.maximum(path[jnp.maximum(wi, 0)], 0)
        below = jnp.maximum(path[jnp.maximum(wi - 1, 0)], 0)
        # need = miss(W) - miss_X
        nrs, nre, ncnt, ok1 = rsn.combine(
            p_rs[Wn], p_re[Wn], p_rcnt[Wn], p_rs[X], p_re[X], p_rcnt[X],
            op="minus", WR_out=WR)
        has = ncnt > 0
        # strip need from W; move W's fs entries in need to pending (bulk)
        wrs, wre, wcnt, ok2 = rsn.combine(
            p_rs[Wn], p_re[Wn], p_rcnt[Wn], nrs, nre, ncnt, op="minus",
            WR_out=WR)
        p_rs = p_rs.at[Wn].set(jnp.where(has, wrs, p_rs[Wn]))
        p_re = p_re.at[Wn].set(jnp.where(has, wre, p_re[Wn]))
        p_rcnt = p_rcnt.at[Wn].set(jnp.where(has, wcnt, p_rcnt[Wn]))
        mvm = has & (p_fs[Wn] >= 0) & rsn.contains_many(
            nrs, nre, jnp.maximum(p_fs[Wn], 0))
        pend_s, pend_v, okp = fs_bulk_add(pend_s, pend_v, p_fs[Wn],
                                          p_fv[Wn], mvm)
        p_fs = p_fs.at[Wn].set(jnp.where(mvm, -1, p_fs[Wn]))

        # acc |= need; junction below W: off-path sibling gains acc+pending
        acc_rs, acc_re, acc_cnt, ok3 = rsn.combine(
            acc_rs, acc_re, acc_cnt, nrs, nre, ncnt, op="union", WR_out=WR)
        ok = ok & ok1 & ok2 & ok3 & okp

        other = _sibling_dev(pd, Wn, below)
        oth = jnp.maximum(other, 0)
        apply_j = acc_cnt > 0
        ors, ore, ocnt, ok4 = rsn.combine(
            p_rs[oth], p_re[oth], p_rcnt[oth], acc_rs, acc_re, acc_cnt,
            op="union", WR_out=WR)
        p_rs = p_rs.at[oth].set(jnp.where(apply_j, ors, p_rs[oth]))
        p_re = p_re.at[oth].set(jnp.where(apply_j, ore, p_re[oth]))
        p_rcnt = p_rcnt.at[oth].set(jnp.where(apply_j, ocnt, p_rcnt[oth]))
        ok = ok & jnp.where(apply_j, ok4, True)
        nso, nvo, okb = fs_bulk_add(p_fs[oth], p_fv[oth], pend_s, pend_v,
                                    (pend_s >= 0) & apply_j)
        p_fs = p_fs.at[oth].set(jnp.where(apply_j, nso, p_fs[oth]))
        p_fv = p_fv.at[oth].set(jnp.where(apply_j, nvo, p_fv[oth]))
        ok = ok & jnp.where(apply_j, okb, True)
        return (wi - 1, p_rs, p_re, p_rcnt, p_fs, p_fv, acc_rs, acc_re,
                acc_cnt, pend_s, pend_v, ok)

    pend_s0 = jnp.full(WFn, -1, jnp.int32)
    pend_v0 = jnp.zeros(WFn, jnp.int32)
    (_, p_rs, p_re, p_rcnt, p_fs, p_fv, acc_rs, acc_re, acc_cnt, pend_s,
     pend_v, ok) = jax.lax.while_loop(
        lambda cr: cr[0] >= 1, down_body,
        (depth, pd["rs"], pd["re"], pd["rcnt"], pd["fsite"], pd["fstate"],
         jnp.full(WR, rsn.BIG, jnp.int32), jnp.full(WR, rsn.BIG, jnp.int32),
         jnp.int32(0), pend_s0, pend_v0, ok))
    # SS itself gains the accumulated needs + pending from-states
    apply_ss = acc_cnt > 0
    srs2, sre2, scnt2, ok5 = rsn.combine(
        p_rs[SS], p_re[SS], p_rcnt[SS], acc_rs, acc_re, acc_cnt, op="union",
        WR_out=WR)
    p_rs = p_rs.at[SS].set(jnp.where(apply_ss, srs2, p_rs[SS]))
    p_re = p_re.at[SS].set(jnp.where(apply_ss, sre2, p_re[SS]))
    p_rcnt = p_rcnt.at[SS].set(jnp.where(apply_ss, scnt2, p_rcnt[SS]))
    ok = ok & jnp.where(apply_ss, ok5, True)

    nss, nvs, okb2 = fs_bulk_add(p_fs[SS], p_fv[SS], pend_s, pend_v,
                                 (pend_s >= 0) & apply_ss)
    p_fs = p_fs.at[SS].set(jnp.where(apply_ss, nss, p_fs[SS]))
    p_fv = p_fv.at[SS].set(jnp.where(apply_ss, nvs, p_fv[SS]))
    ok = ok & jnp.where(apply_ss, okb2, True)
    pd = dict(pd, rs=p_rs, re=p_re, rcnt=p_rcnt, fsite=p_fs, fstate=p_fv)

    # 4b. drop miss(X) entries covered above the new position
    cov_rs, cov_re, cov_cnt, ok6 = missing_at_row(pd, jnp.maximum(GG, 0),
                                                  WR_out=WR)
    cov_cnt = jnp.where(GG >= 0, cov_cnt, 0)
    ok = ok & ok6
    ovl_rs, ovl_re, ovl_cnt, ok7 = rsn.combine(
        cov_rs, cov_re, cov_cnt, pd["rs"][X], pd["re"][X], pd["rcnt"][X],
        op="intersect", WR_out=WR)
    has_ovl = ovl_cnt > 0
    xrs, xre, xcnt, ok8 = rsn.combine(
        pd["rs"][X], pd["re"][X], pd["rcnt"][X], ovl_rs, ovl_re, ovl_cnt,
        op="minus", WR_out=WR)
    p_rs = pd["rs"].at[X].set(jnp.where(has_ovl, xrs, pd["rs"][X]))
    p_re = pd["re"].at[X].set(jnp.where(has_ovl, xre, pd["re"][X]))
    p_rcnt = pd["rcnt"].at[X].set(jnp.where(has_ovl, xcnt, pd["rcnt"][X]))
    drop_fs = rsn.contains_many(ovl_rs, ovl_re,
                                jnp.maximum(pd["fsite"][X], 0)) \
        & (pd["fsite"][X] >= 0) & has_ovl
    p_fs = pd["fsite"].at[X].set(jnp.where(drop_fs, -1, pd["fsite"][X]))
    ok = ok & jnp.where(has_ovl, ok7 & ok8, ok7)
    pd = dict(pd, rs=p_rs, re=p_re, rcnt=p_rcnt, fsite=p_fs)

    # 4c. structural attach + synthesized mid-branch row on X
    t_X = pd["t"][X]
    t_mid = 0.5 * (t_new + t_X)
    lane = jnp.arange(W)
    row_s = jnp.where(lane < ndc, nds[:W], -1).astype(jnp.int32)
    row_f = jnp.where(lane < ndc, ndf[:W], 0)
    row_t2 = jnp.where(lane < ndc, ndt[:W], 0)
    row_tt = jnp.where(lane < ndc, t_mid, jnp.inf)
    p2 = attach(pd, X, Pf, SS, t_new, row_s, row_f, row_t2, row_tt,
                jnp.minimum(ndc, W))
    p2 = dict(p2, rs=pd["rs"], re=pd["re"], rcnt=pd["rcnt"],
              fsite=pd["fsite"], fstate=pd["fstate"])

    # 4d. factor missations common to the new siblings up onto P
    crs, cre, ccnt, ok9 = rsn.combine(
        p2["rs"][X], p2["re"][X], p2["rcnt"][X], p2["rs"][SS], p2["re"][SS],
        p2["rcnt"][SS], op="intersect", WR_out=WR)
    hasc = ccnt > 0
    ok = ok & ok9
    p_rs, p_re, p_rcnt = p2["rs"], p2["re"], p2["rcnt"]
    p_fs, p_fv = p2["fsite"], p2["fstate"]

    mX = hasc & (p_fs[X] >= 0) & rsn.contains_many(
        crs, cre, jnp.maximum(p_fs[X], 0))
    nsp, nvp, okb3 = fs_bulk_add(p_fs[Pf], p_fv[Pf], p_fs[X], p_fv[X], mX)
    p_fs = p_fs.at[Pf].set(nsp)
    p_fv = p_fv.at[Pf].set(nvp)
    p_fs = p_fs.at[X].set(jnp.where(mX, -1, p_fs[X]))
    mS = hasc & (p_fs[SS] >= 0) & rsn.contains_many(
        crs, cre, jnp.maximum(p_fs[SS], 0))
    p_fs = p_fs.at[SS].set(jnp.where(mS, -1, p_fs[SS]))
    ok = ok & okb3
    xr, xe, xc, okA = rsn.combine(p_rs[X], p_re[X], p_rcnt[X], crs, cre,
                                  ccnt, op="minus", WR_out=WR)
    sr, se, sc, okB = rsn.combine(p_rs[SS], p_re[SS], p_rcnt[SS], crs, cre,
                                  ccnt, op="minus", WR_out=WR)
    pr, pe, pc, okC = rsn.combine(p_rs[Pf], p_re[Pf], p_rcnt[Pf], crs, cre,
                                  ccnt, op="union", WR_out=WR)
    p_rs = p_rs.at[X].set(jnp.where(hasc, xr, p_rs[X]))
    p_re = p_re.at[X].set(jnp.where(hasc, xe, p_re[X]))
    p_rcnt = p_rcnt.at[X].set(jnp.where(hasc, xc, p_rcnt[X]))
    p_rs = p_rs.at[SS].set(jnp.where(hasc, sr, p_rs[SS]))
    p_re = p_re.at[SS].set(jnp.where(hasc, se, p_re[SS]))
    p_rcnt = p_rcnt.at[SS].set(jnp.where(hasc, sc, p_rcnt[SS]))
    p_rs = p_rs.at[Pf].set(jnp.where(hasc, pr, p_rs[Pf]))
    p_re = p_re.at[Pf].set(jnp.where(hasc, pe, p_re[Pf]))
    p_rcnt = p_rcnt.at[Pf].set(jnp.where(hasc, pc, p_rcnt[Pf]))
    ok = ok & jnp.where(hasc, okA & okB & okC, True)

    p2 = dict(p2, rs=p_rs, re=p_re, rcnt=p_rcnt, fsite=p_fs, fstate=p_fv)
    return p2, ok


# ---------------------------------------------------------------------------
# Apply (host graft.py _apply_inner, closed-final; spr_move.cpp:977-1070)
# ---------------------------------------------------------------------------

def apply_inner_dev(p, G, c):
    """Write the graft's hot mutations back: X's row becomes slot 0's list;
    every other bi's mutations land on the path branch containing their
    time, updating junction-sibling from-states below the landing.  Rows
    are then time-sorted and clamped into their branches."""
    ref_seq = c["ref_seq"]
    X = G["X"]
    N, W = p["msite"].shape
    WH_ = G["hm_s"].shape[1]
    parent_a, t = p["parent"], p["t"]

    msite, mfrom, mto, mt = p["msite"], p["mfrom"], p["mto"], p["mt"]
    mcount = p["mcount"]
    fsite, fstate = p["fsite"], p["fstate"]
    ok = jnp.bool_(True)

    # X's row = slot 0 hot muts
    lane = jnp.arange(W)
    n0 = jnp.minimum(G["hm_cnt"][0], W)
    ok = ok & (G["hm_cnt"][0] <= W)
    msite = msite.at[X].set(
        jnp.where(lane < n0, G["hm_s"][0][:W], -1).astype(jnp.int32))
    mfrom = mfrom.at[X].set(jnp.where(lane < n0, G["hm_f"][0][:W], 0))
    mto = mto.at[X].set(jnp.where(lane < n0, G["hm_t2"][0][:W], 0))
    mt = mt.at[X].set(jnp.where(lane < n0, G["hm_tt"][0][:W], jnp.inf))
    mcount = mcount.at[X].set(n0)

    def per_bi(carry):
        k, msite, mfrom, mto, mt, mcount, fsite, fstate, ok = carry

        def per_mut(st):
            j, msite, mfrom, mto, mt, mcount, fsite, fstate, ok = st
            site = G["hm_s"][k][j]
            frm = G["hm_f"][k][j]
            to = G["hm_t2"][k][j]
            tm = G["hm_tt"][k][j]

            def walk_cond(wst):
                cur, placed = wst[0], wst[1]
                par = parent_a[jnp.maximum(cur, 0)]
                return ~placed & (cur != G["A"][k]) & (cur >= 0) \
                    & (par >= 0)

            def walk(wst):
                cur, placed, landed, fsite, fstate, ok = wst
                cc = jnp.maximum(cur, 0)
                par = parent_a[cc]
                here = (t[jnp.maximum(par, 0)] <= tm) & (tm < t[cc])
                sib = _sibling_dev(p, jnp.maximum(par, 0), cc)
                ns, nv, ok2 = fs_set(fsite[sib], fstate[sib], ref_seq,
                                     site, to)
                fsite = fsite.at[sib].set(jnp.where(here, fsite[sib], ns))
                fstate = fstate.at[sib].set(jnp.where(here, fstate[sib],
                                                      nv))
                ok = ok & jnp.where(here, True, ok2)
                landed = jnp.where(here, cur, landed)
                cur = jnp.where(here, cur, par)
                return cur, placed | here, landed, fsite, fstate, ok

            cur, placed, landed, fsite, fstate, ok = jax.lax.while_loop(
                walk_cond, walk,
                (jnp.asarray(X, jnp.int32), jnp.bool_(False),
                 jnp.int32(0), fsite, fstate, ok))
            # append to the landing node's row
            tgt = jnp.maximum(landed, 0)
            pos = jnp.minimum(mcount[tgt], W - 1)
            wr = placed & (mcount[tgt] < W)
            msite = msite.at[tgt, pos].set(
                jnp.where(wr, site, msite[tgt, pos]))
            mfrom = mfrom.at[tgt, pos].set(
                jnp.where(wr, frm, mfrom[tgt, pos]))
            mto = mto.at[tgt, pos].set(jnp.where(wr, to, mto[tgt, pos]))
            mt = mt.at[tgt, pos].set(jnp.where(wr, tm, mt[tgt, pos]))
            mcount = mcount.at[tgt].set(
                jnp.where(wr, mcount[tgt] + 1, mcount[tgt]))
            ok = ok & wr
            return (j + 1, msite, mfrom, mto, mt, mcount, fsite, fstate,
                    ok)

        j0 = jnp.int32(0)
        (j0, msite, mfrom, mto, mt, mcount, fsite, fstate,
         ok) = jax.lax.while_loop(
            lambda st: st[0] < G["hm_cnt"][k], per_mut,
            (j0, msite, mfrom, mto, mt, mcount, fsite, fstate, ok))
        return k + 1, msite, mfrom, mto, mt, mcount, fsite, fstate, ok

    (_, msite, mfrom, mto, mt, mcount, fsite, fstate,
     ok) = jax.lax.while_loop(
        lambda cr: cr[0] < G["n_bi"], per_bi,
        (jnp.int32(1), msite, mfrom, mto, mt, mcount, fsite, fstate, ok))

    # sort + clamp every bi branch row (graft.py _clamp_times)
    def fix_row(k, carry):
        msite, mfrom, mto, mt = carry
        act = G["active"][k]
        B = jnp.maximum(G["B"][k], 0)
        A = jnp.maximum(G["A"][k], 0)
        t_A, t_B = t[A], t[B]
        # sort by (t, site): site-presort, then stable time sort
        valid = jnp.arange(W) < mcount[B]
        o_site = jnp.argsort(jnp.where(valid, msite[B], jnp.int32(2 ** 30)),
                             stable=True)
        o_t = jnp.argsort(jnp.where(valid[o_site], mt[B][o_site], jnp.inf),
                          stable=True)
        order = o_site[o_t]
        rs_ = msite[B][order]
        rf_ = mfrom[B][order]
        rt2 = mto[B][order]
        rtt = mt[B][order]
        span = t_B - t_A
        eps = 1e-12 * jnp.maximum(jnp.maximum(jnp.abs(t_A), jnp.abs(t_B)),
                                  1.0)
        lo = t_A + jnp.minimum(eps, 0.5 * span)
        rtt = jnp.where(jnp.arange(W) < mcount[B],
                        jnp.where(rtt <= t_A, lo,
                                  jnp.where(rtt > t_B, t_B, rtt)), rtt)
        msite = msite.at[B].set(jnp.where(act, rs_, msite[B]))
        mfrom = mfrom.at[B].set(jnp.where(act, rf_, mfrom[B]))
        mto = mto.at[B].set(jnp.where(act, rt2, mto[B]))
        mt = mt.at[B].set(jnp.where(act, rtt, mt[B]))
        return msite, mfrom, mto, mt

    msite, mfrom, mto, mt = jax.lax.fori_loop(
        0, BI_MAX, fix_row, (msite, mfrom, mto, mt))

    p2 = dict(p, msite=msite, mfrom=mfrom, mto=mto, mt=mt, mcount=mcount,
              fsite=fsite, fstate=fstate)
    return p2, ok


# ---------------------------------------------------------------------------
# Proposal of new graft mutations (host graft.py _propose_new_graft_mutations;
# reference spr_move.cpp:207-245, 742-797).  Closed bis only.
# ---------------------------------------------------------------------------

from . import history as _hist   # noqa: E402
from . import spr_study as _study  # noqa: E402

H_RT_MISS = 24   # round-trip-site slots per branch info


def propose_dev(key, p_moved, G, miss_rs, miss_re, mu_prop, c, L: int,
                H_RT_: int = H_RT_MISS):
    """Replace G's hot-mutation rows with freshly sampled histories: per
    closed bi, delta-site histories (min 1 event realizing the composed
    delta) + round-trip histories (min 2 events, start = end = the state at
    X) over the bi's hot sites; slot 0 additionally excludes sites missing
    at X unless they are delta sites (host graft.py:419-424).  Returns
    (G', ok)."""
    ref_seq = c["ref_seq"]
    X = G["X"]
    t_X = p_moved["t"][X]
    WH_ = G["hm_s"].shape[1]
    KM = _hist.KMAX
    ok = jnp.bool_(True)

    hm_s = jnp.full((BI_MAX, WH_), -1, jnp.int32)
    hm_f = jnp.zeros((BI_MAX, WH_), jnp.int32)
    hm_t2 = jnp.zeros((BI_MAX, WH_), jnp.int32)
    hm_tt = jnp.full((BI_MAX, WH_), jnp.inf)
    hm_cnt = jnp.zeros(BI_MAX, jnp.int32)

    keys = jax.random.split(key, 3 * BI_MAX).reshape(BI_MAX, 3, 2)

    def per_bi(k, carry):
        hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok = carry
        act = G["active"][k]
        T = G["T"][k]
        size_h = rsn.row_size(G["hot_rs"][k], G["hot_re"][k],
                              G["hot_cnt"][k])
        Lh = jnp.where(G["compl_"][k], L - size_h, size_h)
        act = act & (Lh > 0)

        # delta-site histories
        d_act = jnp.arange(WH_) < G["hd_cnt"][k]
        dkeys = jax.random.split(keys[k, 0], WH_)
        k_d, st_d, tm_d = jax.vmap(
            lambda kk, a, b: _hist.sample_site_history(
                kk, a, b, T, mu_prop, min_k=1))(
            dkeys, jnp.where(d_act, G["hd_f"][k], 0),
            jnp.where(d_act, G["hd_t"][k], 1))

        # round-trip sites: hot, non-delta; slot 0 drops missing-at-X sites
        rt_mask = _hist.sample_roundtrip_mask(keys[k, 1], L, T, mu_prop)
        sit = jnp.arange(L)
        in_hot = rsn.contains_many(G["hot_rs"][k], G["hot_re"][k], sit)
        in_hot = jnp.where(G["compl_"][k], ~in_hot, in_hot)
        hd_pad = jnp.where(d_act, G["hd_s"][k], jnp.int32(2 ** 30))
        pos = jnp.searchsorted(hd_pad, sit)
        pos_c = jnp.clip(pos, 0, WH_ - 1)
        is_delta = (pos < G["hd_cnt"][k]) & (hd_pad[pos_c] == sit)
        in_missX = rsn.contains_many(miss_rs, miss_re, sit)
        rt_mask = rt_mask & in_hot & ~is_delta \
            & ~((k == 0) & in_missX)
        n_rt = jnp.sum(rt_mask).astype(jnp.int32)
        ok_k = n_rt <= H_RT_
        rt_sites = jnp.where(jnp.arange(H_RT_) < n_rt,
                             jnp.argsort(~rt_mask, stable=True)[:H_RT_],
                             -1).astype(jnp.int32)
        rt_active = jnp.arange(H_RT_) < n_rt
        rt_state = jax.vmap(
            lambda s: _state_at_miss(p_moved, ref_seq, X, t_X,
                                     jnp.maximum(s, 0)))(rt_sites)
        rkeys = jax.random.split(keys[k, 2], H_RT_)
        k_r, st_r, tm_r = jax.vmap(
            lambda kk, s: _hist.sample_site_history(kk, s, s, T, mu_prop,
                                                    min_k=2))(
            rkeys, jnp.where(rt_active, rt_state, 0))

        # assemble the bi's new history (global time order)
        ev_site = jnp.concatenate([
            jnp.repeat(jnp.where(d_act, G["hd_s"][k], -1), KM),
            jnp.repeat(rt_sites, KM)])
        ev_in_k = jnp.concatenate([
            (jnp.arange(WH_ * KM) % KM) < jnp.repeat(k_d, KM),
            (jnp.arange(H_RT_ * KM) % KM) < jnp.repeat(k_r, KM)])
        ev_act = jnp.concatenate([jnp.repeat(d_act, KM),
                                  jnp.repeat(rt_active, KM)]) & ev_in_k \
            & (ev_site >= 0)
        ev_to = jnp.concatenate([st_d.reshape(-1), st_r.reshape(-1)])
        prev_d = jnp.concatenate(
            [jnp.where(d_act, G["hd_f"][k], 0)[:, None], st_d[:, :-1]],
            axis=1).reshape(-1)
        prev_r = jnp.concatenate(
            [jnp.where(rt_active, rt_state, 0)[:, None], st_r[:, :-1]],
            axis=1).reshape(-1)
        ev_from = jnp.concatenate([prev_d, prev_r])
        ev_t = jnp.concatenate([tm_d.reshape(-1), tm_r.reshape(-1)]) + t_X
        M_new = jnp.sum(ev_act).astype(jnp.int32)
        ok_k = ok_k & (M_new <= WH_)
        o = jnp.argsort(jnp.where(ev_act, ev_t, jnp.inf))
        lane = jnp.arange(WH_)
        row_s = jnp.where(lane < M_new, ev_site[o[:WH_]],
                          -1).astype(jnp.int32)
        row_f = jnp.where(lane < M_new, ev_from[o[:WH_]], 0)
        row_t2 = jnp.where(lane < M_new, ev_to[o[:WH_]], 0)
        row_tt = jnp.where(lane < M_new, ev_t[o[:WH_]], jnp.inf)

        hm_s = hm_s.at[k].set(jnp.where(act, row_s, hm_s[k]))
        hm_f = hm_f.at[k].set(jnp.where(act, row_f, hm_f[k]))
        hm_t2 = hm_t2.at[k].set(jnp.where(act, row_t2, hm_t2[k]))
        hm_tt = hm_tt.at[k].set(jnp.where(act, row_tt, hm_tt[k]))
        hm_cnt = hm_cnt.at[k].set(jnp.where(act, M_new, 0))
        ok = ok & jnp.where(act, ok_k, True)
        return hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok

    hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok = jax.lax.fori_loop(
        0, BI_MAX, per_bi, (hm_s, hm_f, hm_t2, hm_tt, hm_cnt, ok))
    G2 = dict(G, hm_s=hm_s, hm_f=hm_f, hm_t2=hm_t2, hm_tt=hm_tt,
              hm_cnt=hm_cnt)
    return G2, ok


def _state_at_miss(p, ref_seq, branch, t0, site):
    """State of `site` at (branch, t0): latest mutation at/above wins
    (site_deltas.state_at) — identical to ops/spr_move._state_at_dev but
    reading this module's packed dict (missation rows are irrelevant to
    sequence state)."""
    from .spr_move import _state_at_dev
    return _state_at_dev(p, ref_seq, branch, t0, site)


def _summarize_closed_dev(G):
    """Union of all closed bis' hot deltas, site-sorted (host mixer
    _summarize_closed; disjoint across bis since hot sets are disjoint)."""
    WH_ = G["hd_s"].shape[1]
    act = (jnp.arange(WH_)[None, :] < G["hd_cnt"][:, None]) \
        & G["active"][:, None]
    s = jnp.where(act, G["hd_s"], jnp.int32(2 ** 30)).reshape(-1)
    f = G["hd_f"].reshape(-1)
    t_ = G["hd_t"].reshape(-1)
    o = jnp.argsort(s)
    n = jnp.sum(s < 2 ** 30).astype(jnp.int32)
    D = s.shape[0]
    lane = jnp.arange(D)
    return (jnp.where(lane < n, s[o], -1).astype(jnp.int32),
            f[o], t_[o], n)


# ---------------------------------------------------------------------------
# The full jitted SPR1 move with missations (inner, can_change_root=False)
# — the device twin of mixer._spr1 (subrun.cpp:492-675)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("L", "WRB", "WH_", "H_RT_"))
def spr1_step_miss(key, p, L: int, c, t_max_tip, WRB: int, WH_: int,
                   H_RT_: int = H_RT_MISS, f=0.8):
    """One jitted SPR1 move on a missation-laden tree.  Pipeline (host
    mixer._spr1): analyze old graft -> peel -> bounded pre-study (counted
    mask = sites missing at X) -> pick (branch, time) -> move (full
    missation surgery) -> analyze + propose new graft -> post-study ->
    MH -> apply/revert.  Returns (p_out, accept, delta_log_G, performable,
    diag).  Coalescent prior term is left to the caller (flat here, as in
    ops/spr_move.spr1_step)."""
    parent, children, t = p["parent"], p["children"], p["t"]
    N, W = p["msite"].shape
    WR = p["rs"].shape[1]
    root = p["root"]
    kx, kreg, ktime, kprop, kmh = jax.random.split(key, 5)

    X = jax.random.randint(kx, (), 0, N, dtype=jnp.int32)
    P0 = parent[jnp.clip(X, 0, N - 1)]
    eligible = (X != root) & (P0 >= 0) & (P0 != root)
    Xc = jnp.where(eligible, X, jnp.int32(0))
    P = jnp.clip(parent[Xc], 0, N - 1)
    eligible = eligible & (parent[Xc] >= 0) & (parent[Xc] != root)
    c0, c1 = children[P, 0], children[P, 1]
    S = jnp.where(c0 == Xc, c1, c0)
    t_X = t[Xc]
    t_P_old = t[P]

    lam_X = lambda_at_dev_miss(p, Xc, c["lambda_ref"], c["mu"], c["nu"],
                               c["qatab"], c["part"], c["ref_cum_Q"],
                               c["ref_seq"])
    eligible = eligible & (lam_X > 0.0)
    mrs, mre, mcnt_m, ok = missing_at_row(p, Xc, WR_out=WR)
    n_missX = rsn.row_size(mrs, mre, mcnt_m)
    L_X = (L - n_missX).astype(jnp.float64)
    eligible = eligible & (L_X > 0)
    mu_study = lam_X / jnp.maximum(L_X, 1.0)
    # begin_move (subrun.cpp:502): JC proposal rate from the root
    lam_root = lambda_at_dev_miss(p, root, c["lambda_ref"], c["mu"],
                                  c["nu"], c["qatab"], c["part"],
                                  c["ref_cum_Q"], c["ref_seq"])
    n_miss_root = num_missing_at_dev(p, root)
    mu_prop = lam_root / jnp.maximum(
        (L - n_miss_root).astype(jnp.float64), 1.0)

    # old graft: analyze + finish + peel
    G_old, ok_a = start_inner_dev(p, Xc, c, WRB=WRB, WH_=WH_)
    ok = ok & ok_a
    dG_old, al_old = finish_dev(p, G_old, c, mu_prop, L)
    p_peel, ok_p = peel_inner_dev(p, G_old, c)
    ok = ok & ok_p

    # pre-study on the peeled tree
    d0s, d0f, d0t, d0c = _summarize_closed_dev(G_old)
    from .spr_move import study_regions
    reg = study_regions(p_peel, Xc, t_X, d0s, d0t, d0c, S,
                        miss_rs=mrs, miss_re=mre)
    lw = _study.study_log_weights(reg, lam_X, f, t_X, t_max_tip, mu_study)
    lw = jnp.where(reg["alive"], lw, -jnp.inf)
    eligible = eligible & jnp.any(jnp.isfinite(lw))
    u_reg = jax.random.uniform(kreg, (), dtype=jnp.float64)
    i_fwd = _study.pick_nexus_region(u_reg, lw)
    new_S = reg["branch"][i_fwd]
    u_t = jax.random.uniform(ktime, (), dtype=jnp.float64)
    t_new = _study.pick_time_in_region(u_t, i_fwd, reg, lam_X, f, t_X,
                                       t_max_tip)
    eligible = eligible & (t_new < t_X) & (t_new > reg["t_min"][i_fwd])
    new_G = jnp.where(new_S != root, parent[jnp.clip(new_S, 0, N - 1)], -1)
    new_G = jnp.where(new_G == P, parent[P], new_G)
    t_new_G = jnp.where(new_G >= 0, t[jnp.maximum(new_G, 0)], -jnp.inf)
    eligible = eligible & (t_new != t[jnp.clip(new_S, 0, N - 1)]) \
        & (t_new != t_new_G)
    alpha_fwd = _study.log_alpha_in_region(i_fwd, t_new, lw, reg, lam_X, f,
                                           t_X, t_max_tip)

    # move + new graft
    p_move, ok_m = move_dev(p_peel, Xc, new_S, t_new, c)
    ok = ok & ok_m
    G_new, ok_a2 = start_inner_dev(p_move, Xc, c, WRB=WRB, WH_=WH_)
    ok = ok & ok_a2
    G_new, ok_pr = propose_dev(kprop, p_move, G_new, mrs, mre, mu_prop, c,
                               L, H_RT_=H_RT_)
    ok = ok & ok_pr
    dG_new, al_new = finish_dev(p_move, G_new, c, mu_prop, L)

    # post-study on the moved (still-peeled) tree; find the reverse region
    d1s, d1f, d1t, d1c = _summarize_closed_dev(G_new)
    reg_r = study_regions(p_move, Xc, t_X, d1s, d1t, d1c, new_S,
                          miss_rs=mrs, miss_re=mre)
    lw_r = _study.study_log_weights(reg_r, lam_X, f, t_X, t_max_tip,
                                    mu_study)
    lw_r = jnp.where(reg_r["alive"], lw_r, -jnp.inf)
    S_det = S  # detach merged P's branch onto S; ids preserved
    hit_old = (reg_r["alive"] & (reg_r["branch"] == S_det)
               & (reg_r["t_min"] < t_P_old) & (t_P_old <= reg_r["t_max"]))
    i_rev = jnp.argmax(hit_old)
    found_rev = jnp.any(hit_old)
    alpha_rev = _study.log_alpha_in_region(i_rev, t_P_old, lw_r, reg_r,
                                           lam_X, f, t_X, t_max_tip)

    log_mh = ((dG_new - al_new) - (dG_old - al_old) + alpha_rev - alpha_fwd)
    u = jax.random.uniform(kmh, (), dtype=jnp.float64)
    p_acc, ok_app = apply_inner_dev(p_move, G_new, c)
    ok = ok & ok_app
    accept = (eligible & ok & found_rev
              & ((log_mh >= 0.0) | (jnp.log(u) < log_mh)))

    p_out = jax.tree.map(
        lambda a_, b_: jnp.where(
            jnp.reshape(accept, (1,) * a_.ndim), b_, a_) if a_.ndim else
        jnp.where(accept, b_, a_), p, p_acc)
    dlg = jnp.where(accept, dG_new - dG_old, 0.0)
    diag = dict(eligible=eligible, ok=ok, found_rev=found_rev,
                log_mh=log_mh, n_bi_old=G_old["n_bi"],
                n_bi_new=G_new["n_bi"], lam_X=lam_X, t_new=t_new,
                new_S=new_S, X=Xc)
    return p_out, accept, dlg, eligible & ok, diag


@partial(jax.jit, static_argnames=("L", "n_moves", "WRB", "WH_", "H_RT_"))
def spr1_sweep_miss(key, p, L: int, n_moves: int, c, t_max_tip, WRB: int,
                    WH_: int, H_RT_: int = H_RT_MISS, f=0.8):
    """n_moves sequential missation-aware SPR1 moves in ONE jit program."""
    def body(carry, k):
        p, n_acc, dlg_tot, n_perf = carry
        p2, acc, dlg, perf, _ = spr1_step_miss(k, p, L, c, t_max_tip,
                                               WRB=WRB, WH_=WH_,
                                               H_RT_=H_RT_, f=f)
        return ((p2, n_acc + acc.astype(jnp.int32), dlg_tot + dlg,
                 n_perf + perf.astype(jnp.int32)), None)

    keys = jax.random.split(key, n_moves)
    (p, n_acc, dlg_tot, n_perf), _ = jax.lax.scan(
        body, (p, jnp.int32(0), jnp.float64(0.0), jnp.int32(0)), keys)
    return p, n_acc, dlg_tot, n_perf
