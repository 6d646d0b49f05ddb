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
