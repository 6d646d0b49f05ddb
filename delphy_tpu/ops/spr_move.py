"""Jitted SPR1 move for missation-free trees (inner grafts).

End-to-end device SPR1 on a padded-per-branch tree representation: the
bounded study flood + weights (ops/spr_study.py) pick the regraft edge and
time, the constrained history sampler (ops/history.py) proposes the new
branch history, the MH ratio assembles from closed-form branch terms, and
the accepted surgery (detach + merge, split + attach, new branch history)
is pure fixed-shape array rewriting.

Scope (v1, stated restrictions — the production engine keeps the native
host kernel; this is the device re-design of the move's core):
  * missation-free trees — the graft analysis collapses to ONE branch info
    (hot = all sites; reference spr_move.h:47-84 with empty missation maps),
  * inner moves only: X's parent is not the root, and above-root regraft
    regions are filtered from the study weights (no root changes).

Under those restrictions the branch-merge at the detach point and the
branch-split at the attach point are log_G-NEUTRAL (the per-site intensity
path along the merged/split branches is unchanged), so delta_log_G is just
the new-vs-old P->X branch term — exactly the host graft's delta_log_G
(topo/graft.py _finish_graft_analysis, reference spr_move.cpp:246-316).

Representation: per-branch padded mutation lists (N, W) sorted by time —
fixed-shape surgery, unlike the engine's global CSR pool.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..phylo import FlatTree, Mutation

BIG_T = jnp.inf


def pack_tree(tree: FlatTree, W: int | None = None):
    """FlatTree (no missations) -> padded-per-branch arrays."""
    N = tree.num_nodes
    assert all(not iv for iv in tree.miss_intervals), "missation-free only"
    counts = np.array([len(tree.mutations[b]) for b in range(N)])
    if W is None:
        W = int(max(8, 2 * counts.max() + 4))
    msite = np.full((N, W), -1, dtype=np.int32)
    mfrom = np.zeros((N, W), dtype=np.int32)
    mto = np.zeros((N, W), dtype=np.int32)
    mt = np.full((N, W), np.inf)
    for b in range(N):
        for i, m in enumerate(tree.mutations[b]):
            msite[b, i], mfrom[b, i], mto[b, i], mt[b, i] = \
                m.site, m.from_, m.to, m.t
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
        root=jnp.int32(int(tree.root)),
    )


def unpack_tree(p, tree_template: FlatTree) -> FlatTree:
    """Padded arrays -> FlatTree (for oracle checks in tests)."""
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
    return out


@jax.jit
def detach(p, X):
    """Detach X: merge its parent P away (branch G->P prepends onto S).
    Returns (packed_detached, S, P).  P becomes a floating spare node; X's
    branch row is left in place (callers overwrite it on attach).

    Pre: X's parent is not the root; counts fit W."""
    parent, children, t = p["parent"], p["children"], p["t"]
    msite, mfrom, mto, mt = p["msite"], p["mfrom"], p["mto"], p["mt"]
    mcount = p["mcount"]
    W = msite.shape[1]
    P = parent[X]
    c0, c1 = children[P, 0], children[P, 1]
    S = jnp.where(c0 == X, c1, c0)
    G = parent[P]

    cp, cs = mcount[P], mcount[S]
    idx = jnp.arange(W)
    from_p = idx < cp
    src_s = jnp.clip(idx - cp, 0, W - 1)
    nsite = jnp.where(from_p, msite[P], msite[S][src_s])
    nfrom = jnp.where(from_p, mfrom[P], mfrom[S][src_s])
    nto = jnp.where(from_p, mto[P], mto[S][src_s])
    nt = jnp.where(from_p, mt[P], mt[S][src_s])
    valid = idx < cp + cs
    nsite = jnp.where(valid, nsite, -1)
    nt = jnp.where(valid, nt, BIG_T)
    msite = msite.at[S].set(nsite)
    mfrom = mfrom.at[S].set(jnp.where(valid, nfrom, 0))
    mto = mto.at[S].set(jnp.where(valid, nto, 0))
    mt = mt.at[S].set(nt)
    mcount = mcount.at[S].set(cp + cs)
    children = children.at[G, 0].set(jnp.where(children[G, 0] == P, S,
                                               children[G, 0]))
    children = children.at[G, 1].set(jnp.where(children[G, 1] == P, S,
                                               children[G, 1]))
    parent = parent.at[S].set(G)
    # neutralize P so path walks cannot route through it and the region
    # space stays clean
    parent = parent.at[P].set(jnp.int32(-1))
    mcount = mcount.at[P].set(0)
    pd = dict(parent=parent, children=children, t=t, mcount=mcount,
              msite=msite, mfrom=mfrom, mto=mto, mt=mt, root=p["root"])
    return pd, S, P


@jax.jit
def attach(p, X, P, SS, t_new, h_site, h_from, h_to, h_t, h_count):
    """Re-attach detached X on branch SS at time t_new, reusing spare node P,
    and set X's branch mutations to the sampled history (h_*, time-sorted,
    padded with +inf times / site -1).

    Pre: SS is not X and not in X's (detached) subtree; counts fit W."""
    parent, children, t = p["parent"], p["children"], p["t"]
    msite, mfrom, mto, mt = p["msite"], p["mfrom"], p["mto"], p["mt"]
    mcount = p["mcount"]
    W = msite.shape[1]
    idx = jnp.arange(W)
    GG = parent[SS]
    css = mcount[SS]
    upper = (mt[SS] < t_new) & (idx < css)   # go to the new G'->P branch
    n_up = jnp.sum(upper).astype(jnp.int32)
    # P's row: SS's upper muts (already time-sorted, stable compaction)
    ord_up = jnp.argsort(~upper)  # uppers first, stable
    msite = msite.at[P].set(jnp.where(idx < n_up, msite[SS][ord_up], -1))
    mfrom = mfrom.at[P].set(jnp.where(idx < n_up, mfrom[SS][ord_up], 0))
    mto = mto.at[P].set(jnp.where(idx < n_up, mto[SS][ord_up], 0))
    mt = mt.at[P].set(jnp.where(idx < n_up, mt[SS][ord_up], BIG_T))
    mcount = mcount.at[P].set(n_up)
    # SS keeps the lower muts
    ord_lo = jnp.argsort(jnp.where(upper, BIG_T, mt[SS]))
    n_lo = css - n_up
    msite = msite.at[SS].set(jnp.where(idx < n_lo, msite[SS][ord_lo], -1))
    mfrom = mfrom.at[SS].set(jnp.where(idx < n_lo, mfrom[SS][ord_lo], 0))
    mto = mto.at[SS].set(jnp.where(idx < n_lo, mto[SS][ord_lo], 0))
    mt = mt.at[SS].set(jnp.where(idx < n_lo, mt[SS][ord_lo], BIG_T))
    mcount = mcount.at[SS].set(n_lo)
    # wire GG -> P -> {SS, X}
    children = children.at[GG, 0].set(jnp.where(children[GG, 0] == SS, P,
                                                children[GG, 0]))
    children = children.at[GG, 1].set(jnp.where(children[GG, 1] == SS, P,
                                                children[GG, 1]))
    parent = parent.at[P].set(GG)
    parent = parent.at[SS].set(P)
    parent = parent.at[X].set(P)
    lo = jnp.minimum(SS, X)
    hi = jnp.maximum(SS, X)
    children = children.at[P, 0].set(lo)
    children = children.at[P, 1].set(hi)
    t = t.at[P].set(t_new)

    # X's branch = proposed history
    msite = msite.at[X].set(h_site)
    mfrom = mfrom.at[X].set(h_from)
    mto = mto.at[X].set(h_to)
    mt = mt.at[X].set(h_t)
    mcount = mcount.at[X].set(h_count)

    return dict(parent=parent, children=children, t=t, mcount=mcount,
                msite=msite, mfrom=mfrom, mto=mto, mt=mt, root=p["root"])


def detach_attach(p, X, SS, t_new, h_site, h_from, h_to, h_t, h_count):
    """detach + attach in one call (SS given in the ORIGINAL tree's ids)."""
    pd, S, P = detach(p, X)
    SS = jnp.where(SS == P, S, SS)  # old P's branch merged onto S
    return attach(pd, X, P, SS, t_new, h_site, h_from, h_to, h_t, h_count)


def branch_log_G(t_top, t_bot, lam_bot, site, frm, to, tmid, count, mu, nu,
                 qtab, qatab, part):
    """calc_branch_log_G (phylo_tree_calc.h:185-206) over one padded row."""
    idx = jnp.arange(site.shape[0])
    active = idx < count
    s = jnp.maximum(site, 0)
    nus = nu[s]
    qa_f = qatab[part[s] * 4 + frm]
    qa_t = qatab[part[s] * 4 + to]
    qrate = qtab[part[s] * 16 + frm * 4 + to]
    term = (-mu * nus * (qa_f - qa_t) * (tmid - t_top)
            + jnp.log(jnp.maximum(mu * nus * qrate, 1e-300)))
    return -lam_bot * (t_bot - t_top) + jnp.sum(jnp.where(active, term, 0.0))


def log_alpha_mut(L, T, M, d, mu_prop):
    """Proposal density of a closed branch history (graft.py:487-501,
    spr_move.cpp:799-866): K-truncated-Poisson/uniformization forward terms
    minus the Nielsen endpoint-acceptance normalization."""
    out = -mu_prop * L * T + M * jnp.log(mu_prop / 3.0)
    P_AC = -0.25 * jnp.expm1(-4.0 / 3.0 * mu_prop * T)
    out -= ((L - d) * jnp.log1p(-3.0 * P_AC) + d * jnp.log(P_AC))
    return out


# ---------------------------------------------------------------------------
# Path delta composition (site_deltas.h:42-157) as fixed-shape kernels
# ---------------------------------------------------------------------------

D_MAX = 192   # event-buffer slots for a through-root path composition
P_MAX = 96    # max path depth


@jax.jit
def compose_events(site, frm, to, valid):
    """Compose an ordered event sequence into per-site deltas: per site,
    from = first event's from, to = last event's to; identity pairs dropped
    (site_deltas.push_back chains).  Inputs are order-stamped by position;
    invalid slots have site < 0.  Returns (sites, froms, tos, count) sorted
    by site, padded with -1.

    All scatters use UNIQUE indices (one first / one last per site group):
    XLA scatter-set gives no ordering guarantee under duplicates."""
    D = site.shape[0]
    # stable sort by site (invalid last) keeps the event order within each
    # site group — x32-safe (no int64 composite key)
    o = jnp.argsort(jnp.where(valid, site, jnp.int32(2 ** 30)), stable=True)
    s, f, t_, v = site[o], frm[o], to[o], valid[o]
    prev_s = jnp.concatenate([jnp.full(1, -2, s.dtype), s[:-1]])
    next_s = jnp.concatenate([s[1:], jnp.full(1, -2, s.dtype)])
    is_first = v & (s != prev_s)
    is_last = v & (s != next_s)
    gid = jnp.cumsum(is_first) - 1
    sink = D  # one spare slot as the scatter sink for masked writes
    idx_first = jnp.where(is_first, gid, sink)
    idx_last = jnp.where(is_last, gid, sink)
    g_site = jnp.full(D + 1, -1, s.dtype).at[idx_first].set(s)[:D]
    g_from = jnp.zeros(D + 1, f.dtype).at[idx_first].set(f)[:D]
    g_to = jnp.zeros(D + 1, t_.dtype).at[idx_last].set(t_)[:D]
    n_groups = jnp.sum(is_first)
    keep = (jnp.arange(D) < n_groups) & (g_from != g_to) & (g_site >= 0)
    # compact kept entries to the front (stable, site order preserved)
    o2 = jnp.argsort(~keep, stable=True)
    out_s = jnp.where(jnp.arange(D) < jnp.sum(keep), g_site[o2], -1)
    out_f = g_from[o2]
    out_t = g_to[o2]
    return out_s, out_f, out_t, jnp.sum(keep).astype(jnp.int32)


def _collect_up(p, b0, t0, inverse: bool, buf, n, ok):
    """Walk b0 -> root appending each branch's mutations (first branch
    time-filtered at t0; reverse-time order when inverse)."""
    msite, mfrom, mto, mt = p["msite"], p["mfrom"], p["mto"], p["mt"]
    mcount, parent = p["mcount"], p["parent"]
    W = msite.shape[1]
    bs, bf, bt = buf

    def cond(c):
        cur, first, n, bs, bf, bt, ok, steps = c
        return (cur >= 0) & (steps < P_MAX)

    def body(c):
        cur, first, n, bs, bf, bt, ok, steps = c
        idx = jnp.arange(W)
        sel = (idx < mcount[cur]) & (~first | (mt[cur] <= t0))
        cnt = jnp.sum(sel).astype(jnp.int32)
        r = jnp.cumsum(sel) - 1
        rank = jnp.where(jnp.bool_(inverse), cnt - 1 - r, r)
        pos = jnp.where(sel, n + rank, D_MAX - 1)
        ok = ok & (n + cnt <= D_MAX)
        write = sel & (n + rank < D_MAX)
        pos = jnp.clip(pos, 0, D_MAX - 1)
        if inverse:
            bs = bs.at[pos].set(jnp.where(write, msite[cur], bs[pos]))
            bf = bf.at[pos].set(jnp.where(write, mto[cur], bf[pos]))
            bt = bt.at[pos].set(jnp.where(write, mfrom[cur], bt[pos]))
        else:
            bs = bs.at[pos].set(jnp.where(write, msite[cur], bs[pos]))
            bf = bf.at[pos].set(jnp.where(write, mfrom[cur], bf[pos]))
            bt = bt.at[pos].set(jnp.where(write, mto[cur], bt[pos]))
        return (parent[cur], jnp.bool_(False), n + cnt, bs, bf, bt, ok,
                steps + 1)

    cur, first, n, bs, bf, bt, ok, steps = jax.lax.while_loop(
        cond, body, (b0, jnp.bool_(True), n, bs, bf, bt, ok, jnp.int32(0)))
    ok = ok & (cur < 0)  # walk actually reached the root
    return (bs, bf, bt), n, ok


@jax.jit
def deltas_between_dev(p, ba, ta, bb, tb):
    """Device twin of site_deltas.deltas_between: per-site deltas between
    tree points (ba, ta) and (bb, tb), composed through the root.  Returns
    (sites, froms, tos, count, ok) with ok=False on buffer overflow."""
    bs = jnp.full(D_MAX, -1, jnp.int32)
    bf = jnp.zeros(D_MAX, jnp.int32)
    bt = jnp.zeros(D_MAX, jnp.int32)
    n = jnp.int32(0)
    ok = jnp.bool_(True)
    # a -> root: inverse mutations in reverse-time order per branch
    (bs, bf, bt), n, ok = _collect_up(p, ba, ta, True, (bs, bf, bt), n, ok)

    # root -> b: forward, top-down.  Collect the path first.
    parent = p["parent"]
    path = jnp.full(P_MAX, -1, jnp.int32)

    def cond2(c):
        cur, i, path, ok = c
        return (cur >= 0) & (i < P_MAX)

    def body2(c):
        cur, i, path, ok = c
        path = path.at[jnp.clip(i, 0, P_MAX - 1)].set(cur)
        ok = ok & (i < P_MAX)
        return parent[cur], i + 1, path, ok

    _, pl, path, ok = jax.lax.while_loop(
        cond2, body2, (bb, jnp.int32(0), path, ok))

    msite, mfrom, mto, mt = p["msite"], p["mfrom"], p["mto"], p["mt"]
    mcount = p["mcount"]
    W = msite.shape[1]

    def body3(i, c):
        n, bs, bf, bt, ok = c
        lvl = pl - 1 - i
        cur = path[jnp.clip(lvl, 0, P_MAX - 1)]
        use = (i < pl)
        last = (i == pl - 1)
        idx = jnp.arange(W)
        sel = use & (idx < mcount[cur]) & (~last | (mt[cur] <= tb))
        cnt = jnp.sum(sel).astype(jnp.int32)
        rank = jnp.cumsum(sel) - 1
        pos = jnp.clip(jnp.where(sel, n + rank, D_MAX - 1), 0, D_MAX - 1)
        ok = ok & (n + cnt <= D_MAX)
        write = sel & (n + rank < D_MAX)
        bs = bs.at[pos].set(jnp.where(write, msite[cur], bs[pos]))
        bf = bf.at[pos].set(jnp.where(write, mfrom[cur], bf[pos]))
        bt = bt.at[pos].set(jnp.where(write, mto[cur], bt[pos]))
        return n + cnt, bs, bf, bt, ok

    n, bs, bf, bt, ok = jax.lax.fori_loop(0, P_MAX, body3,
                                          (n, bs, bf, bt, ok))
    s, f, t_, cnt = compose_events(bs, bf, bt, jnp.arange(D_MAX) < n)
    return s, f, t_, cnt, ok


# ---------------------------------------------------------------------------
# Device study pipeline: padded rows -> region arrays -> flood -> rewrites
# (the jit counterpart of ops/spr_study.bounded_spr_study's host wrapper)
# ---------------------------------------------------------------------------

from . import spr_study as _study  # noqa: E402
from . import history as _hist     # noqa: E402


def study_regions(p, X, t_X, d0_site, d0_t0, d0_cnt, seed_branch,
                  miss_rs=None, miss_re=None):
    """Bounded (<=1 crossing) study on the padded tree, seeded at region
    (seed_branch, 0) with |d0| deltas: returns per-region arrays in
    POST-DETACH coordinates (branch, mut_idx, above, t_min, t_max, mm,
    t_S, alive) over the static region space R = N*W + N + 1 (slot R-1 is
    the scatter sink).  With (miss_rs, miss_re) — a run row of the sites
    missing at X — crossings at those sites are NOT counted (cost-0 edges,
    host study.py:82-87); without, every mutation crossing is counted.
    """
    parent, children, t = p["parent"], p["children"], p["t"]
    msite, mt = p["msite"], p["mt"]
    mfrom, mto = p["mfrom"], p["mto"]
    mcount = p["mcount"]
    N, W = msite.shape
    MC = N * W
    R = MC + N + 1
    root = p["root"]

    moff = jnp.concatenate([jnp.zeros(1, mcount.dtype), jnp.cumsum(mcount)])
    rid_base = moff[:N] + jnp.arange(N, dtype=moff.dtype)

    # flat mutation arrays (CSR by branch, time order within branch)
    rows = jnp.repeat(jnp.arange(N, dtype=jnp.int32), W).reshape(N, W)
    cols = jnp.tile(jnp.arange(W, dtype=jnp.int32), N).reshape(N, W)
    valid = cols < mcount[:, None]
    flat_pos = jnp.where(valid, moff[:N][:, None] + cols, MC)
    fsite = jnp.full(MC + 1, -1, jnp.int32).at[flat_pos].set(
        jnp.where(valid, msite, -1))[:MC]
    ffrom = jnp.zeros(MC + 1, jnp.int32).at[flat_pos].set(
        jnp.where(valid, mfrom, 0))[:MC]
    fto = jnp.zeros(MC + 1, jnp.int32).at[flat_pos].set(
        jnp.where(valid, mto, 0))[:MC]
    ft = jnp.full(MC + 1, jnp.inf).at[flat_pos].set(
        jnp.where(valid, mt, jnp.inf))[:MC]
    fbranch = jnp.zeros(MC + 1, jnp.int32).at[flat_pos].set(
        jnp.where(valid, rows, 0))[:MC]
    j_valid = jnp.arange(MC) < moff[N]

    r_above = jnp.where(j_valid,
                        jnp.arange(MC) + fbranch, R - 1).astype(jnp.int32)
    if miss_rs is None:
        counted = j_valid  # no missations: every crossing is counted
    else:
        from . import runset as _rsn
        counted = j_valid & ~_rsn.contains_many(miss_rs, miss_re,
                                                jnp.maximum(fsite, 0))

    # junction pairs; detached/floating nodes (parent < 0) and the root get
    # the sink
    jb = jnp.arange(N)
    jp = parent[jb]
    j_ok = (jb != root) & (jp >= 0)
    jp_c = jnp.clip(jp, 0, N - 1)
    jr_child = jnp.where(j_ok, rid_base[jb], R - 1).astype(jnp.int32)
    jr_parent = jnp.where(j_ok, rid_base[jp_c] + mcount[jp_c],
                          R - 1).astype(jnp.int32)

    # composition-effect arrays for the single counted crossing (d0_site is
    # sorted among its first d0_cnt entries; -1 pads would sort FIRST, so
    # re-pad to a huge sentinel for the search)
    d0s_srch = jnp.where(jnp.arange(d0_site.shape[0]) < d0_cnt,
                         d0_site, jnp.int32(2 ** 30))
    dpos = jnp.searchsorted(d0s_srch, fsite)
    dpos_c = jnp.clip(dpos, 0, d0_site.shape[0] - 1)
    hit = (dpos < d0_cnt) & (d0_site[dpos_c] == fsite) & j_valid
    t0 = d0_t0[dpos_c]
    d_down = jnp.where(hit, jnp.where(fto == t0, -1, 0), 1).astype(jnp.int32)
    d_up = jnp.where(hit, jnp.where(ffrom == t0, -1, 0), 1).astype(jnp.int32)

    seed_rid = rid_base[seed_branch].astype(jnp.int32)
    excl_lo = rid_base[X].astype(jnp.int32)
    excl_hi = (rid_base[X] + mcount[X]).astype(jnp.int32)
    reach0, reach1, vmm1 = _study._bounded_flood(
        R, seed_rid, excl_lo, excl_hi, r_above, counted, jr_parent,
        jr_child, d0_cnt.astype(jnp.int32), d_down, d_up)

    # region arrays over R
    rid = jnp.arange(R)
    rb = (jnp.searchsorted(rid_base, rid, side="right") - 1).astype(jnp.int32)
    rb_c = jnp.clip(rb, 0, N - 1)
    ridx = (rid - rid_base[rb_c]).astype(jnp.int32)
    in_range = (rid < MC + N) & (ridx >= 0) & (ridx <= mcount[rb_c])
    alive = (reach0 | reach1) & in_range
    mm = jnp.where(reach0, d0_cnt.astype(jnp.int32), vmm1)

    j_lo = jnp.clip(moff[rb_c] + ridx - 1, 0, MC - 1)
    j_hi = jnp.clip(moff[rb_c] + ridx, 0, MC - 1)
    pb = jnp.clip(parent[rb_c], 0, N - 1)
    t_min = jnp.where(ridx == 0, t[pb], ft[j_lo])
    t_max = jnp.where(ridx == mcount[rb_c], t[rb_c], ft[j_hi])
    is_root_b = rb_c == root
    t_min = jnp.where(is_root_b, -jnp.inf, t_min)
    t_max = jnp.where(is_root_b, t[root], t_max)

    # ---- detachment accounting (spr_study.cpp:130-208), inner/no-root-change
    # variant: regions on the root branch are dropped (can_change_root=False)
    P = parent[X]
    c0, c1 = children[P, 0], children[P, 1]
    S = jnp.where(c0 == X, c1, c0)
    nmGP = mcount[P]
    drop = alive & (rb_c == root)
    on_S = alive & (rb_c == S)
    on_P = alive & (rb_c == P)
    # P != root here (inner restriction).  S regions: idx += nmGP; idx==0
    # additionally inherits region_t_min(P, nmGP)
    gpb = jnp.clip(parent[P], 0, N - 1)
    tmin_P_last = jnp.where(nmGP == 0, t[gpb],
                            ft[jnp.clip(moff[P] + nmGP - 1, 0, MC - 1)])
    t_min = jnp.where(on_S & (ridx == 0), tmin_P_last, t_min)
    ridx = jnp.where(on_S, ridx + nmGP, ridx)
    # P regions: idx == nmGP dropped, others become S-branch regions
    drop = drop | (on_P & (ridx == nmGP))
    rb_c = jnp.where(on_P & (ridx != nmGP), S, rb_c)
    alive = alive & ~drop
    # t_X future trim
    alive = alive & (t_min < t_X)
    t_max = jnp.minimum(t_max, t_X)

    return dict(branch=rb_c, mut_idx=ridx, above=jnp.zeros(R, bool),
                t_min=t_min, t_max=t_max, mm=mm.astype(jnp.float64),
                t_S=t[rb_c], alive=alive)


# ---------------------------------------------------------------------------
# The full jitted SPR1 move
# ---------------------------------------------------------------------------

H_D = 96    # delta-site history slots
H_RT = 24   # round-trip-site history slots


def _state_at_dev(p, ref_seq, branch, t0, site):
    """State of `site` at point (branch, t0): latest mutation at/above wins
    (site_deltas.state_at).  Scalar site; bounded root walk."""
    msite, mto, mt = p["msite"], p["mto"], p["mt"]
    mcount, parent = p["mcount"], p["parent"]
    W = msite.shape[1]

    def cond(c):
        cur, first, found, s, steps = c
        return (cur >= 0) & ~found & (steps < P_MAX)

    def body(c):
        cur, first, found, s, steps = c
        idx = jnp.arange(W)
        sel = (idx < mcount[cur]) & (msite[cur] == site) & \
            (~first | (mt[cur] <= t0))
        any_ = jnp.any(sel)
        last = jnp.argmax(jnp.where(sel, idx, -1))
        s = jnp.where(any_, mto[cur][last], s)
        return parent[cur], jnp.bool_(False), any_, s, steps + 1

    _, _, found, s, _ = jax.lax.while_loop(
        cond, body,
        (branch, jnp.bool_(True), jnp.bool_(False),
         ref_seq[jnp.maximum(site, 0)].astype(jnp.int32), jnp.int32(0)))
    return s


def _lambda_at_dev(p, X, lambda_ref, mu, nu, qatab, part):
    """lambda at node X: lambda_ref + per-branch mutation adjustments along
    the root path (phylo_tree_calc.h:107-155, missation-free)."""
    msite, mfrom, mto = p["msite"], p["mfrom"], p["mto"]
    mcount, parent = p["mcount"], p["parent"]
    W = msite.shape[1]

    def cond(c):
        cur, acc, steps = c
        return (cur >= 0) & (steps < P_MAX)

    def body(c):
        cur, acc, steps = c
        idx = jnp.arange(W)
        sel = idx < mcount[cur]
        s = jnp.maximum(msite[cur], 0)
        d = mu * nu[s] * (qatab[part[s] * 4 + mto[cur]]
                          - qatab[part[s] * 4 + mfrom[cur]])
        return parent[cur], acc + jnp.sum(jnp.where(sel, d, 0.0)), steps + 1

    _, acc, _ = jax.lax.while_loop(cond, body, (X, 0.0, jnp.int32(0)))
    return lambda_ref + acc


@partial(jax.jit, static_argnames=("L",))
def spr1_step(key, p, ref_seq, L: int, mu, nu, qtab, qatab, part,
              lambda_ref, t_max_tip, f=0.8):
    """One jitted SPR1 move (missation-free, inner, no root change).

    Mirrors mixer._spr1 / subrun.cpp:492-675 move-structure: pick X,
    bounded study + annealed weights pick (branch, time), JC history
    proposal, MH with the forward/reverse study densities and the
    closed-branch proposal densities; coalescent term is left to the
    caller (flat here).  Returns (p_out, accepted, delta_log_G, eligible).
    """
    parent, children, t = p["parent"], p["children"], p["t"]
    N = parent.shape[0]
    W = p["msite"].shape[1]
    root = p["root"]
    kx, kreg, ktime, krt, kd, krt2, kmh = jax.random.split(key, 7)

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

    lam_X = _lambda_at_dev(p, Xc, lambda_ref, mu, nu, qatab, part)
    eligible = eligible & (lam_X > 0.0)
    mu_prop = lam_X / L

    # old graft terms
    M_old = p["mcount"][Xc]
    dG_old = branch_log_G(t_P_old, t_X, lam_X, p["msite"][Xc],
                          p["mfrom"][Xc], p["mto"][Xc], p["mt"][Xc],
                          M_old, mu, nu, qtab, qatab, part)
    d0s, d0f, d0t, d0c = compose_events(
        p["msite"][Xc], p["mfrom"][Xc], p["mto"][Xc],
        jnp.arange(W) < M_old)
    alpha_old = log_alpha_mut(jnp.float64(L), t_X - t_P_old,
                              M_old.astype(jnp.float64),
                              d0c.astype(jnp.float64), mu_prop)

    # forward study (pre-detach coordinates; rewrites give post-detach ids)
    reg = study_regions(p, Xc, t_X, d0s, d0t, d0c, S)
    lw = _study.study_log_weights(reg, lam_X, f, t_X, t_max_tip, mu_prop)
    lw = jnp.where(reg["alive"], lw, -jnp.inf)
    eligible = eligible & jnp.any(jnp.isfinite(lw))
    u_reg = jax.random.uniform(kreg, (), dtype=jnp.float64)
    i_fwd = _study.pick_nexus_region(u_reg, lw)
    new_S = reg["branch"][i_fwd]
    u_t = jax.random.uniform(ktime, (), dtype=jnp.float64)
    t_new = _study.pick_time_in_region(u_t, i_fwd, reg, lam_X, f, t_X,
                                       t_max_tip)
    eligible = eligible & (t_new < t_X) & (t_new > reg["t_min"][i_fwd])
    alpha_fwd = _study.log_alpha_in_region(i_fwd, t_new, lw, reg, lam_X, f,
                                           t_X, t_max_tip)

    # detach; required deltas for the new branch
    p_det, S_det, Pf = detach(p, Xc)
    bs, bf2, bt2, bc, ok = deltas_between_dev(p_det, new_S, t_new, S_det,
                                              t_P_old)
    # compose with d0 (order: new->old path deltas, then old->X deltas)
    cat_s = jnp.concatenate([
        jnp.where(jnp.arange(bs.shape[0]) < bc, bs, -1),
        jnp.where(jnp.arange(d0s.shape[0]) < d0c, d0s, -1)])
    cat_f = jnp.concatenate([bf2, d0f])
    cat_t = jnp.concatenate([bt2, d0t])
    nds, ndf, ndt, ndc = compose_events(cat_s, cat_f, cat_t, cat_s >= 0)
    ok = ok & (ndc <= H_D)

    # histories for delta sites
    T_new = t_X - t_new
    hidx = jnp.arange(H_D)
    h_active = hidx < ndc
    h_frm = jnp.where(h_active, ndf[:H_D], 0)
    h_to = jnp.where(h_active, ndt[:H_D], 1)
    dkeys = jax.random.split(kd, H_D)
    k_d, st_d, tm_d = jax.vmap(
        lambda kk, a, b: _hist.sample_site_history(kk, a, b, T_new, mu_prop,
                                                   min_k=1))(
        dkeys, h_frm, h_to)

    # round-trip sites (not delta sites)
    rt_mask = _hist.sample_roundtrip_mask(krt, L, T_new, mu_prop)
    DN = nds.shape[0]
    nd_pad = jnp.where(jnp.arange(DN) < ndc, nds, jnp.int32(2 ** 30))
    sit = jnp.arange(L)
    pos = jnp.searchsorted(nd_pad, sit)
    pos_c = jnp.clip(pos, 0, DN - 1)
    is_delta = (pos < ndc) & (nd_pad[pos_c] == sit)
    rt_mask = rt_mask & ~is_delta
    n_rt = jnp.sum(rt_mask).astype(jnp.int32)
    ok = ok & (n_rt <= H_RT)
    rt_sites = jnp.where(jnp.arange(H_RT) < n_rt,
                         jnp.argsort(~rt_mask, stable=True)[:H_RT],
                         -1).astype(jnp.int32)
    rt_active = jnp.arange(H_RT) < n_rt
    rt_state = jax.vmap(
        lambda st: _state_at_dev(p_det, ref_seq, new_S, t_new,
                                 jnp.maximum(st, 0)))(rt_sites)
    rkeys = jax.random.split(krt2, H_RT)
    k_r, st_r, tm_r = jax.vmap(
        lambda kk, s: _hist.sample_site_history(kk, s, s, T_new, mu_prop,
                                                min_k=2))(
        rkeys, jnp.where(rt_active, rt_state, 0))

    # assemble the new branch row (global time order)
    KM = _hist.KMAX
    ev_site = jnp.concatenate([
        jnp.repeat(jnp.where(h_active, nds[:H_D], -1), KM),
        jnp.repeat(rt_sites, KM)])
    ev_in_k = jnp.concatenate([
        (jnp.arange(H_D * KM) % KM) < jnp.repeat(k_d, KM),
        (jnp.arange(H_RT * KM) % KM) < jnp.repeat(k_r, KM)])
    ev_act = jnp.concatenate([jnp.repeat(h_active, KM),
                              jnp.repeat(rt_active, KM)]) & ev_in_k \
        & (ev_site >= 0)
    ev_to = jnp.concatenate([st_d.reshape(-1), st_r.reshape(-1)])
    # chain froms: previous state in the chain (frm for slot 0)
    prev_d = jnp.concatenate(
        [h_frm[:, None], st_d[:, :-1]], axis=1).reshape(-1)
    prev_r = jnp.concatenate(
        [jnp.where(rt_active, rt_state, 0)[:, None], st_r[:, :-1]],
        axis=1).reshape(-1)
    ev_from = jnp.concatenate([prev_d, prev_r])
    ev_t = jnp.concatenate([tm_d.reshape(-1), tm_r.reshape(-1)]) + t_X
    M_new = jnp.sum(ev_act).astype(jnp.int32)
    ok = ok & (M_new <= W)
    o = jnp.argsort(jnp.where(ev_act, ev_t, jnp.inf))
    take = jnp.arange(W)
    row_site = jnp.where(take < M_new, ev_site[o[:W]], -1).astype(jnp.int32)
    row_from = jnp.where(take < M_new, ev_from[o[:W]], 0).astype(jnp.int32)
    row_to = jnp.where(take < M_new, ev_to[o[:W]], 0).astype(jnp.int32)
    row_t = jnp.where(take < M_new, ev_t[o[:W]], jnp.inf)

    dG_new = branch_log_G(t_new, t_X, lam_X, row_site, row_from, row_to,
                          row_t, M_new, mu, nu, qtab, qatab, part)
    alpha_new = log_alpha_mut(jnp.float64(L), T_new,
                              M_new.astype(jnp.float64),
                              ndc.astype(jnp.float64), mu_prop)

    p_new = attach(p_det, Xc, Pf, new_S, t_new, row_site, row_from, row_to,
                   row_t, M_new)

    # reverse study on the post-move tree, seeded at the new sibling
    reg_r = study_regions(p_new, Xc, t_X, nds, ndt, ndc, new_S)
    lw_r = _study.study_log_weights(reg_r, lam_X, f, t_X, t_max_tip,
                                    mu_prop)
    lw_r = jnp.where(reg_r["alive"], lw_r, -jnp.inf)
    hit_old = (reg_r["alive"] & (reg_r["branch"] == S_det)
               & (reg_r["t_min"] < t_P_old) & (t_P_old <= reg_r["t_max"]))
    i_rev = jnp.argmax(hit_old)
    found_rev = jnp.any(hit_old)
    alpha_rev = _study.log_alpha_in_region(i_rev, t_P_old, lw_r, reg_r,
                                           lam_X, f, t_X, t_max_tip)

    log_mh = ((dG_new - alpha_new) - (dG_old - alpha_old)
              + alpha_rev - alpha_fwd)
    u = jax.random.uniform(kmh, (), dtype=jnp.float64)
    accept = (eligible & ok & found_rev
              & ((log_mh >= 0.0) | (jnp.log(u) < log_mh)))

    p_out = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(accept, (1,) * a.ndim), b, a) if a.ndim else
        jnp.where(accept, b, a), p, p_new)
    dlg = jnp.where(accept, dG_new - dG_old, 0.0)
    diag = dict(eligible=eligible, ok=ok, found_rev=found_rev,
                n_regions=jnp.sum(jnp.isfinite(lw)).astype(jnp.int32),
                ndc=ndc, n_rt=n_rt, M_new=M_new, log_mh=log_mh)
    return p_out, accept, dlg, eligible & ok, diag


@partial(jax.jit, static_argnames=("L", "n_moves"))
def spr1_sweep(key, p, ref_seq, L: int, n_moves: int, mu, nu, qtab, qatab,
               part, lambda_ref, t_max_tip, f=0.8):
    """n_moves sequential SPR1 moves in ONE jit program (lax.scan) — the
    production dispatch shape: a whole topology sweep per device program,
    like the engine's multi-boundary local sweeps.  Returns
    (p_out, n_accepted, total_delta_log_G, n_eligible)."""
    def body(carry, k):
        p, n_acc, dlg_tot, n_el = carry
        p2, acc, dlg, elig = spr1_step(k, p, ref_seq, L, mu, nu, qtab,
                                       qatab, part, lambda_ref, t_max_tip,
                                       f)[:4]
        return ((p2, n_acc + acc.astype(jnp.int32), dlg_tot + dlg,
                 n_el + elig.astype(jnp.int32)), None)

    keys = jax.random.split(key, n_moves)
    (p, n_acc, dlg_tot, n_el), _ = jax.lax.scan(
        body, (p, jnp.int32(0), jnp.float64(0.0), jnp.int32(0)), keys)
    return p, n_acc, dlg_tot, n_el


def _straddling_mask(parent, t, anc, t_cut, X, root):
    """Nodes whose branch straddles t_cut inside anc's subtree, excluding
    X's subtree — the device form of enumerate_straddling (mixer.py; native
    Mixer::enumerate_straddling): node n qualifies iff t[n] >= t_cut, every
    ancestor strictly below anc has t < t_cut, n's ancestor chain passes
    through anc, and the chain does not pass through X."""
    N = parent.shape[0]

    def body(i, c):
        cur, in_anc, via_x, blocked = c
        # walk one step up for every node simultaneously
        at_anc = cur == anc
        at_x = cur == X
        in_anc = in_anc | at_anc
        via_x = via_x | at_x
        # a node is blocked if some strict ancestor below anc has t >= t_cut
        nxt = jnp.where(cur >= 0, parent[jnp.maximum(cur, 0)], -1)
        step_up = (cur >= 0) & ~at_anc
        blocked = blocked | (step_up & (nxt >= 0) & (nxt != anc)
                             & (t[jnp.maximum(nxt, 0)] >= t_cut))
        cur = jnp.where(step_up, nxt, cur)
        return cur, in_anc, via_x, blocked

    n0 = jnp.arange(N)
    cur = jnp.where(n0 == anc, -1, parent)  # start at each node's parent
    # NB: we test ancestors BETWEEN the node and anc (exclusive); walk from
    # the node's parent upward
    in_anc = cur == anc
    via_x = (n0 == X) | (cur == X)
    blocked = (cur >= 0) & (cur != anc) & (t[jnp.maximum(cur, 0)] >= t_cut)
    cur2, in_anc, via_x, blocked = jax.lax.fori_loop(
        0, P_MAX, body, (cur, in_anc, via_x, blocked))
    qualifies = (t[n0] >= t_cut) & in_anc & ~via_x & ~blocked & (n0 != X)
    # anc itself qualifies when its branch straddles (host recursion base)
    return qualifies


@partial(jax.jit, static_argnames=("L",))
def slide_step(key, p, ref_seq, L: int, mu, nu, qtab, qatab, part,
               lambda_ref, t_max_tip):
    """One jitted subtree-slide move (missation-free, inner, no root
    change) — mixer.py subtree_slide / subrun.cpp:184-209 + native
    Mixer::subtree_slide: displace P along/through branches with a normal
    proposal, with the straddling-count Hastings ratio when the slide hops
    junctions.  Returns (p_out, accepted, delta_log_G, eligible)."""
    parent, children, t = p["parent"], p["children"], p["t"]
    N = parent.shape[0]
    W = p["msite"].shape[1]
    root = p["root"]
    kx, kn, kpick, kd, krt, krt2, kmh = jax.random.split(key, 7)

    X = jax.random.randint(kx, (), 0, N, dtype=jnp.int32)
    P0 = parent[jnp.clip(X, 0, N - 1)]
    eligible = (X != root) & (P0 >= 0) & (P0 != root)
    Xc = jnp.where(eligible, X, jnp.int32(0))
    P = jnp.clip(parent[Xc], 0, N - 1)
    eligible = eligible & (parent[Xc] >= 0) & (parent[Xc] != root)
    c0, c1 = children[P, 0], children[P, 1]
    S = jnp.where(c0 == Xc, c1, c0)
    G = jnp.clip(parent[P], 0, N - 1)
    t_X = t[Xc]
    t_P_old = t[P]

    lam_X = _lambda_at_dev(p, Xc, lambda_ref, mu, nu, qatab, part)
    eligible = eligible & (lam_X > 0.0)
    mu_prop = lam_X / L

    t_root = t[root]
    span = jnp.maximum(t_max_tip - t_root, 0.0)
    scale = jnp.minimum(0.5 / lam_X, span)
    delta_t = scale * jax.random.normal(kn, (), dtype=jnp.float64)
    t_new = t_P_old + delta_t

    # --- choose the target branch SS + Hastings ratio --------------------
    up_deep = (delta_t < 0) & (t_new < t[G])
    down = delta_t >= 0
    eligible = eligible & ~(down & (t_new > t_X))

    # climb: highest ancestor whose parent time <= t_new
    def climb_cond(c):
        SSc, GGc, steps = c
        return (GGc >= 0) & (t_new < t[jnp.maximum(GGc, 0)]) & (steps < P_MAX)

    def climb_body(c):
        SSc, GGc, steps = c
        return GGc, parent[jnp.maximum(GGc, 0)], steps + 1

    SS_up, _, _ = jax.lax.while_loop(climb_cond, climb_body,
                                     (P, parent[P], jnp.int32(0)))
    # reverse-count for the up case: branches straddling old_t_P under SS_up
    mask_up = _straddling_mask(parent, t, SS_up, t_P_old, Xc, root)
    n_up_brs = jnp.sum(mask_up).astype(jnp.float64)
    # forward pick for the down case: branches straddling t_new under P
    mask_dn = _straddling_mask(parent, t, P, t_new, Xc, root)
    # P's own subtree minus X = S's side; exclude P itself
    mask_dn = mask_dn & (jnp.arange(N) != P)
    n_dn_brs = jnp.sum(mask_dn).astype(jnp.int32)
    down_deep = down & (t_new > t[S])
    upick = jax.random.uniform(kpick, (), dtype=jnp.float64)
    csum = jnp.cumsum(mask_dn)
    pick = jnp.searchsorted(csum, jnp.floor(upick * n_dn_brs) + 1,
                            side="left").astype(jnp.int32)
    SS_dn = jnp.clip(pick, 0, N - 1)

    SS = jnp.where(up_deep, SS_up, jnp.where(down_deep, SS_dn, S))
    log_alpha_ratio = jnp.where(
        up_deep, -jnp.log(jnp.maximum(n_up_brs, 1.0)),
        jnp.where(down_deep, jnp.log(jnp.maximum(
            n_dn_brs.astype(jnp.float64), 1.0)), 0.0))
    eligible = eligible & ~(down_deep & (n_dn_brs == 0))
    eligible = eligible & (SS != root) & (t_new < t_X)
    # the slide's time must land strictly inside SS's branch
    pSS = jnp.clip(parent[jnp.clip(SS, 0, N - 1)], 0, N - 1)
    eligible = eligible & jnp.where(
        SS == S, jnp.bool_(True),
        (t_new <= t[jnp.clip(SS, 0, N - 1)]) & (t_new > t[pSS]))

    # --- old graft terms --------------------------------------------------
    M_old = p["mcount"][Xc]
    dG_old = branch_log_G(t_P_old, t_X, lam_X, p["msite"][Xc],
                          p["mfrom"][Xc], p["mto"][Xc], p["mt"][Xc],
                          M_old, mu, nu, qtab, qatab, part)
    d0s, d0f, d0t, d0c = compose_events(
        p["msite"][Xc], p["mfrom"][Xc], p["mto"][Xc],
        jnp.arange(W) < M_old)
    alpha_old = log_alpha_mut(jnp.float64(L), t_X - t_P_old,
                              M_old.astype(jnp.float64),
                              d0c.astype(jnp.float64), mu_prop)

    # --- detach; target deltas; history (same blocks as spr1_step) --------
    p_det, S_det, Pf = detach(p, Xc)
    SS_det = jnp.where(SS == P, S_det, SS)
    bs, bf2, bt2, bc, ok = deltas_between_dev(p_det, SS_det, t_new, S_det,
                                              t_P_old)
    cat_s = jnp.concatenate([
        jnp.where(jnp.arange(bs.shape[0]) < bc, bs, -1),
        jnp.where(jnp.arange(d0s.shape[0]) < d0c, d0s, -1)])
    cat_f = jnp.concatenate([bf2, d0f])
    cat_t = jnp.concatenate([bt2, d0t])
    nds, ndf, ndt, ndc = compose_events(cat_s, cat_f, cat_t, cat_s >= 0)
    ok = ok & (ndc <= H_D)

    T_new = t_X - t_new
    eligible = eligible & (T_new > 0)
    hidx = jnp.arange(H_D)
    h_active = hidx < ndc
    h_frm = jnp.where(h_active, ndf[:H_D], 0)
    h_to = jnp.where(h_active, ndt[:H_D], 1)
    dkeys = jax.random.split(kd, H_D)
    k_d, st_d, tm_d = jax.vmap(
        lambda kk, a, b: _hist.sample_site_history(kk, a, b, T_new, mu_prop,
                                                   min_k=1))(
        dkeys, h_frm, h_to)

    rt_mask = _hist.sample_roundtrip_mask(krt, L, T_new, mu_prop)
    DN = nds.shape[0]
    nd_pad = jnp.where(jnp.arange(DN) < ndc, nds, jnp.int32(2 ** 30))
    sit = jnp.arange(L)
    pos = jnp.searchsorted(nd_pad, sit)
    pos_c = jnp.clip(pos, 0, DN - 1)
    is_delta = (pos < ndc) & (nd_pad[pos_c] == sit)
    rt_mask = rt_mask & ~is_delta
    n_rt = jnp.sum(rt_mask).astype(jnp.int32)
    ok = ok & (n_rt <= H_RT)
    rt_sites = jnp.where(jnp.arange(H_RT) < n_rt,
                         jnp.argsort(~rt_mask, stable=True)[:H_RT],
                         -1).astype(jnp.int32)
    rt_active = jnp.arange(H_RT) < n_rt
    rt_state = jax.vmap(
        lambda st: _state_at_dev(p_det, ref_seq, SS_det, t_new,
                                 jnp.maximum(st, 0)))(rt_sites)
    rkeys = jax.random.split(krt2, H_RT)
    k_r, st_r, tm_r = jax.vmap(
        lambda kk, s: _hist.sample_site_history(kk, s, s, T_new, mu_prop,
                                                min_k=2))(
        rkeys, jnp.where(rt_active, rt_state, 0))

    KM = _hist.KMAX
    ev_site = jnp.concatenate([
        jnp.repeat(jnp.where(h_active, nds[:H_D], -1), KM),
        jnp.repeat(rt_sites, KM)])
    ev_in_k = jnp.concatenate([
        (jnp.arange(H_D * KM) % KM) < jnp.repeat(k_d, KM),
        (jnp.arange(H_RT * KM) % KM) < jnp.repeat(k_r, KM)])
    ev_act = jnp.concatenate([jnp.repeat(h_active, KM),
                              jnp.repeat(rt_active, KM)]) & ev_in_k \
        & (ev_site >= 0)
    ev_to = jnp.concatenate([st_d.reshape(-1), st_r.reshape(-1)])
    prev_d = jnp.concatenate(
        [h_frm[:, None], st_d[:, :-1]], axis=1).reshape(-1)
    prev_r = jnp.concatenate(
        [jnp.where(rt_active, rt_state, 0)[:, None], st_r[:, :-1]],
        axis=1).reshape(-1)
    ev_from = jnp.concatenate([prev_d, prev_r])
    ev_t = jnp.concatenate([tm_d.reshape(-1), tm_r.reshape(-1)]) + t_X
    M_new = jnp.sum(ev_act).astype(jnp.int32)
    ok = ok & (M_new <= W)
    o = jnp.argsort(jnp.where(ev_act, ev_t, jnp.inf))
    take = jnp.arange(W)
    row_site = jnp.where(take < M_new, ev_site[o[:W]], -1).astype(jnp.int32)
    row_from = jnp.where(take < M_new, ev_from[o[:W]], 0).astype(jnp.int32)
    row_to = jnp.where(take < M_new, ev_to[o[:W]], 0).astype(jnp.int32)
    row_t = jnp.where(take < M_new, ev_t[o[:W]], jnp.inf)

    dG_new = branch_log_G(t_new, t_X, lam_X, row_site, row_from, row_to,
                          row_t, M_new, mu, nu, qtab, qatab, part)
    alpha_new = log_alpha_mut(jnp.float64(L), T_new,
                              M_new.astype(jnp.float64),
                              ndc.astype(jnp.float64), mu_prop)

    p_new = attach(p_det, Xc, Pf, SS_det, t_new, row_site, row_from, row_to,
                   row_t, M_new)

    log_mh = ((dG_new - alpha_new) - (dG_old - alpha_old) + log_alpha_ratio)
    u = jax.random.uniform(kmh, (), dtype=jnp.float64)
    accept = (eligible & ok & ((log_mh >= 0.0) | (jnp.log(u) < log_mh)))

    p_out = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(accept, (1,) * a.ndim), b, a) if a.ndim else
        jnp.where(accept, b, a), p, p_new)
    dlg = jnp.where(accept, dG_new - dG_old, 0.0)
    return p_out, accept, dlg, eligible & ok
