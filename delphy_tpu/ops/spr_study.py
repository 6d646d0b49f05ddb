"""Jitted bounded SPR-study region enumeration.

Device twin of the host SPR-study DFS for the bounded case
(max_muts_from_start = 1, which the reference uses for 99% of SPR moves —
subrun.cpp:495-499; host twin: delphy_tpu/topo/study.py, reference
core/spr_study.{h,cpp}).

Key re-design: the inter-mutation regions of a phylogenetic tree form a
TREE themselves, with two edge kinds — junction edges (zero cost) and
mutation edges (cost 1, or 0 when the site is missing at X, which the DFS
neither counts nor composes).  The bounded study is then a 0-1 BFS:

 * distance-0 regions: zero-cost flood from the seed;
 * distance-1 regions: for every counted mutation with exactly one side at
   distance 0, the far side seeds a zero-cost flood.  Region paths are
   unique (tree!), so these floods are disjoint and each distance-1 region
   inherits a single well-defined min_muts = |seed deltas composed with its
   one counted crossing| — crossing down composes pop_front, crossing up
   push_front (site_deltas.h:82-128), which changes the delta-set size by
   +1 (site absent), -1 (crossing cancels the stored delta), or 0.

X's own branch regions are excluded (the DFS never visits or expands them,
spr_study.h:150), which also blocks propagation through X.  The detachment
accounting and the t_X future-trim (spr_study.cpp:130-208) are cheap
region-list rewrites done on the host by the wrapper.

The unbounded 1% of moves keeps the host DFS.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..phylo import FlatTree, NO_NODE
from ..topo.study import CandidateRegion, NEG_BIG


def pack_study_tree(tree: FlatTree):
    """Flat arrays for the region graph: per-branch mutation CSR (time
    order), region id bases (rid(b, i) = moff[b] + b + i), junction pairs."""
    N = tree.num_nodes
    nb = np.array([len(tree.mutations[b]) for b in range(N)], dtype=np.int64)
    moff = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(nb, out=moff[1:])
    M = int(moff[N])
    m_branch = np.zeros(M, dtype=np.int64)
    m_site = np.zeros(M, dtype=np.int64)
    m_from = np.zeros(M, dtype=np.int8)
    m_to = np.zeros(M, dtype=np.int8)
    m_t = np.zeros(M, dtype=np.float64)
    for b in range(N):
        for i, m in enumerate(tree.mutations[b]):
            j = moff[b] + i
            m_branch[j] = b
            m_site[j] = m.site
            m_from[j] = m.from_
            m_to[j] = m.to
            m_t[j] = m.t
    rid_base = moff[:N] + np.arange(N, dtype=np.int64)
    R = M + N
    root = int(tree.root)
    nonroot = np.array([b for b in range(N) if b != root], dtype=np.int64)
    parents = np.asarray(tree.parent, dtype=np.int64)[nonroot]
    jr_parent = rid_base[parents] + nb[parents]  # (parent, last) region
    jr_child = rid_base[nonroot]                 # (child, 0) region
    return dict(N=N, M=M, R=R, nb=nb, moff=moff, rid_base=rid_base,
                m_branch=m_branch, m_site=m_site, m_from=m_from, m_to=m_to,
                m_t=m_t, jr_parent=jr_parent, jr_child=jr_child, root=root)


@partial(jax.jit, static_argnames=("R",))
def _bounded_flood(R: int, seed_rid, excl_lo, excl_hi, r_above, counted,
                   jr_parent, jr_child, mm0, d_down, d_up):
    """reach0/reach1 masks + per-region min_muts for the 0-1 BFS."""
    rid = jnp.arange(R)
    excluded = (rid >= excl_lo) & (rid <= excl_hi)

    def flood(reach, cross_ok):
        """Zero-cost fixpoint flood: mutation edges where cross_ok, plus all
        junction edges; never enters excluded regions."""
        def cond(c):
            reach, changed = c
            return changed

        def body(c):
            reach, _ = c
            ra, rb = r_above, r_above + 1
            new = reach
            new = new.at[rb].max(reach[ra] & cross_ok)
            new = new.at[ra].max(reach[rb] & cross_ok)
            new = new.at[jr_child].max(reach[jr_parent])
            new = new.at[jr_parent].max(reach[jr_child])
            new = new & ~excluded
            return new, jnp.any(new != reach)

        reach, _ = jax.lax.while_loop(cond, body, (reach, jnp.bool_(True)))
        return reach

    zero = jnp.zeros(R, dtype=bool)
    reach0 = flood(zero.at[seed_rid].set(True), ~counted)

    # distance-1 entries across counted mutations with one side reached
    ra, rb = r_above, r_above + 1
    down_entry = counted & reach0[ra] & ~reach0[rb]   # crossing above->below
    up_entry = counted & reach0[rb] & ~reach0[ra]     # crossing below->above
    entry1 = zero.at[rb].max(down_entry).at[ra].max(up_entry) & ~excluded
    vmm = jnp.full(R, -1, dtype=jnp.int32)
    vmm = vmm.at[rb].max(jnp.where(down_entry, mm0 + d_down, -1))
    vmm = vmm.at[ra].max(jnp.where(up_entry, mm0 + d_up, -1))
    vmm = jnp.where(entry1 & ~reach0, vmm, -1)
    entry1 = entry1 & ~reach0

    # zero-cost flood of the distance-1 set, carrying min_muts (floods are
    # disjoint: region paths are unique in a tree)
    def cond1(c):
        _, _, changed = c
        return changed

    def body1(c):
        reach, vmm, _ = c
        blocked = excluded | reach0
        new = reach
        nvmm = vmm
        grow_b = ~counted & reach[ra] & ~reach[rb]
        new = new.at[rb].max(grow_b)
        nvmm = nvmm.at[rb].max(jnp.where(grow_b, vmm[ra], -1))
        grow_a = ~counted & new[rb] & ~new[ra]
        new = new.at[ra].max(grow_a)
        nvmm = nvmm.at[ra].max(jnp.where(grow_a, nvmm[rb], -1))
        grow_c = new[jr_parent] & ~new[jr_child]
        new = new.at[jr_child].max(grow_c)
        nvmm = nvmm.at[jr_child].max(jnp.where(grow_c, nvmm[jr_parent], -1))
        grow_p = new[jr_child] & ~new[jr_parent]
        new = new.at[jr_parent].max(grow_p)
        nvmm = nvmm.at[jr_parent].max(jnp.where(grow_p, nvmm[jr_child], -1))
        new = new & ~blocked
        nvmm = jnp.where(new, nvmm, -1)
        return new, nvmm, jnp.any(new != reach)

    reach1, vmm1, _ = jax.lax.while_loop(cond1, body1,
                                         (entry1, vmm, jnp.bool_(True)))
    return reach0, reach1, vmm1


def bounded_spr_study(tree: FlatTree, X: int, t_X: float, missing_at_X: set,
                      seed_branch: int, seed_mut_idx: int, init_deltas: dict,
                      can_change_root: bool, packed=None):
    """All candidate regions reachable with <= 1 counted mutation crossing —
    the jit flood + host region-list rewrites.  Equals the host
    SprStudyBuilder with max_muts_from_start=1 as a set (pinned by
    tests/test_jit_spr_study.py)."""
    p = packed or pack_study_tree(tree)
    N, M, R = p["N"], p["M"], p["R"]
    root = p["root"]

    miss = np.sort(np.fromiter(missing_at_X, dtype=np.int64, count=len(missing_at_X))) \
        if missing_at_X else np.zeros(0, dtype=np.int64)
    idx = np.searchsorted(miss, p["m_site"])
    in_miss = (idx < len(miss)) & (miss[np.clip(idx, 0, max(len(miss) - 1, 0))]
                                   == p["m_site"]) if len(miss) else \
        np.zeros(M, dtype=bool)
    counted = ~in_miss

    # size effect of composing the one counted crossing with init_deltas
    d_down = np.ones(M, dtype=np.int32)
    d_up = np.ones(M, dtype=np.int32)
    for j in range(M):
        s = int(p["m_site"][j])
        if s in init_deltas:
            f0, t0 = init_deltas[s]
            d_down[j] = -1 if int(p["m_to"][j]) == t0 else 0
            d_up[j] = -1 if int(p["m_from"][j]) == t0 else 0

    rid_base = p["rid_base"]
    seed_rid = int(rid_base[seed_branch] + seed_mut_idx)
    excl_lo = int(rid_base[X])
    excl_hi = int(rid_base[X] + p["nb"][X])
    r_above = jnp.asarray(p["m_branch"] + np.arange(M, dtype=np.int64))

    reach0, reach1, vmm1 = _bounded_flood(
        R, jnp.asarray(seed_rid), jnp.asarray(excl_lo), jnp.asarray(excl_hi),
        r_above, jnp.asarray(counted), jnp.asarray(p["jr_parent"]),
        jnp.asarray(p["jr_child"]), jnp.int32(len(init_deltas)),
        jnp.asarray(d_down), jnp.asarray(d_up))
    reach0 = np.asarray(reach0)
    reach1 = np.asarray(reach1)
    vmm1 = np.asarray(vmm1)

    # region list with t bounds (host-side rewrites as in the host builder)
    t = np.asarray(tree.t, dtype=np.float64)
    parent = np.asarray(tree.parent)
    result = []
    mm_base = len(init_deltas)
    for rid in np.nonzero(reach0 | reach1)[0]:
        # invert rid -> (branch, idx)
        b = int(np.searchsorted(rid_base, rid, side="right") - 1)
        i = int(rid - rid_base[b])
        muts = tree.mutations[b]
        if b == root:
            t_min, t_max = NEG_BIG, float(t[b])
        else:
            t_min = float(t[parent[b]]) if i == 0 else muts[i - 1].t
            t_max = float(t[b]) if i == len(muts) else muts[i].t
        mm = mm_base if reach0[rid] else int(vmm1[rid])
        result.append(CandidateRegion(branch=b, mut_idx=i, t_min=t_min,
                                      t_max=t_max, min_muts=mm))

    # detachment accounting (spr_study.cpp:130-208) + t_X future trim
    if X != NO_NODE:
        P = int(parent[X])
        a, b2 = tree.children[P]
        S = int(b2) if int(a) == X else int(a)
        nmGP = len(tree.mutations[P])
        kept = []
        for r in result:
            if not can_change_root and r.branch == root:
                continue
            if r.branch in (S, P):
                if P != root:
                    if r.branch == S:
                        if r.mut_idx == 0:
                            r.t_min = (NEG_BIG if P == root else
                                       (float(t[parent[P]]) if nmGP == 0
                                        else tree.mutations[P][nmGP - 1].t))
                        r.mut_idx += nmGP
                    else:
                        if r.mut_idx == nmGP:
                            continue
                        r.branch = S
                else:
                    if not can_change_root:
                        if r.branch == P:
                            continue
                    else:
                        if (r.branch == S
                                and r.mut_idx == len(tree.mutations[S])):
                            r.mut_idx += nmGP
                            r.t_min = NEG_BIG
                        else:
                            continue
            kept.append(r)
        result = kept
    elif not can_change_root:
        result = [r for r in result if r.branch != root]

    out = []
    for r in result:
        if r.t_min >= t_X:
            continue
        if r.t_max > t_X:
            r.t_max = t_X
        out.append(r)
    return out
