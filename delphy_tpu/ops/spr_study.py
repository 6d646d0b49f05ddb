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

    def _member(sorted_arr, values):
        if len(sorted_arr) == 0:
            return np.zeros(len(values), dtype=bool)
        i = np.searchsorted(sorted_arr, values)
        i_c = np.clip(i, 0, len(sorted_arr) - 1)
        return (i < len(sorted_arr)) & (sorted_arr[i_c] == values)

    miss = (np.sort(np.fromiter(missing_at_X, dtype=np.int64,
                                count=len(missing_at_X)))
            if missing_at_X else np.zeros(0, dtype=np.int64))
    counted = ~_member(miss, p["m_site"])

    # size effect of composing the one counted crossing with init_deltas:
    # +1 site absent, -1 crossing cancels the stored delta, else 0
    d_down = np.ones(M, dtype=np.int32)
    d_up = np.ones(M, dtype=np.int32)
    if init_deltas:
        d_sites = np.sort(np.fromiter(init_deltas, dtype=np.int64,
                                      count=len(init_deltas)))
        d_t0 = np.array([init_deltas[int(s)][1] for s in d_sites],
                        dtype=np.int64)
        hit = _member(d_sites, p["m_site"])
        pos = np.clip(np.searchsorted(d_sites, p["m_site"]), 0,
                      len(d_sites) - 1)
        t0 = d_t0[pos]
        d_down = np.where(hit, np.where(p["m_to"] == t0, -1, 0), 1) \
            .astype(np.int32)
        d_up = np.where(hit, np.where(p["m_from"] == t0, -1, 0), 1) \
            .astype(np.int32)

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


# ---------------------------------------------------------------------------
# Region weights, sampling, and proposal densities (spr_study.cpp:226-547)
# as jit kernels over the enumerated region arrays.
# ---------------------------------------------------------------------------

def pack_regions(tree: FlatTree, regions):
    """Region list -> flat arrays (branch, above_root, t_min, t_max,
    min_muts, t_S)."""
    t = np.asarray(tree.t, dtype=np.float64)
    br = np.array([r.branch for r in regions], dtype=np.int64)
    return dict(
        branch=jnp.asarray(br),
        above=jnp.asarray(np.array([r.t_min == NEG_BIG for r in regions])),
        t_min=jnp.asarray(np.array([r.t_min for r in regions])),
        t_max=jnp.asarray(np.array([r.t_max for r in regions])),
        mm=jnp.asarray(np.array([r.min_muts for r in regions],
                                dtype=np.float64)),
        t_S=jnp.asarray(t[br]),
    )


def _root_s_bounds(t_S, t_X, t_max_tip):
    s_min = jnp.abs(t_X - t_S)
    s_max = s_min + 20.0 * jnp.maximum(t_max_tip - jnp.minimum(t_X, t_S), 0.0)
    return s_min, s_max


def _log_gamma_integral(a, x_min, x_max):
    """log(Q(a, x_min) - Q(a, x_max)), -inf when empty
    (safe_gamma_math.h:82-90)."""
    from jax.scipy.special import gammaincc
    diff = jnp.maximum(gammaincc(a, x_min) - gammaincc(a, x_max), 0.0)
    return jnp.where(diff > 0.0, jnp.log(jnp.maximum(diff, 1e-300)),
                     -jnp.inf)


@jax.jit
def study_log_weights(reg, lambda_X, f, t_X, t_max_tip, mu):
    """log W per region up to the common normalization
    (spr_study.cpp:260-330; host twin topo/study.py SprStudy.__init__)."""
    from jax.scipy.special import gammaln
    m = reg["mm"]
    # inner regions
    t_prime = 0.5 * (reg["t_min"] + reg["t_max"])
    arg1 = f * lambda_X * (reg["t_max"] - reg["t_min"])
    arg2 = mu * (t_X - t_prime) / 3.0
    inner_bad = (arg1 <= 0.0) | ((m > 0) & (arg2 <= 0.0))
    safe1 = jnp.where(arg1 > 0, arg1, 1.0)
    safe2 = jnp.where(arg2 > 0, arg2, 1.0)
    lw_inner = jnp.where(
        inner_bad, -jnp.inf,
        jnp.log(safe1) + f * (-lambda_X * (t_X - t_prime)
                              + m * jnp.log(safe2)))
    # above-root region
    s_min, s_max = _root_s_bounds(reg["t_S"], t_X, t_max_tip)
    x_min = lambda_X * f * s_min
    x_max = lambda_X * f * s_max
    alpha = f * m + 1.0
    ratio = jnp.where(s_max > 0, s_min / jnp.where(s_max > 0, s_max, 1.0), 0.0)
    lw_root_small = (-jnp.log(2.0) + jnp.log(f * lambda_X)
                     + f * m * jnp.log(mu / 3.0)
                     + alpha * jnp.log(jnp.maximum(s_max, 1e-300))
                     + jnp.log1p(-ratio ** alpha) - jnp.log(alpha))
    lw_root_big = (-jnp.log(2.0) + f * m * jnp.log(mu / (3.0 * lambda_X * f))
                   + gammaln(alpha) + _log_gamma_integral(alpha, x_min, x_max))
    lw_root = jnp.where(x_max < 0.01, lw_root_small, lw_root_big)
    return jnp.where(reg["above"], lw_root, lw_inner)


@jax.jit
def pick_nexus_region(u01, log_w):
    """Region index from one uniform, exactly the host's scan over
    W/W_max (same u -> same index a.e.)."""
    log_wmax = jnp.max(log_w)
    log_wmax = jnp.where(jnp.isfinite(log_wmax), log_wmax, 0.0)
    w = jnp.exp(log_w - log_wmax)
    c = jnp.cumsum(w)
    u = u01 * c[-1]
    return jnp.minimum(jnp.searchsorted(c, u, side="left"),
                       log_w.shape[0] - 1).astype(jnp.int32)


def _gammainccinv_jax(a, q, x_hi):
    """Inverse of Q(a, x) in x by bisection over [0, x_hi] (jax has no
    gammainccinv; callers clip the result into [x_lo, x_hi]/rate anyway, so
    q below Q(a, x_hi) — including underflowed-to-0 deep tails — correctly
    saturates at x_hi)."""
    from jax.scipy.special import gammaincc
    lo = jnp.zeros_like(q)
    hi = x_hi * jnp.ones_like(q)

    def body(i, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        too_low_x = gammaincc(a, mid) < q  # Q decreasing: Q(mid)<q -> x too big
        hi = jnp.where(too_low_x, mid, hi)
        lo = jnp.where(too_low_x, lo, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 100, body, (lo, hi))
    return 0.5 * (lo + hi)


@jax.jit
def pick_time_in_region(u01, idx, reg, lambda_X, f, t_X, t_max_tip):
    """Proposal time within region idx from one uniform
    (spr_study.cpp pick_time; host twin pick_time_in_region)."""
    t_min = reg["t_min"][idx]
    t_max = reg["t_max"][idx]
    m = reg["mm"][idx]
    t_S = reg["t_S"][idx]
    above = reg["above"][idx]
    t_inner = t_max - u01 * (t_max - t_min)

    s_min, s_max = _root_s_bounds(t_S, t_X, t_max_tip)
    x_max = lambda_X * f * s_max
    alpha = f * m + 1.0
    U = 1e-16 + u01 * (1.0 - 1e-16)
    s_small = (s_min ** alpha + U * (s_max ** alpha - s_min ** alpha)) \
        ** (1.0 / alpha)
    from jax.scipy.special import gammaincc
    Q_hi = gammaincc(alpha, lambda_X * f * s_min)
    Q_lo = gammaincc(alpha, lambda_X * f * s_max)
    Q = Q_lo + U * (Q_hi - Q_lo)
    y = _gammainccinv_jax(alpha, Q, lambda_X * f * s_max + 1.0)
    s_big = jnp.clip(y / (lambda_X * f), s_min, s_max)
    s = jnp.where(x_max < 0.01, s_small, s_big)
    t_root = jnp.clip(0.5 * (t_X + t_S - s), t_min, t_max)
    return jnp.where(above, t_root, t_inner)


@jax.jit
def log_alpha_in_region(idx, t, log_w, reg, lambda_X, f, t_X, t_max_tip):
    """Proposal log-density of (region idx, time t) given the study weights
    (spr_study.cpp log_alpha; host twin log_alpha_in_region)."""
    from jax.scipy.special import gammaln
    log_p_region = log_w[idx] - jax.scipy.special.logsumexp(log_w)
    t_min = reg["t_min"][idx]
    t_max = reg["t_max"][idx]
    m = reg["mm"][idx]
    t_S = reg["t_S"][idx]
    above = reg["above"][idx]

    la_inner = log_p_region - jnp.log(t_max - t_min)

    s_min, s_max = _root_s_bounds(t_S, t_X, t_max_tip)
    x_min = lambda_X * f * s_min
    x_max = lambda_X * f * s_max
    s = (t_X - t) + (t_S - t)
    alpha = f * m + 1.0
    ratio = jnp.where(s_max > 0, s_min / jnp.where(s_max > 0, s_max, 1.0), 0.0)
    la_small = (log_p_region + jnp.log(2.0) + jnp.log(alpha)
                + (alpha - 1.0) * jnp.log(jnp.maximum(s, 1e-300))
                - alpha * jnp.log(jnp.maximum(s_max, 1e-300))
                - jnp.log1p(-ratio ** alpha))
    la_big = (log_p_region + jnp.log(2.0) + jnp.log(lambda_X * f)
              + f * m * jnp.log(lambda_X * f * jnp.maximum(s, 1e-300))
              - lambda_X * f * s - gammaln(alpha)
              - _log_gamma_integral(alpha, x_min, x_max))
    la_root = jnp.where(s > s_max + 1e-6, -jnp.inf,
                        jnp.where(x_max < 0.01, la_small, la_big))
    return jnp.where(above, la_root, la_inner)


@jax.jit
def find_region(branch, t, reg):
    """Index of the region containing (branch, t), -1 if none (the reverse-
    proposal lookup, spr_study.cpp find_region; host twin find_region)."""
    hit = ((reg["branch"] == branch) & (reg["t_min"] < t)
           & (t <= reg["t_max"]))
    idx = jnp.argmax(hit)
    return jnp.where(jnp.any(hit), idx, -1).astype(jnp.int32)
