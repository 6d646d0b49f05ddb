import sys
sys.path.insert(0, 'tests')
import math
import numpy as np
from test_topo import make_tree, make_ctx, oracle_log_G
from delphy_tpu.phylo import NO_NODE


def site_branch_logG(tree, evo, X, l):
    """Oracle: contribution of site l to log_G over branch ending at X."""
    mu = float(evo.mu)
    nu = np.asarray(evo.nu)
    q = np.asarray(evo.q)
    qa = -np.diagonal(q)
    P = int(tree.parent[X])
    t_P, t_X = float(tree.t[P]), float(tree.t[X])
    # missing on this branch?
    cur = X
    while cur != NO_NODE:
        for (s, e) in tree.miss_intervals[cur]:
            if s <= l < e:
                return 0.0
        cur = int(tree.parent[cur])
    seq_above = tree.sequence_at(P)
    s = int(seq_above[l])
    t_cur = t_P
    out = 0.0
    for m in tree.mutations[X]:
        if m.site == l:
            out += -mu * nu[l] * qa[s] * (m.t - t_cur)
            out += math.log(mu * nu[l] * q[m.from_, m.to])
            t_cur = m.t
            s = m.to
    out += -mu * nu[l] * qa[s] * (t_X - t_cur)
    return out


def graft_oracle_contribs(tree, evo, g):
    """Per-branch-info oracle contribution: sum of per-site branch log G over
    the hot sites along the path A_i -> X, plus root-prior corrections."""
    X = g.X
    out = []
    pi = np.asarray(evo.pi)
    for bi in g.branch_infos:
        total = 0.0
        # path from X up to A (for rooty S_P_X: path S..P plus P..X)
        if g.rooty:
            # handled separately by caller
            out.append(None)
            continue
        path = []
        cur = X
        while True:
            path.append(cur)
            p = int(tree.parent[cur])
            if p == bi.A or cur == bi.A:
                break
            if p == NO_NODE:
                break
            cur = p
        for l in sorted(bi.hot_sites):
            for b in path:
                if b == tree.root:
                    continue
                total += site_branch_logG(tree, evo, b, l)
        if bi.is_open:
            # root prior corrections: state at root for hot sites vs ref-based
            for l in sorted(bi.hot_sites):
                pass
        out.append(total)
    return out


def main():
    tree, evo, rng = make_tree(seed=0, T=12, L=80, missing_fraction=0.15)
    ctx = make_ctx(tree, evo)
    N = tree.num_nodes
    # find node with a 3-level inner graft
    for X in range(N):
        if X == tree.root or int(tree.parent[X]) == tree.root:
            continue
        g = ctx.analyze_graft(X)
        if len(g.branch_infos) >= 3 and not g.branch_infos[-1].is_open:
            print(f"X={X}: {len(g.branch_infos)} levels")
            oc = graft_oracle_contribs(tree, evo, g)
            t_X = float(tree.t[X])
            for i, bi in enumerate(g.branch_infos):
                got = ctx.branch_log_G(t_X - bi.T_to_X, t_X,
                                       bi.partial_lambda_at_X, bi.hot_muts_to_X)
                print(f"  level {i}: A={bi.A} B={bi.B} warm={len(bi.warm_sites)} "
                      f"hot={len(bi.hot_sites)} plA={bi.partial_lambda_at_A:.6f} "
                      f"plX={bi.partial_lambda_at_X:.6f} muts={len(bi.hot_muts_to_X)} "
                      f"got={got:.6f} oracle={oc[i]:.6f} err={got - oc[i]:.6f}")
            print(f"  total delta_log_G={g.delta_log_G:.6f} "
                  f"oracle_sum={sum(oc):.6f}")


main()
