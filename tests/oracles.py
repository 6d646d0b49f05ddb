"""Slow, direct-formula host oracles for likelihood quantities.

Deliberately written as straightforward per-site / per-branch loops over the
host FlatTree so they share no code with the vectorized device kernels they
validate (mirroring the reference's oracle micro-tree test style,
tests/phylo_tree_calc_tests.cpp)."""

from __future__ import annotations

import numpy as np

from delphy_tpu.phylo import FlatTree, NO_NODE


def q_a(q):
    return -np.diagonal(q)


def _q_site(q, L):
    """Broadcast q to per-site (L,4,4): accepts a single 4x4 matrix or a
    per-site stack (the mpox hack's 2-partition model resolved per site)."""
    q = np.asarray(q, dtype=np.float64)
    if q.ndim == 2:
        return np.broadcast_to(q, (L, 4, 4))
    return q


def lambda_at(tree: FlatTree, node: int, mu, nu, q) -> float:
    seq = tree.sequence_at(node)
    missing = tree.missing_sites_at(node)
    qs = _q_site(q, tree.num_sites)
    return sum(mu * nu[l] * (-qs[l, seq[l], seq[l]])
               for l in range(tree.num_sites) if l not in missing)


def lambda_i_all(tree: FlatTree, mu, nu, q):
    return np.array([lambda_at(tree, n, mu, nu, q) for n in range(tree.num_nodes)])


def branch_log_G(tree: FlatTree, X: int, mu, nu, q) -> float:
    assert X != tree.root
    qs = _q_site(q, tree.num_sites)
    P = int(tree.parent[X])
    t_P, t_X = tree.t[P], tree.t[X]
    lam_X = lambda_at(tree, X, mu, nu, q)
    result = -lam_X * (t_X - t_P)
    for m in tree.mutations[X]:
        qa_f = -qs[m.site, m.from_, m.from_]
        qa_t = -qs[m.site, m.to, m.to]
        result -= mu * nu[m.site] * (qa_f - qa_t) * (m.t - t_P)
        result += np.log(mu * nu[m.site] * qs[m.site, m.from_, m.to])
    return result


def log_root_prior(tree: FlatTree, pi) -> float:
    seq = tree.sequence_at(tree.root)
    root_missing = set()
    for (s, e) in tree.miss_intervals[tree.root]:
        root_missing.update(range(s, e))
    result = 0.0
    for l in range(tree.num_sites):
        if l not in root_missing:
            result += np.log(pi[seq[l]])
    return result


def log_G(tree: FlatTree, mu, nu, q, pi) -> float:
    total = log_root_prior(tree, pi)
    for X in range(tree.num_nodes):
        if X != tree.root:
            total += branch_log_G(tree, X, mu, nu, q)
    return total


def T_l_a(tree: FlatTree):
    """Exact per-site state-time accounting by brute-force branch walks."""
    L = tree.num_sites
    out = np.zeros((L, 4))
    for X in range(tree.num_nodes):
        if X == tree.root:
            continue
        P = int(tree.parent[X])
        t_P, t_X = tree.t[P], tree.t[X]
        seq_above = tree.sequence_at(P)
        missing = tree.missing_sites_at(X)
        for l in range(L):
            if l in missing:
                continue
            s = seq_above[l]
            t_cur = t_P
            for m in sorted(tree.mutations[X], key=lambda m: (m.t, m.site)):
                if m.site == l:
                    out[l, s] += m.t - t_cur
                    t_cur = m.t
                    s = m.to
            out[l, s] += t_X - t_cur
    return out


def Ttwiddle_a(tree: FlatTree, nu):
    tla = T_l_a(tree)
    return (nu[:, None] * tla).sum(axis=0)


def Ttwiddle_l(tree: FlatTree, q):
    tla = T_l_a(tree)
    return (tla * q_a(q)[None, :]).sum(axis=1)


def coal_k_bar(tree: FlatTree, t_lo, t_step, C):
    k = np.zeros(C)
    for n in range(tree.num_nodes):
        sign = 1.0 if tree.is_tip(n) else -1.0
        for c in range(C):
            lb = t_lo + c * t_step
            k[c] += sign * np.clip((tree.t[n] - lb) / t_step, 0.0, 1.0)
    return k


def coal_log_prior(tree: FlatTree, t_lo, t_step, C, pop_at_time, pop_integral):
    k = coal_k_bar(tree, t_lo, t_step, C)
    nbar = np.array([max(pop_integral(t_lo + c * t_step, t_lo + (c + 1) * t_step) / t_step, 1e-100)
                     for c in range(C)])
    out = -np.sum(t_step * k * (k - 1) / (2 * nbar))
    for n in range(tree.num_nodes):
        if not tree.is_tip(n):
            out -= np.log(pop_at_time(tree.t[n]))
    return out
