"""Fixed-shape interval-run set algebra for device missation bookkeeping.

A site set is a padded row of sorted, disjoint, non-adjacent half-open runs
[rs, re): arrays of static width WR with `cnt` real runs; pad slots hold
rs = re = BIG.  This is the device twin of the native kernel's interval-run
`Sites` (topo_native.cpp) and the reference's Interval_set
(core/interval_set.h:14-29), designed so every operation is a fixed-shape
vector program: membership is a WR-lane compare, and union/minus/intersect
run one generic boundary sweep (all set boundaries partition the line into
segments on which membership in each operand is constant).

Row convention everywhere: (rs, re, cnt) with rs/re int32 (WR,), cnt int32
scalar.  Ops that can overflow the output width return an `ok` flag; the
caller rejects the MCMC proposal on overflow (same contract as the delta
buffers in ops/spr_move.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BIG = jnp.int32(2 ** 30)


def make_row(intervals, WR: int):
    """Host: interval list [(s, e), ...] (canonical: sorted disjoint
    non-adjacent) -> padded row triple (numpy)."""
    assert len(intervals) <= WR, (len(intervals), WR)
    rs = np.full(WR, int(BIG), np.int32)
    re = np.full(WR, int(BIG), np.int32)
    for i, (s, e) in enumerate(intervals):
        rs[i], re[i] = s, e
    return rs, re, np.int32(len(intervals))


def row_to_intervals(rs, re, cnt):
    """Host: padded row -> interval list."""
    rs, re, cnt = np.asarray(rs), np.asarray(re), int(cnt)
    return [(int(rs[i]), int(re[i])) for i in range(cnt)]


def contains(rs, re, site):
    """Membership of a scalar site (pad slots never match: BIG <= site is
    false for real sites)."""
    return jnp.any((rs <= site) & (site < re))


def contains_many(rs, re, sites):
    """Membership mask for a vector of sites: (S,) bool."""
    return jnp.any((rs[None, :] <= sites[:, None])
                   & (sites[:, None] < re[None, :]), axis=1)


def row_size(rs, re, cnt):
    idx = jnp.arange(rs.shape[0])
    return jnp.sum(jnp.where(idx < cnt, re - rs, 0)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("op", "WR_out"))
def combine(ars, are, acnt, brs, bre, bcnt, op: str, WR_out: int):
    """Generic boundary sweep: returns (rs, re, cnt, ok) of op(a, b) where
    op is "union" | "minus" | "intersect".  ok=False iff the result needs
    more than WR_out runs."""
    pts = jnp.sort(jnp.concatenate([ars, are, brs, bre]))
    lo = pts[:-1]
    hi = pts[1:]
    in_a = jnp.any((ars[None, :] <= lo[:, None]) & (lo[:, None] < are[None, :]),
                   axis=1)
    in_b = jnp.any((brs[None, :] <= lo[:, None]) & (lo[:, None] < bre[None, :]),
                   axis=1)
    if op == "union":
        keep = in_a | in_b
    elif op == "minus":
        keep = in_a & ~in_b
    elif op == "intersect":
        keep = in_a & in_b
    else:  # pragma: no cover
        raise ValueError(op)
    keep = keep & (lo < hi) & (lo < BIG)
    # merge adjacent kept segments: a new output run starts at a kept segment
    # not continued from the previous kept segment.  Zero-length segments
    # (lo == hi) carry continuity, so "previous" means the nearest segment
    # with lo < hi; since boundaries are sorted, hi[i-1] == lo[i] whenever
    # the intervening segments are zero-length — walk continuity through a
    # scan over (kept, gap) pairs.
    S = lo.shape[0]
    nonempty = lo < hi

    def body(carry, x):
        prev_keep_end, = carry
        k, l, h, ne = x
        is_start = k & (l != prev_keep_end)
        new_end = jnp.where(k, h, jnp.where(ne, jnp.int32(-1), prev_keep_end))
        return (new_end,), is_start

    (_,), is_start = jax.lax.scan(
        body, (jnp.int32(-1),),
        (keep, lo, hi, nonempty))
    gid = jnp.cumsum(is_start) - 1
    n_out = jnp.sum(is_start)
    ok = n_out <= WR_out
    sink = WR_out
    idx_s = jnp.where(is_start, jnp.clip(gid, 0, WR_out - 1), sink)
    rs_out = jnp.full(WR_out + 1, BIG, jnp.int32).at[idx_s].set(lo)[:WR_out]
    idx_e = jnp.where(keep, jnp.clip(gid, 0, WR_out - 1), sink)
    re_out = jnp.zeros(WR_out + 1, jnp.int32).at[idx_e].max(hi)[:WR_out]
    re_out = jnp.where(jnp.arange(WR_out) < jnp.minimum(n_out, WR_out),
                       re_out, BIG)
    return rs_out, re_out, n_out.astype(jnp.int32), ok


def row_union(a, b, WR_out: int):
    return combine(*a, *b, op="union", WR_out=WR_out)


def row_minus(a, b, WR_out: int):
    return combine(*a, *b, op="minus", WR_out=WR_out)


def row_intersect(a, b, WR_out: int):
    return combine(*a, *b, op="intersect", WR_out=WR_out)


def empty_row(WR: int):
    return (jnp.full(WR, BIG, jnp.int32), jnp.full(WR, BIG, jnp.int32),
            jnp.int32(0))
