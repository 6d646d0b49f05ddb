"""ops/runset.py fixed-shape run algebra vs Python set oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from delphy_tpu.ops import runset as rsn


def _rand_intervals(rng, L, max_runs):
    n = int(rng.integers(0, max_runs + 1))
    pts = sorted(rng.choice(2 * L, size=2 * n, replace=False)) if n else []
    out = []
    for i in range(0, 2 * n, 2):
        s, e = int(pts[i]), int(pts[i + 1])
        if s < e:
            out.append((s % L, s % L + (e - s) % (L // 2) + 1))
    # canonicalize
    sites = set()
    for s, e in out:
        sites.update(range(s, min(e, L)))
    return _sites_to_ivs(sites), sites


def _sites_to_ivs(sites):
    if not sites:
        return []
    arr = sorted(sites)
    out, start, prev = [], arr[0], arr[0]
    for x in arr[1:]:
        if x != prev + 1:
            out.append((start, prev + 1))
            start = x
        prev = x
    out.append((start, prev + 1))
    return out


@pytest.mark.parametrize("seed", range(8))
def test_combine_matches_set_oracle(seed):
    rng = np.random.default_rng(seed)
    L, WR = 500, 24
    for trial in range(25):
        ia, sa = _rand_intervals(rng, L, 5)
        ib, sb = _rand_intervals(rng, L, 5)
        if len(ia) > WR or len(ib) > WR:
            continue
        a = tuple(jnp.asarray(x) for x in rsn.make_row(ia, WR))
        b = tuple(jnp.asarray(x) for x in rsn.make_row(ib, WR))
        for op, oracle in [("union", sa | sb), ("minus", sa - sb),
                           ("intersect", sa & sb)]:
            rs, re, cnt, ok = rsn.combine(*a, *b, op=op, WR_out=WR)
            assert bool(ok), (op, ia, ib)
            got = rsn.row_to_intervals(rs, re, cnt)
            assert got == _sites_to_ivs(oracle), (op, ia, ib, got)
            # canonical: sorted, disjoint, non-adjacent
            for i in range(1, len(got)):
                assert got[i][0] > got[i - 1][1]
        # sizes + membership
        assert int(rsn.row_size(*a)) == len(sa)
        sites = jnp.arange(L)
        mask = np.asarray(rsn.contains_many(a[0], a[1], sites))
        assert set(np.nonzero(mask)[0].tolist()) == sa


def test_overflow_flag():
    WR = 4
    ia = [(0, 1), (2, 3), (4, 5), (6, 7)]
    ib = [(10, 11), (12, 13), (14, 15)]
    a = tuple(jnp.asarray(x) for x in rsn.make_row(ia, WR))
    b = tuple(jnp.asarray(x) for x in rsn.make_row(ib, WR))
    rs, re, cnt, ok = rsn.combine(*a, *b, op="union", WR_out=4)
    assert not bool(ok)
    rs, re, cnt, ok = rsn.combine(*a, *b, op="union", WR_out=8)
    assert bool(ok) and int(cnt) == 7


def test_empty_rows():
    WR = 8
    e = rsn.empty_row(WR)
    a = tuple(jnp.asarray(x) for x in rsn.make_row([(3, 9)], WR))
    for op, expect in [("union", [(3, 9)]), ("minus", [(3, 9)]),
                       ("intersect", [])]:
        rs, re, cnt, ok = rsn.combine(*a, *e, op=op, WR_out=WR)
        assert bool(ok)
        assert rsn.row_to_intervals(rs, re, cnt) == expect
    rs, re, cnt, ok = rsn.combine(*e, *e, op="union", WR_out=WR)
    assert bool(ok) and int(cnt) == 0
