"""Sequence-encoding and missation-normalization unit tests, mirroring the
reference's sequence_tests.cpp and missation_map_tests.cpp coverage."""

import numpy as np

from delphy_tpu import seq as seqm
from delphy_tpu.phylo import (FlatTree, Mutation, NO_NODE, fix_up_missations,
                              build_random_tree)
from delphy_tpu.sim import simulate_dataset


# ---- 4-bit / 2-bit encodings (core/sequence.h) ------------------------------

def test_iupac_bits_roundtrip_real_letters():
    bits = seqm.str_to_bits("ACGTU")
    # each real letter is a one-hot 4-bit mask
    assert list(bits[:4]) == [1, 2, 4, 8]
    assert bits[4] == bits[3]  # U == T
    real = seqm.bits_to_real(bits[:4])
    assert list(real) == [seqm.A, seqm.C, seqm.G, seqm.T]
    assert seqm.real_to_str(real) == "ACGT"


def test_iupac_ambiguity_codes():
    bits = seqm.str_to_bits("RYSWKMBDHVN-")
    # R = A|G, Y = C|T, N = all four, '-' = gap/all-missing
    assert bits[0] == (1 | 4)
    assert bits[1] == (2 | 8)
    assert bits[10 - 0] == 15  # N
    assert seqm.is_ambiguous(bits).all()
    # ambiguous letters have no unique real state
    assert (seqm.bits_to_real(bits) == -1).all()


def test_str_to_real_rejects_ambiguity():
    import pytest
    assert seqm.real_to_str(seqm.str_to_real("ACGT")) == "ACGT"
    with pytest.raises(ValueError):
        seqm.str_to_real("ACNT")


# ---- missation normalization (phylo_tree.h:102, mutations.h:250-350) --------

def _tiny_tree():
    # 3 tips, 2 inner nodes; explicit construction
    ref = np.array([0, 0, 0, 0, 0, 0], dtype=np.int8)
    # topology: root R=4 with children (3, tip2); node 3 children (tip0, tip1)
    parent = np.array([3, 3, 4, 4, NO_NODE], dtype=np.int32)
    children = np.full((5, 2), NO_NODE, dtype=np.int32)
    children[3] = (0, 1)
    children[4] = (2, 3)
    t = np.array([10.0, 10.0, 10.0, 5.0, 0.0])
    tree = FlatTree(parent=parent, children=children, t=t,
                    t_min=np.array([10.0, 10.0, 10.0, -np.inf, -np.inf]),
                    t_max=np.array([10.0, 10.0, 10.0, np.inf, np.inf]),
                    root=4, ref_seq=ref,
                    mutations=[[] for _ in range(5)],
                    miss_intervals=[[] for _ in range(5)],
                    miss_from_states=[{} for _ in range(5)],
                    name=["t0", "t1", "t2", "", ""])
    return tree


def test_fix_up_missations_factors_common_sites_to_parent():
    tree = _tiny_tree()
    # site 2 missing at BOTH tips 0 and 1 -> factored up to node 3
    tree.miss_intervals[0] = [(2, 3), (4, 5)]
    tree.miss_intervals[1] = [(2, 3)]
    fix_up_missations(tree)
    tree.check_integrity()
    assert (2, 3) in tree.miss_intervals[3]
    assert all(not (s <= 2 < e) for (s, e) in tree.miss_intervals[0])
    assert tree.miss_intervals[1] == []
    # the non-shared site stays on tip 0
    assert any(s <= 4 < e for (s, e) in tree.miss_intervals[0])


def test_fix_up_missations_absorbs_parent_mutation_from_state():
    tree = _tiny_tree()
    from delphy_tpu.init_tree import ROOT_DELTA_T
    # state chain at site 1: ref 0 -> 2 (above-root delta) -> 3 (node-3
    # branch mutation); both tips below node 3 are missing at site 1 with
    # from-state 3
    tree.mutations[4] = [Mutation(site=1, from_=0, to=2, t=ROOT_DELTA_T)]
    tree.mutations[3] = [Mutation(site=1, from_=2, to=3, t=2.0)]
    tree.miss_intervals[0] = [(1, 2)]
    tree.miss_intervals[1] = [(1, 2)]
    tree.miss_from_states[0][1] = 3
    tree.miss_from_states[1][1] = 3
    fix_up_missations(tree)
    tree.check_integrity()
    assert (1, 2) in tree.miss_intervals[3]
    # the uninformative branch mutation is absorbed; the missation's
    # from-state becomes the state at the branch START (the mutation's from)
    assert tree.mutations[3] == []
    assert tree.miss_from_states[3].get(1) == 2


def test_fix_up_missations_idempotent_on_random_trees():
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        10, 120, mu=4e-3, missing_fraction=0.15, seed=31)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(31))
    before = [list(iv) for iv in tree.miss_intervals]
    fix_up_missations(tree)
    tree.check_integrity()
    after1 = [list(iv) for iv in tree.miss_intervals]
    fix_up_missations(tree)
    after2 = [list(iv) for iv in tree.miss_intervals]
    assert after1 == after2  # idempotent
    # tip data preserved: the set of missing sites per tip is unchanged
    def tip_missing(tree, i):
        out = set()
        n = i
        while n != NO_NODE:
            for (s, e) in tree.miss_intervals[n]:
                out.update(range(s, e))
            n = int(tree.parent[n])
        return out
    t2 = build_random_tree(ref, deltas, miss, dates, names=names,
                           rng=np.random.default_rng(31))
    for i in range(tree.num_tips):
        assert tip_missing(tree, i) == tip_missing(t2, i)


# ---- interval/site-set algebra (core/interval_set.h) ------------------------

def test_complement_sites_algebra():
    from delphy_tpu.topo.graft import ComplementSites, _sites_to_intervals
    cs = ComplementSites(10)
    assert len(cs) == 10 and 0 in cs and 9 in cs and 10 not in cs and -1 not in cs
    cs2 = cs - {3, 4}
    assert len(cs2) == 8 and 3 not in cs2 and 5 in cs2
    cs3 = cs2 - {4, 7}       # overlapping exclusion composes as a union
    assert len(cs3) == 7 and 7 not in cs3
    assert bool(ComplementSites(2) - {0, 1}) is False

    # site-set <-> interval round trip (single-pass merging of runs)
    assert _sites_to_intervals(set()) == []
    assert _sites_to_intervals({1, 2, 3, 7, 9, 10}) == [(1, 4), (7, 8), (9, 11)]
    ivs = _sites_to_intervals({0, 2, 3, 4, 8})
    back = set()
    for (s, e) in ivs:
        back.update(range(s, e))
    assert back == {0, 2, 3, 4, 8}
