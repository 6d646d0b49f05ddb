"""Tree partitioning + very-scalable coalescent tests (reference strategy:
partition/reassemble round trips + partial-prior cross-checks,
tests/very_scalable_coalescent_tests.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree, rereference_to_root_sequence
from delphy_tpu.topo.partition import (generate_random_partition_stencil,
                                       partition_tree, reassemble)
from delphy_tpu.topo.vsc import make_vsc_parts, VscPart
from delphy_tpu.topo.mixer import TopologyMixer, HostExpPop, HostCoalGrid
from delphy_tpu import pop as popm
from delphy_tpu.ops import coalescent as coal

import oracles


def make_tree(seed=0, T=30, L=200, mf=0.1):
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=3e-4, missing_fraction=mf, seed=seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(seed))
    rereference_to_root_sequence(tree)
    return tree


def fingerprint(tree):
    muts = []
    for n in range(tree.num_nodes):
        for m in tree.mutations[n]:
            muts.append((n, m.site, m.from_, m.to, round(m.t, 9)))
    miss = [(n, tuple(tree.miss_intervals[n]),
             tuple(sorted(tree.miss_from_states[n].items())))
            for n in range(tree.num_nodes)]
    return (tree.root, tuple(np.asarray(tree.parent)), tuple(sorted(muts)),
            tuple(miss), tuple(np.round(np.asarray(tree.t), 9)))


@pytest.mark.parametrize("seed,P", [(1, 3), (2, 4), (3, 2)])
def test_partition_reassemble_roundtrip(seed, P):
    tree = make_tree(seed=seed)
    before = fingerprint(tree)
    rng = np.random.default_rng(seed)
    stencil = generate_random_partition_stencil(tree, P, rng)
    parts = partition_tree(tree, stencil)
    assert len(parts) >= 1
    total_leaves = 0
    for p in parts:
        p.tree.check_integrity()
        total_leaves += p.tree.num_tips
    # each cut point appears twice: frozen tip in the parent part + root of
    # its own part
    assert sum(p.tree.num_nodes for p in parts) == tree.num_nodes + len(stencil)
    reassemble(tree, parts)
    assert fingerprint(tree) == before


def test_partition_parts_preserve_likelihood_structure():
    """Sum of part log_G contributions (excluding double-counted root priors)
    matches the whole-tree log_G: branch terms distribute exactly across parts
    (run.cpp:130-190 self-containment)."""
    from delphy_tpu.evo import make_evo_params
    tree = make_tree(seed=5)
    evo = make_evo_params(tree.num_sites, mu=3e-4, kappa=2.0)
    mu, nu, q, pi = (float(evo.mu), np.asarray(evo.nu), np.asarray(evo.q),
                     np.asarray(evo.pi))
    whole = oracles.log_G(tree, mu, nu, q, pi)

    rng = np.random.default_rng(5)
    stencil = generate_random_partition_stencil(tree, 3, rng)
    parts = partition_tree(tree, stencil)
    total = 0.0
    for p in parts:
        sub = p.tree
        # branch terms of all non-root branches
        for X in range(sub.num_nodes):
            if X != sub.root:
                total += oracles.branch_log_G(sub, X, mu, nu, q)
        if p.includes_root:
            total += oracles.log_root_prior(sub, pi)
    np.testing.assert_allclose(total, whole, rtol=1e-10)


def test_vsc_single_part_matches_scalable_prior():
    """With one part and auxiliaries at their means, the augmented partial
    prior equals the plain discretized prior (the decoupling is exact)."""
    tree = make_tree(seed=7, T=16)
    pop_host = HostExpPop(200.0, 150.0, 0.005, 1.0)
    parts = partition_tree(tree, [])
    assert len(parts) == 1 and parts[0].includes_root
    t_step = 2.0
    vsc = make_vsc_parts(parts, pop_host, [np.random.default_rng(0)], t_step,
                         k_twiddle_at_mean=True)[0]
    partial = vsc.calc_partial_log_prior(parts[0].tree)

    # plain grid prior over the same cells
    pj = popm.ExpPopParams(t0=jnp.float64(200.0), n0=jnp.float64(150.0),
                           g=jnp.float64(0.005), min_pop=jnp.float64(1.0))
    num_cells = len(vsc.k_bar_p)
    t_lo = vsc.t_ref - t_step * num_cells
    grid = coal.make_grid(pj, jnp.asarray(tree.t),
                          jnp.asarray(tree.children[:, 0] == -1),
                          t_lo, t_step, num_cells)
    plain = float(coal.calc_log_prior(grid, pj, jnp.asarray(tree.t),
                                      jnp.asarray(tree.children[:, 0] == -1)))
    np.testing.assert_allclose(partial, plain, rtol=1e-8)


def test_vsc_delta_matches_recompute():
    tree = make_tree(seed=9, T=20)
    pop_host = HostExpPop(200.0, 120.0, 0.0, 1.0)
    rng = np.random.default_rng(9)
    stencil = generate_random_partition_stencil(tree, 3, rng)
    parts = partition_tree(tree, stencil)
    rngs = [np.random.default_rng(100 + i) for i in range(len(parts))]
    vscs = make_vsc_parts(parts, pop_host, rngs, 1.5)
    for p, vsc in zip(parts, vscs):
        sub = p.tree
        base = vsc.calc_partial_log_prior(sub)
        inner = [n for n in range(sub.num_nodes)
                 if not sub.is_tip(n) and n != sub.root]
        for n in inner[:6]:
            old_t = float(sub.t[n])
            lo = float(sub.t[int(sub.parent[n])])
            hi = min(float(sub.t[c]) for c in sub.children[n])
            new_t = float(rng.uniform(lo, hi))
            delta, token = vsc.displace_delta(old_t, new_t)
            vsc.commit(token)
            sub.t[n] = new_t
            full = vsc.calc_partial_log_prior(sub)
            np.testing.assert_allclose(delta, full - base, atol=1e-9)
            base = full


def test_partitioned_topology_bursts_end_to_end():
    """Partition -> per-part topology bursts with the augmented prior ->
    reassemble: integrity, tip data preserved, log_G ledger consistent."""
    from delphy_tpu.evo import make_evo_params
    tree = make_tree(seed=11, T=30, L=300)
    evo = make_evo_params(tree.num_sites, mu=3e-4, kappa=2.0)
    seqs_before = [tree.sequence_at(i) for i in range(tree.num_tips)]
    missing_before = [tree.missing_sites_at(i) for i in range(tree.num_tips)]
    lg_before = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                              np.asarray(evo.q), np.asarray(evo.pi))
    pop_host = HostExpPop(200.0, 150.0, 0.0, 1.0)
    rng = np.random.default_rng(11)

    total_delta = 0.0
    total_acc = 0
    for round_i in range(3):
        stencil = generate_random_partition_stencil(tree, 3, rng)
        parts = partition_tree(tree, stencil)
        rngs = [np.random.default_rng(rng.integers(2 ** 63)) for _ in parts]
        vscs = make_vsc_parts(parts, pop_host, rngs, 1.5)
        for p, vsc, prng in zip(parts, vscs, rngs):
            if p.tree.num_nodes < 5:
                continue
            mixer = TopologyMixer(p.tree, prng,
                                  can_change_root=p.includes_root)
            tmx = float(np.max(p.tree.t_max[:p.tree.num_tips]))
            mixer.run_burst(60, float(evo.mu), np.asarray(evo.nu),
                            np.asarray(evo.q), np.asarray(evo.pi),
                            pop_host, tmx, coal=vsc)
            total_delta += mixer.delta_log_G
            total_acc += mixer.n_accepted
        reassemble(tree, parts)
        tree.check_integrity()
        rereference_to_root_sequence(tree)

    assert total_acc > 0
    lg_after = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                             np.asarray(evo.q), np.asarray(evo.pi))
    np.testing.assert_allclose(lg_after - lg_before, total_delta, atol=1e-7)
    for i in range(tree.num_tips):
        assert tree.missing_sites_at(i) == missing_before[i]
        got = tree.sequence_at(i)
        for l in range(tree.num_sites):
            if l not in missing_before[i]:
                assert got[l] == seqs_before[i][l]


def test_run_with_partitioned_bursts():
    """Run driver exercising the partitioned topology path (serial workers)."""
    from delphy_tpu.run import Run
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        40, 250, mu=3e-4, missing_fraction=0.08, seed=15)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(15))
    run = Run(tree, seed=15, num_cells=128, local_moves_per_global_move=1200,
              topology_partitions=3, topology_parallel_processes=False)
    run.topology_burst_chunks = 1  # tight burst cadence for this short window
    before = run.tree()
    seqs = [before.sequence_at(i) for i in range(before.num_tips)]
    missing = [before.missing_sites_at(i) for i in range(before.num_tips)]
    for _ in range(3):
        run.do_mcmc_steps(1200)
        run.check_derived_quantities(tol=1e-6)
    assert run.topology_accepted > 0
    after = run.tree()
    after.check_integrity()
    for i in range(after.num_tips):
        assert after.missing_sites_at(i) == missing[i]
        got = after.sequence_at(i)
        for l in range(after.num_sites):
            if l not in missing[i]:
                assert got[l] == seqs[i][l]


def test_run_partitioned_determinism():
    from delphy_tpu.run import Run
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        40, 200, mu=3e-4, seed=17)

    def go():
        tree = build_random_tree(ref, deltas, miss, dates, names=names,
                                 rng=np.random.default_rng(17))
        run = Run(tree, seed=17, num_cells=128,
                  local_moves_per_global_move=1000,
                  topology_partitions=3, topology_parallel_processes=False)
        run.do_mcmc_steps(2000)
        return run

    a, b = go(), go()
    assert a.log_posterior == b.log_posterior
    np.testing.assert_array_equal(np.asarray(a.ts.parent), np.asarray(b.ts.parent))


def test_split_oversized_cuts_bounds_every_part():
    from delphy_tpu.topo.partition import split_oversized_cuts
    tree = make_tree(seed=9, T=120, L=300)
    rng = np.random.default_rng(9)
    cap = 40
    stencil = generate_random_partition_stencil(tree, 4, rng)
    split = split_oversized_cuts(tree, stencil, cap)
    assert set(stencil) <= set(split)
    parts = partition_tree(tree, split)
    sizes = [p.tree.num_nodes for p in parts]
    assert max(sizes) <= cap, sizes
    # still a valid partition: round-trips and conserves nodes
    before = fingerprint(tree)
    assert sum(sizes) == tree.num_nodes + len(split)
    for p in parts:
        p.tree.check_integrity()
    reassemble(tree, parts)
    assert fingerprint(tree) == before


def test_split_oversized_cuts_no_op_when_under_cap():
    from delphy_tpu.topo.partition import split_oversized_cuts
    tree = make_tree(seed=10, T=40)
    rng = np.random.default_rng(10)
    stencil = generate_random_partition_stencil(tree, 4, rng)
    split = split_oversized_cuts(tree, stencil, cap=10**6)
    assert sorted(split) == sorted(stencil)


def test_run_part_cap_engages_and_ledger_green(monkeypatch):
    """A Run whose stencil overshoots the cap still sweeps correctly with
    the split engaged (part axis grows past the requested P)."""
    monkeypatch.setenv("DELPHY_TPU_PART_CAP", "24")
    from delphy_tpu.run import Run
    tree = make_tree(seed=11, T=60, L=300)
    run = Run(tree, seed=3, num_cells=64, device_partitions=4)
    sizes = np.asarray(run.pm.n_nodes)
    assert int(sizes.max()) <= 24
    assert run.pm.node_map.shape[0] >= 4
    run.do_mcmc_steps(3 * run.local_moves_per_global_move)
    run.check_derived_quantities(tol=1e-6)
    run.tree().check_integrity()


def test_native_stencil_matches_python_properties():
    """The native best-of-K stencil generator (delphy_best_stencil,
    topo_native.cpp) is the twin of the Python greedy
    (_py_partition_stencil): same validity properties — cut points are
    non-root inner-or-tip nodes whose parts partition the tree, the
    reported sizes equal partition_tree's actual part sizes, and best-of-K
    never reports a larger worst part than a single try from the same
    seed."""
    from delphy_tpu.native import best_stencil_native, native_available
    from delphy_tpu.topo.partition import _py_partition_stencil

    if not native_available():
        import pytest as _pytest
        _pytest.skip("no native toolchain")
    tree = make_tree(seed=11, T=120, L=300)
    rng = np.random.default_rng(3)
    cuts, sizes = best_stencil_native(tree, 6, rng, tries=1)
    assert len(sizes) == len(cuts) + 1
    assert int(tree.root) not in cuts
    assert len(set(cuts)) == len(cuts)
    parts = partition_tree(tree, list(cuts))
    # each cut node is counted twice across sizes — in its own part AND as
    # a frozen-tip branch retained in the parent part (the Python greedy's
    # `num_branches_left -= descendants - 1`) — matching partition_tree's
    # node collection
    assert sum(sizes) == tree.num_nodes + len(cuts)
    assert sum(p.tree.num_nodes for p in parts) == tree.num_nodes + len(cuts)
    # best-of-K reduces (never raises) the worst part vs single tries
    rng_a = np.random.default_rng(17)
    mx_single = []
    for _ in range(8):
        c1, s1 = best_stencil_native(tree, 6, rng_a, tries=1)
        mx_single.append(max(s1))
    rng_b = np.random.default_rng(23)
    _, s_best = best_stencil_native(tree, 6, rng_b, tries=8)
    # the selection loop guarantees best-of-8 <= the worst single try only
    # for the SAME seed set; across independent seeds the guaranteed bound
    # is vs the max (a median comparison would be statistical/brittle)
    assert max(s_best) <= int(np.max(mx_single))
    # determinism: same rng state => same stencil
    c_a, s_a = best_stencil_native(tree, 6, np.random.default_rng(5), tries=3)
    c_b, s_b = best_stencil_native(tree, 6, np.random.default_rng(5), tries=3)
    assert c_a == c_b and s_a == s_b
    # the Python twin still produces valid stencils of the same shape
    pc, ps = _py_partition_stencil(tree, 6, np.random.default_rng(5))
    assert len(ps) == len(pc) + 1 and sum(ps) == tree.num_nodes + len(pc)
