"""Native (C++) topology-burst kernel vs the Python machinery's invariants.

The kernel is a port of delphy_tpu/topo/; these tests hold it to the same
exactness bars as the Python mixer: ledger delta == full log_G recompute,
canonical-form tree integrity, and bit-preservation of tip data."""

import numpy as np
import pytest

from delphy_tpu.evo import make_evo_params
from delphy_tpu.phylo import build_random_tree, rereference_to_root_sequence
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.topo.mixer import HostExpPop, HostSkygridPop
from delphy_tpu.native import native_available, run_burst_native

import oracles

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def make_tree(seed, T=14, L=120, mu=5e-3):
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T, L, mu=mu, missing_fraction=0.15, seed=seed)
    rng = np.random.default_rng(seed + 1000)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    evo = make_evo_params(L, mu=mu, kappa=2.0, pi=(0.28, 0.22, 0.26, 0.24),
                          nu=rng.gamma(8.0, 1 / 8.0, size=L))
    return tree, evo, rng


def snapshot_tips(tree):
    return ([tree.sequence_at(i) for i in range(tree.num_tips)],
            [tree.missing_sites_at(i) for i in range(tree.num_tips)])


def check_tips(tree, seqs_before, missing_before):
    for i in range(tree.num_tips):
        assert tree.missing_sites_at(i) == missing_before[i]
        got = tree.sequence_at(i)
        for l in range(tree.num_sites):
            if l not in missing_before[i]:
                assert got[l] == seqs_before[i][l], f"tip {i} site {l}"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_burst_ledger_and_integrity(seed):
    tree, evo, _ = make_tree(seed)
    seqs_before, missing_before = snapshot_tips(tree)
    lg0 = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                        np.asarray(evo.q), np.asarray(evo.pi))
    pop = HostExpPop(200.0, 100.0, 0.0, 1.0)
    t_max_tip = float(np.max(tree.t_max[:tree.num_tips]))
    res = run_burst_native(tree, 300, float(evo.mu), np.asarray(evo.nu),
                           np.asarray(evo.q), np.asarray(evo.pi), pop,
                           seed=seed * 7 + 3, can_change_root=True,
                           num_cells=128, t_max_tip=t_max_tip)
    assert res is not None
    dlg, dlc, acc, prop = res
    assert prop == 300 and acc > 0
    tree.check_integrity()
    lg1 = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                        np.asarray(evo.q), np.asarray(evo.pi))
    np.testing.assert_allclose(lg1 - lg0, dlg, atol=1e-7)
    check_tips(tree, seqs_before, missing_before)


def test_native_burst_skygrid_pop():
    tree, evo, _ = make_tree(5)
    lg0 = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                        np.asarray(evo.q), np.asarray(evo.pi))
    x = np.linspace(-300.0, 200.0, 9)
    gamma = np.log(np.linspace(50.0, 400.0, 9))
    pop = HostSkygridPop(x, gamma, 1)
    t_max_tip = float(np.max(tree.t_max[:tree.num_tips]))
    res = run_burst_native(tree, 200, float(evo.mu), np.asarray(evo.nu),
                           np.asarray(evo.q), np.asarray(evo.pi), pop,
                           seed=99, can_change_root=True,
                           num_cells=128, t_max_tip=t_max_tip)
    assert res is not None
    dlg, _, acc, _ = res
    assert acc > 0
    tree.check_integrity()
    lg1 = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                        np.asarray(evo.q), np.asarray(evo.pi))
    np.testing.assert_allclose(lg1 - lg0, dlg, atol=1e-7)


def test_native_partitioned_vsc_bursts():
    """partition -> native per-part bursts with the augmented prior ->
    reassemble; ledger consistency across 3 repartition rounds."""
    from delphy_tpu.topo.partition import (generate_random_partition_stencil,
                                           partition_tree, reassemble)
    from delphy_tpu.topo.vsc import make_vsc_parts

    tree, evo, rng = make_tree(11, T=30, L=300, mu=3e-4)
    seqs_before, missing_before = snapshot_tips(tree)
    lg_before = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                              np.asarray(evo.q), np.asarray(evo.pi))
    pop_host = HostExpPop(200.0, 150.0, 0.0, 1.0)
    total_delta, total_acc = 0.0, 0
    for _round in range(3):
        rereference_to_root_sequence(tree)
        stencil = generate_random_partition_stencil(tree, 3, rng)
        parts = partition_tree(tree, stencil)
        rngs = [np.random.default_rng(rng.integers(2 ** 63)) for _ in parts]
        vscs = make_vsc_parts(parts, pop_host, rngs, 1.5)
        for p, vsc, prng in zip(parts, vscs, rngs):
            if p.tree.num_nodes < 5:
                continue
            tmx = float(np.max(p.tree.t_max[:p.tree.num_tips]))
            res = run_burst_native(
                p.tree, 60, float(evo.mu), np.asarray(evo.nu),
                np.asarray(evo.q), np.asarray(evo.pi), pop_host,
                seed=int(prng.integers(2 ** 63)),
                can_change_root=p.includes_root, t_max_tip=tmx, vsc=vsc)
            assert res is not None
            total_delta += res[0]
            total_acc += res[2]
        reassemble(tree, parts)
        tree.check_integrity()
    assert total_acc > 0
    lg_after = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                             np.asarray(evo.q), np.asarray(evo.pi))
    np.testing.assert_allclose(lg_after - lg_before, total_delta, atol=1e-7)
    check_tips(tree, seqs_before, missing_before)


def test_native_determinism():
    """Same seed => identical burst outcome."""
    fps = []
    for _ in range(2):
        tree, evo, _ = make_tree(3)
        pop = HostExpPop(200.0, 100.0, 0.0, 1.0)
        t_max_tip = float(np.max(tree.t_max[:tree.num_tips]))
        res = run_burst_native(tree, 150, float(evo.mu), np.asarray(evo.nu),
                               np.asarray(evo.q), np.asarray(evo.pi), pop,
                               seed=42, can_change_root=True,
                               num_cells=128, t_max_tip=t_max_tip)
        assert res is not None
        muts = tuple(sorted(
            (n, m.site, m.from_, m.to, round(m.t, 9))
            for n in range(tree.num_nodes) for m in tree.mutations[n]))
        fps.append((res, tuple(np.asarray(tree.parent)), muts))
    assert fps[0] == fps[1]
