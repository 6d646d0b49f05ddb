"""Mpox hack: 2-partition APOBEC evolution model (reference run.h:134-178,
run.cpp:359-433, 823-952)."""

import numpy as np
import pytest
import jax.numpy as jnp

from delphy_tpu.evo import (make_evo_params, mpox_q_tab, jc_q,
                            apobec_context_partition)
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.run import Run
from delphy_tpu.state import pack_state
from delphy_tpu.ops import likelihood as lk

import oracles

A, C, G, T = 0, 1, 2, 3


def test_mpox_q_tab_matches_reference_semantics():
    rho = 0.37
    qt = np.asarray(mpox_q_tab(rho))
    q0 = np.asarray(jc_q())
    # partition 0: plain JC
    np.testing.assert_allclose(qt[0], q0, atol=1e-12)
    # partition 1: JC + APOBEC terms (run.h:147-151: C->T += 2rho, G->A += 2rho)
    np.testing.assert_allclose(qt[1, C, T], 1.0 / 3.0 + 2 * rho)
    np.testing.assert_allclose(qt[1, C, C], -1.0 - 2 * rho)
    np.testing.assert_allclose(qt[1, G, A], 1.0 / 3.0 + 2 * rho)
    np.testing.assert_allclose(qt[1, G, G], -1.0 - 2 * rho)
    np.testing.assert_allclose(qt[1, A], q0[A])
    np.testing.assert_allclose(qt[1, T], q0[T])
    # rows still sum to zero
    np.testing.assert_allclose(qt.sum(axis=2), 0.0, atol=1e-12)


def test_apobec_context_partition():
    #            T  C  after T -> ctx;  G  A (next A) -> ctx
    seq = np.array([T, C, G, A, A, C, T, C, A, G])
    part = np.asarray(apobec_context_partition(seq))
    # l=1: C preceded by T; l=2: G followed by A; l=3: A followed by A;
    # l=7: C preceded by T (l=6 is T); l=8: A preceded... next is G -> no,
    # but l=8 is A: next l=9 is G, not A -> 0
    assert part.tolist() == [0, 1, 1, 1, 0, 0, 0, 1, 0, 0]


def make_tree_and_evo(seed=7, T_=12, L=200, rho=0.3):
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        T_, L, mu=4e-3, missing_fraction=0.1, seed=seed)
    rng = np.random.default_rng(seed + 77)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    part = apobec_context_partition(tree.sequence_at(0))
    evo = make_evo_params(L, mu=4e-3, kappa=1.0, pi=np.full(4, 0.25),
                          part=part).with_mpox_rho(rho=rho)
    return tree, evo


def test_mpox_log_G_kernel_vs_oracle():
    """Device log_G under the 2-partition model == direct per-site-q oracle."""
    tree, evo = make_tree_and_evo()
    ts = pack_state(tree, 8192, 512, 512)
    caches_cumQ = lk.calc_ref_cum_Q(ts, evo)
    lam, _ = lk.calc_lambda_i(ts, evo, caches_cumQ)
    cnt, _ = lk.calc_ref_state_prefix(ts, evo)
    root_freq = lk.calc_root_state_frequencies(ts, evo, cnt)
    lg = float(lk.calc_log_G(ts, evo, lam, root_freq))

    q_site = np.asarray(evo.q_tab)[np.asarray(evo.part)]  # (L,4,4)
    lg_oracle = oracles.log_G(tree, float(evo.mu), np.asarray(evo.nu),
                              q_site, np.asarray(evo.pi))
    np.testing.assert_allclose(lg, lg_oracle, rtol=1e-10)


def test_num_muts_beta_ab_oracle():
    tree, evo = make_tree_and_evo(seed=3)
    ts = pack_state(tree, 8192, 512, 512)
    M = np.asarray(lk.calc_num_muts_beta_ab(ts, evo))
    part = np.asarray(evo.part)
    expect = np.zeros((2, 4, 4), dtype=int)
    for n in range(tree.num_nodes):
        if n == tree.root:
            continue
        for m in tree.mutations[n]:
            expect[part[m.site], m.from_, m.to] += 1
    np.testing.assert_array_equal(M, expect)
    assert M.sum() > 0


def test_ttwiddle_beta_a_reduces_to_ttwiddle_a():
    """Summing the partition-resolved Ttwiddle over partitions must equal the
    single-partition kernel's output."""
    tree, evo = make_tree_and_evo(seed=5)
    ts = pack_state(tree, 8192, 512, 512)
    tin, tout = tree.euler_positions()
    tin, tout = jnp.asarray(tin), jnp.asarray(tout)
    _, nucum = lk.calc_ref_state_prefix(ts, evo)
    tw = np.asarray(lk.calc_Ttwiddle_a(ts, evo, tin, tout, nucum))
    nu_pa = lk.calc_ref_state_prefix_beta(ts, evo)
    tw_ba = np.asarray(lk.calc_Ttwiddle_beta_a(ts, evo, tin, tout, nu_pa))
    assert tw_ba.shape == (2, 4)
    np.testing.assert_allclose(tw_ba.sum(axis=0), tw, rtol=1e-9)


def test_mpox_run_end_to_end():
    """Full Run with the mpox hack: ledger invariant green, mu/rho move,
    topology moves work under per-site rates."""
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        14, 250, mu=3e-3, missing_fraction=0.08, seed=21)
    rng = np.random.default_rng(99)
    tree = build_random_tree(ref, deltas, miss, dates, names=names, rng=rng)
    run = Run(tree, seed=4, num_cells=128, local_moves_per_global_move=400,
              mpox_hack=True)
    run.topology_burst_chunks = 1  # tight burst cadence for this short window
    assert run.evo.num_partitions == 2
    rhos, mus = [], []
    for _ in range(6):
        run.do_mcmc_steps(2000)
        run.check_derived_quantities(1e-5)
        rhos.append(float(run.evo.mpox_rho))
        mus.append(float(run.evo.mu))
    assert run.topology_accepted > 0
    assert len(set(mus)) > 1, "mu not moving under mpox Gibbs"
    assert all(r >= 0.0 for r in rhos)
    assert np.isfinite(float(run.ledger.log_G))
    # independent host oracle on the final state
    final = run.tree()
    q_site = np.asarray(run.evo.q_tab)[np.asarray(run.evo.part)]
    lg_oracle = oracles.log_G(final, float(run.evo.mu),
                              np.asarray(run.evo.nu), q_site,
                              np.asarray(run.evo.pi))
    np.testing.assert_allclose(float(run.ledger.log_G), lg_oracle,
                               rtol=1e-6, atol=1e-4)


def test_mpox_detects_apobec_signal():
    """Posterior rho = mu*/mu rises far above 0 on data with strongly
    context-enriched C->T / G->A changes (the inference target of the hack,
    O'Toole et al; reference run.h:134-178)."""
    rng = np.random.default_rng(17)
    L, T_ = 2000, 14
    ref = rng.integers(0, 4, L).astype(np.int8)
    part = np.asarray(apobec_context_partition(ref))
    ctx_CG = [l for l in range(L) if part[l] == 1 and ref[l] in (C, G)]
    deltas, miss, dates = [], [], []
    for _ in range(T_):
        seen = {}
        for l in rng.choice(L, size=2, replace=False):          # background
            seen[int(l)] = int((ref[l] + rng.integers(1, 4)) % 4)
        for l in rng.choice(ctx_CG, size=10, replace=False):    # APOBEC
            seen[int(l)] = T if ref[l] == C else A
        deltas.append(sorted(seen.items()))
        miss.append([])
        d = float(rng.uniform(0, 300))
        dates.append((d, d))
    tree = build_random_tree(ref, deltas, miss, dates,
                             names=[f"t{i}" for i in range(T_)], rng=rng)
    run = Run(tree, seed=3, num_cells=128, local_moves_per_global_move=500,
              mpox_hack=True)
    rhos = []
    for _ in range(10):
        run.do_mcmc_steps(2000)
        rhos.append(float(run.evo.mpox_rho))
    run.check_derived_quantities(1e-5)
    assert np.mean(rhos[5:]) > 1.0, f"rho stayed at {rhos}"
