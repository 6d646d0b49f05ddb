"""End-to-end MCMC tests: ledger invariants, state integrity, determinism.

Mirrors the reference's in-engine invariant checking strategy
(Run::check_derived_quantities, run.cpp:316-338; debug checks after every
move, subrun.cpp:28-56) — here applied after each jitted sweep."""

import numpy as np
import pytest

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.run import Run
from delphy_tpu.mcmc.global_moves import PriorConfig


def make_run(seed=1, T=12, L=200, alpha_moves=False, lmpgm=300):
    ref, deltas, miss, dates, names, truth = simulate_dataset(
        T, L, mu=2e-3, seed=seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(seed))
    hyp = PriorConfig(alpha_move_enabled=alpha_moves)
    return Run(tree, seed=seed, hyp=hyp, num_cells=128,
               local_moves_per_global_move=lmpgm), truth


def test_ledger_invariant_over_sweeps():
    run, _ = make_run()
    for _ in range(4):
        run.do_mcmc_steps(300)
        run.check_derived_quantities(tol=1e-6)


def test_tree_integrity_after_mcmc():
    run, _ = make_run(seed=3)
    run.do_mcmc_steps(1200)
    tree = run.tree()
    tree.check_integrity()
    # tip times stay within their bounds; tips with exact dates unmoved
    T = tree.num_tips
    assert np.all(tree.t[:T] >= tree.t_min[:T] - 1e-12)
    assert np.all(tree.t[:T] <= tree.t_max[:T] + 1e-12)


def test_tip_sequences_preserved():
    """No move may change observed tip data (reference:
    assert_tip_sequences_compatible_with_original_ones, run.cpp:2191-2211)."""
    run, _ = make_run(seed=5)
    before = run.tree()
    seqs_before = [before.sequence_at(i) for i in range(before.num_tips)]
    run.do_mcmc_steps(900)
    after = run.tree()
    for i in range(after.num_tips):
        missing = after.missing_sites_at(i)
        missing_before = before.missing_sites_at(i)
        assert missing == missing_before
        got = after.sequence_at(i)
        for l in range(after.num_sites):
            if l not in missing:
                assert got[l] == seqs_before[i][l], f"tip {i} site {l} corrupted"


def test_determinism():
    run_a, _ = make_run(seed=7)
    run_b, _ = make_run(seed=7)
    run_a.do_mcmc_steps(600)
    run_b.do_mcmc_steps(600)
    assert run_a.log_posterior == run_b.log_posterior
    np.testing.assert_array_equal(np.asarray(run_a.ts.t), np.asarray(run_b.ts.t))
    np.testing.assert_array_equal(np.asarray(run_a.ts.mut_t), np.asarray(run_b.ts.mut_t))

    run_c, _ = make_run(seed=8)
    run_c.do_mcmc_steps(600)
    assert run_c.log_posterior != run_a.log_posterior


def test_alpha_moves_enabled():
    run, _ = make_run(seed=11, alpha_moves=True)
    for _ in range(3):
        run.do_mcmc_steps(300)
        run.check_derived_quantities(tol=1e-6)
    nu = np.asarray(run.evo.nu)
    assert nu.min() > 0
    assert not np.allclose(nu, 1.0)  # Gibbs actually resampled the site rates


def test_posterior_moves_toward_data():
    """Sanity: with a realistic mutation rate (no multi-hit saturation), the
    chain finds substantially better states than the random initial tree.
    (At saturating rates the log-posterior legitimately drops while the chain
    moves into the typical set of the augmented posterior.)"""
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        16, 300, mu=2e-4, seed=13)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(13))
    run = Run(tree, seed=13, hyp=PriorConfig(), num_cells=128,
              local_moves_per_global_move=400)
    run.do_mcmc_steps(10)
    lp0 = run.log_posterior
    run.do_mcmc_steps(8000)
    assert run.log_posterior > lp0


def test_dispatch_move_cap(monkeypatch):
    """DELPHY_TPU_MAX_DISPATCH_MOVES bounds boundaries-per-dispatch without
    changing the chain's semantics (one dispatch = fewer boundaries, same
    total move count and green ledger)."""
    import numpy as np
    from delphy_tpu.sim import simulate_dataset
    from delphy_tpu.phylo import build_random_tree
    from delphy_tpu.run import Run
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        10, 120, mu=3e-3, missing_fraction=0.05, seed=17)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(17))
    monkeypatch.setenv("DELPHY_TPU_MAX_DISPATCH_MOVES", "400")
    run = Run(tree, seed=17, num_cells=64, local_moves_per_global_move=400)
    run.do_mcmc_steps(4000)  # cap forces 1-boundary dispatches
    run.check_derived_quantities(tol=1e-6)
    assert run.step == 4000
