"""MCC tree, probers, snapshot save/resume."""

import numpy as np

import jax.numpy as jnp

from delphy_tpu import pop as popm
from delphy_tpu.mcc import derive_mcc_tree, mcc_to_nexus
from delphy_tpu.probers import probe_ancestors_on_tree, probe_site_states_on_tree
from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.run import Run
from delphy_tpu.io.snapshot import save_run, load_run


def make_run(seed=51, T=8, L=100):
    ref, deltas, miss, dates, names, _ = simulate_dataset(T, L, mu=2e-4, seed=seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(seed))
    return Run(tree, seed=seed, num_cells=64, local_moves_per_global_move=200)


def test_mcc_tree(tmp_path):
    run = make_run()
    base_trees = []
    for _ in range(6):
        run.do_mcmc_steps(200)
        base_trees.append(run.tree())
    mcc = derive_mcc_tree(base_trees, seed=3)
    N = base_trees[0].num_nodes
    assert mcc.posterior_support.shape == (N,)
    T = base_trees[0].num_tips
    # every tip is trivially monophyletic in every base tree
    np.testing.assert_allclose(mcc.posterior_support[:T], 1.0)
    assert np.all(mcc.posterior_support > 0)
    assert np.all(mcc.posterior_support <= 1.0)
    # root clade (all tips) is in every tree
    root = mcc.tree.root
    np.testing.assert_allclose(mcc.posterior_support[root], 1.0)

    out = tmp_path / "mcc.nexus"
    with open(out, "w") as f:
        mcc_to_nexus(mcc, f)
    text = out.read_text()
    assert text.startswith("#NEXUS")
    assert "tree MCC =" in text
    assert "posterior=" in text


def test_probers():
    run = make_run(seed=55)
    run.do_mcmc_steps(200)
    tree = run.tree()
    pop = popm.ExpPopParams(t0=jnp.float64(run.t_max_tip), n0=jnp.float64(100.0),
                            g=jnp.float64(0.0), min_pop=jnp.float64(1.0))
    t_root = float(tree.t[tree.root])

    # ancestral prober: mark the root's two children
    c0, c1 = (int(tree.children[tree.root, 0]), int(tree.children[tree.root, 1]))
    p = probe_ancestors_on_tree(tree, pop, [c0, c1], t_root - 10.0,
                                run.t_max_tip, 30)
    assert p.shape == (3, 30)
    assert np.all(p >= 0) and np.all(p.sum(axis=0) <= 1.0 + 1e-9)
    # far enough into the present, a probe almost surely coalesced into one side
    assert p[:2, -1].sum() > 0.5

    # site-state prober
    ps = probe_site_states_on_tree(tree, pop, 0, t_root - 10.0, run.t_max_tip, 25)
    assert ps.shape == (4, 25)
    assert np.all(ps >= 0) and np.all(ps.sum(axis=0) <= 1.0 + 1e-9)


def test_snapshot_roundtrip(tmp_path):
    run = make_run(seed=59)
    run.do_mcmc_steps(400)
    lp = run.log_posterior
    path = tmp_path / "state.dtpy.npz"
    save_run(run, path)

    run2 = load_run(path)
    assert run2.step == run.step
    np.testing.assert_array_equal(np.asarray(run2.ts.t), np.asarray(run.ts.t))
    np.testing.assert_array_equal(np.asarray(run2.ts.mut_t), np.asarray(run.ts.mut_t))
    led = run2.calc_cur_ledger()
    led1 = run.calc_cur_ledger()
    np.testing.assert_allclose(float(led.log_G), float(led1.log_G), rtol=1e-12)

    # resumed run continues identically to the original
    run.do_mcmc_steps(200)
    run2.do_mcmc_steps(200)
    assert run.log_posterior == run2.log_posterior


def test_snapshot_skygrid(tmp_path):
    ref, deltas, miss, dates, names, _ = simulate_dataset(8, 80, mu=2e-4, seed=61)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(61))
    run = Run(tree, seed=61, num_cells=64, local_moves_per_global_move=200,
              pop_model="skygrid", skygrid_num_parameters=6)
    run.do_mcmc_steps(400)
    path = tmp_path / "sg.npz"
    save_run(run, path)
    run2 = load_run(path)
    np.testing.assert_array_equal(np.asarray(run2.pop.gamma), np.asarray(run.pop.gamma))
    run.do_mcmc_steps(200)
    run2.do_mcmc_steps(200)
    assert run.log_posterior == run2.log_posterior


def test_newick_parse_roundtrip():
    from delphy_tpu.io.beast_out import newick_string
    from delphy_tpu.io.newick import parse_newick, newick_to_flat_tree

    run = make_run(seed=63)
    run.do_mcmc_steps(200)
    tree = run.tree()
    s = newick_string(tree)
    root = parse_newick(s)
    tr2 = newick_to_flat_tree(root, tree.ref_seq, t_root=float(tree.t[tree.root]))
    assert tr2.num_tips == tree.num_tips
    # same tip-depth profile (branch lengths preserved)
    def depths(t):
        out = {}
        for i in range(t.num_tips):
            d, cur = 0.0, i
            while cur != t.root:
                d += t.t[cur] - t.t[int(t.parent[cur])]
                cur = int(t.parent[cur])
            out[t.name[i] or str(i + 1)] = d
        return out
    d1 = {str(i + 1): v for i, v in enumerate(depths(tree).values())}
    d2 = depths(tr2)
    for k in d2:
        np.testing.assert_allclose(d2[k], d1[k], rtol=1e-5)


def test_mcc_from_trees_tool(tmp_path):
    from delphy_tpu.io.beast_out import BeastTreesOutput
    from delphy_tpu.tools import mcc_from_trees

    run = make_run(seed=67)
    trees_f = tmp_path / "run.trees"
    out = BeastTreesOutput(open(trees_f, "w"))
    out.write_preamble(run.tree())
    for i in range(8):
        run.do_mcmc_steps(150)
        out.write_tree(run.tree(), run.step)
    out.write_epilog()
    out.fh.close()

    mcc_f = tmp_path / "mcc.nexus"
    mcc = mcc_from_trees(trees_f, mcc_f, ref_len=run.ts.num_sites, burn_in=0.25)
    text = mcc_f.read_text()
    assert "tree MCC =" in text
    assert np.all(mcc.posterior_support > 0)


def test_ess():
    from delphy_tpu.ess import ess
    rng = np.random.default_rng(0)
    iid = rng.normal(size=2000)
    e = ess(iid)
    assert 1200 < e <= 2000
    # AR(1) with strong correlation has much lower ESS
    x = np.zeros(2000)
    for i in range(1, 2000):
        x[i] = 0.95 * x[i - 1] + rng.normal()
    e2 = ess(x)
    assert e2 < 300
