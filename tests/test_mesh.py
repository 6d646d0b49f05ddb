"""Multi-device (mesh) tests for the partitioned engine, on the virtual
8-device CPU mesh (conftest).  These are the in-tree analogues of the
reference's parallel-correctness invariants
(check_global_and_local_totals_match, core/run.cpp:340-357), validated here
under real shard_map + psum collectives rather than threads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.phylo import build_random_tree
from delphy_tpu.run import Run
from delphy_tpu.ops import likelihood as lk
from delphy_tpu.ops import coalescent as coal
from delphy_tpu.mcmc import global_moves as gm
from delphy_tpu.parallel.sweep import (make_mesh_multi_super_step,
                                       parts_multi_super_step)
from delphy_tpu.parallel import vsc_device as vsc


def make_run(seed=3, T=24, L=200, P_parts=8, cells=64):
    ref, deltas, miss, dates, names, _ = simulate_dataset(T, L, mu=2e-3,
                                                          seed=seed)
    tree = build_random_tree(ref, deltas, miss, dates, names=names,
                             rng=np.random.default_rng(seed))
    return Run(tree, seed=seed + 2, num_cells=cells,
               local_moves_per_global_move=200, device_partitions=P_parts,
               topology_moves_enabled=False)


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 CPU devices"
    return Mesh(np.array(devs[:8]), axis_names=("part",))


def test_mesh_step_matches_vmap_exactly(mesh8):
    """ONE chain, tree partitioned over 8 devices: the shard_map+psum path
    must be bit-identical to the single-device vmap path (the reassembly
    collective carries exactly the reference's memcpy reassemble,
    run.cpp:195-275)."""
    run = make_run()
    assert run.pm.node_map.shape[0] == 8
    args = (run.ts, run.evo, run.pop, run.key, run.tin, run.tout, run.pm,
            4, run.t_max_tip)

    step = make_mesh_multi_super_step(mesh8, run.hyp, run.num_cells, 2,
                                      run._sweep_k_max,
                                      run._sweep_reform_batch)
    ts_m, evo_m, pop_m, key_m, ledger_m, stats_m = step(*args)

    ts_v, evo_v, pop_v, key_v, ledger_v, stats_v, _fused = parts_multi_super_step(
        run.ts, run.evo, run.pop, run.key, run.tin, run.tout, run.pm, 4,
        run.t_max_tip, run.hyp, run.num_cells, 2, run._sweep_k_max,
        run._sweep_reform_batch)

    assert int(stats_m["local_moves_attempted"]) > 0
    assert jnp.array_equal(ts_m.t, ts_v.t)
    assert jnp.array_equal(ts_m.mut_t, ts_v.mut_t)
    assert float(ledger_m.log_G) == float(ledger_v.log_G)
    assert float(ledger_m.log_coal) == float(ledger_v.log_coal)
    assert int(stats_m["local_moves_attempted"]) == \
        int(stats_v["local_moves_attempted"])


def test_mesh_kbar_totals_match_global(mesh8):
    """Sum of per-part signed lineage staircases under psum == the global
    k_bar staircase (the totals-match invariant, run.cpp:340-357; sign
    algebra of partmaps.PartMaps.sign)."""
    run = make_run(seed=11, T=32)
    pm, ts = run.pm, run.ts
    C = run.num_cells
    t_root = float(ts.t[ts.root])
    span = max(run.t_max_tip - t_root, 1.0)
    t_lo = t_root - 0.35 * span - 1.0
    t_step = (run.t_max_tip - t_lo) / C
    t_lo, t_step = jnp.float64(t_lo), jnp.float64(t_step)

    nm = jnp.maximum(pm.node_map, 0)
    t_p = ts.t[nm]

    def body(t_p_s, sign_s):
        k_p = jax.vmap(vsc.calc_k_bar_signed,
                       in_axes=(0, 0, None, None, None))(
            t_p_s, sign_s, t_lo, t_step, C)
        return jax.lax.psum(jnp.sum(k_p, axis=0), "part")

    k_total = jax.jit(shard_map(
        body, mesh=mesh8, in_specs=(P("part"), P("part")),
        out_specs=P()))(t_p, pm.sign)

    k_global = coal.calc_k_bar(ts.t, ts.is_tip, t_lo, t_step, C)
    # global k_bar counts the root lineage extending into the past the same
    # way the run-root part's -1 sign does
    np.testing.assert_allclose(np.asarray(k_total), np.asarray(k_global),
                               atol=1e-9)


def test_mesh_determinism_and_ledger_invariant(mesh8):
    """Same seed + same mesh => identical trajectories (determinism contract,
    SURVEY A.9); and after mesh sweeps, incremental log_G equals the full
    recompute (run.cpp:316-338 discipline)."""
    run = make_run(seed=7, T=24)
    args = (run.ts, run.evo, run.pop, run.key, run.tin, run.tout, run.pm,
            4, run.t_max_tip)
    step = make_mesh_multi_super_step(mesh8, run.hyp, run.num_cells, 3,
                                      run._sweep_k_max,
                                      run._sweep_reform_batch)
    out1 = step(*args)
    out2 = step(*args)
    for a, b in zip(jax.tree.leaves(out1[:5]), jax.tree.leaves(out2[:5])):
        assert jnp.array_equal(a, b)

    ts, evo, pop_params, _key, ledger, _stats = out1
    caches = gm.compute_caches(ts, evo)
    log_G = lk.calc_log_G(ts, evo, caches.lambda_i, caches.root_freq)
    assert abs(float(ledger.log_G) - float(log_G)) < 1e-6
