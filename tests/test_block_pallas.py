"""Tests for the fused sweep-block chain (parallel/block_pallas.py).

The chain must (a) keep the incremental ledger exact: carried k_p equals a
recompute from the new times, summed dG equals the global log_G recompute
delta, and the augmented-coalescent dC decomposes into partial-quad plus
point terms; (b) the Pallas kernel (interpret mode on CPU) must reproduce
the jnp twin bit-for-bit given the same pre-generated uniforms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delphy_tpu.sim import simulate_dataset
from delphy_tpu.init_tree import build_initial_tree
from delphy_tpu.run import Run
from delphy_tpu.mcmc.kernel import run_global_moves
from delphy_tpu.ops import likelihood as lk
from delphy_tpu.mcmc import global_moves as gm
from delphy_tpu.parallel import vsc_device as vsc
from delphy_tpu.parallel.sweep import (build_part_ctx, SweepShared,
                                       scatter_deltas)
from delphy_tpu.parallel import block_pallas as bp


def _boundary_context(run):
    """Replicate _boundary_body's context construction up to the sweep."""
    ts, evo, pop_params, grid, caches, ledger, key, stats = jax.jit(
        run_global_moves, static_argnames=("hyp", "num_cells"))(
        run.ts, run.evo, run.pop, run.key, run.tin, run.tout,
        run.t_max_tip, run.hyp, run.num_cells)
    pm = run.pm
    nm = jnp.maximum(pm.node_map, 0)
    t_p = ts.t[nm]
    k_p = jax.vmap(vsc.calc_k_bar_signed, in_axes=(0, 0, None, None, None))(
        t_p, pm.sign, grid.t_lo, grid.t_step, run.num_cells)
    active = vsc.active_cells(pm.part_t_lo, pm.part_t_hi, grid.t_lo,
                              grid.t_step, run.num_cells)
    key, k_fields, k_sweep = jax.random.split(key, 3)
    fields = vsc.sample_fields(k_fields, k_p, active, grid.popsize_bar,
                               grid.t_step)
    ctx = build_part_ctx(pm, ts, caches, evo, fields.b)
    mm = jnp.maximum(pm.mut_map, 0)
    mut_t_p = ts.mut_t[mm]
    sh = SweepShared(A=fields.A, popsize_bar=grid.popsize_bar,
                     t_lo=grid.t_lo, t_step=grid.t_step,
                     t_max_tip=jnp.asarray(run.t_max_tip, t_p.dtype))
    return ts, evo, pop_params, grid, caches, ledger, ctx, sh, k_p, t_p, \
        mut_t_p, k_sweep, pm


def _make_run(seed=23, P=4):
    ref, deltas, miss, dates, names, _ = simulate_dataset(
        20, 300, mu=1e-3, sample_window_days=300.0, missing_fraction=0.02,
        seed=seed)
    tree = build_initial_tree(ref, deltas, miss, dates, names=names,
                              rng=np.random.default_rng(seed))
    return Run(tree, seed=seed, num_cells=200, device_partitions=P,
               topology_moves_enabled=False)


def test_chain_ledger_and_kbar_exact():
    run = _make_run()
    (ts, evo, pop_params, grid, caches, ledger, ctx, sh, k_p, t_p, mut_t_p,
     k_sweep, pm) = _boundary_context(run)
    NB = 16
    stat, ctx_arrs, shared = bp.pack_chain_inputs(
        ctx, sh, pop_params, k_p, t_p, mut_t_p, cpb=16)
    u = bp.gen_block_uniforms(k_sweep, k_p.shape[0], NB, stat.NC, stat.MC,
                              dtype=t_p.dtype)
    t_new, mut_new, kp_new, dG, dC, cnt = jax.jit(
        bp.sweep_chain_jnp, static_argnames=("stat",))(
        stat, NB, ctx_arrs, shared, u)

    P, n_cap = t_p.shape
    m_cap = mut_t_p.shape[1]
    t_new = t_new.reshape(P, stat.NC)[:, :n_cap]
    mut_new = mut_new.reshape(P, stat.MC)[:, :m_cap]
    kp_new = kp_new.reshape(P, stat.C)[:, :run.num_cells]

    assert float(jnp.sum(cnt)) > 50
    assert not np.allclose(np.asarray(t_new), np.asarray(t_p))
    assert np.all(np.isfinite(np.asarray(t_new)))

    # 1. carried k_p equals a fresh recompute from the new times
    kp_re = jax.vmap(vsc.calc_k_bar_signed, in_axes=(0, 0, None, None, None))(
        t_new, pm.sign, grid.t_lo, grid.t_step, run.num_cells)
    np.testing.assert_allclose(np.asarray(kp_new), np.asarray(kp_re),
                               atol=1e-8)

    # 2. sum dG equals the global log_G recompute delta
    dt, dmut = scatter_deltas(pm, ts.num_nodes, ts.mut_t.shape[0],
                              t_new - t_p, mut_new - mut_t_p)
    ts2 = ts._replace(t=ts.t + dt, mut_t=ts.mut_t + dmut)
    caches2 = gm.compute_caches(ts2, evo)
    log_G_re = float(lk.calc_log_G(ts2, evo, caches2.lambda_i,
                                   caches2.root_freq))
    log_G_inc = float(ledger.log_G) + float(jnp.sum(dG))
    assert abs(log_G_inc - log_G_re) < 1e-6

    # 3. dC decomposes: partial-quad delta + inner-node -logN point terms
    b = ctx.b
    dquad = 0.0
    for p in range(P):
        dquad += float(vsc.partial_quad(kp_new[p], b[p], sh.A,
                                        sh.popsize_bar, sh.t_step)
                       - vsc.partial_quad(k_p[p], b[p], sh.A,
                                          sh.popsize_bar, sh.t_step))
    from delphy_tpu import pop as popm
    is_inner = np.asarray(ctx.children[:, :, 0] >= 0) & (
        np.arange(n_cap)[None, :] < np.asarray(ctx.n_nodes)[:, None])
    lN_old = np.asarray(jnp.log(popm.pop_at_time(pop_params, t_p)))
    lN_new = np.asarray(jnp.log(popm.pop_at_time(pop_params, t_new)))
    dpoint = -np.sum(np.where(is_inner, lN_new - lN_old, 0.0))
    assert abs(float(jnp.sum(dC)) - (dquad + dpoint)) < 1e-6

    # 4. mutation times stay within their branches
    for p in range(P):
        mn = np.asarray(ctx.mut_node_loc[p])
        mv = np.asarray(ctx.mut_valid[p])
        par = np.asarray(ctx.parent[p])
        tn = np.asarray(t_new[p])
        mt = np.asarray(mut_new[p])
        root = int(ctx.part_root[p])
        for j in np.nonzero(mv)[0]:
            n = mn[j]
            if n == root or par[n] < 0:
                continue
            assert tn[par[n]] < mt[j] <= tn[n] + 1e-9, (p, j, n)


def test_pallas_interpret_matches_twin():
    run = _make_run(seed=31, P=4)
    (ts, evo, pop_params, grid, caches, ledger, ctx, sh, k_p, t_p, mut_t_p,
     k_sweep, pm) = _boundary_context(run)
    NB = 8
    # the kernel is f32-only (the TPU production dtype)
    f32 = jnp.float32
    to32 = lambda tree: jax.tree.map(
        lambda a: a.astype(f32) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)
    ctx, sh, pop_params = to32(ctx), to32(sh), to32(pop_params)
    k_p, t_p, mut_t_p = (k_p.astype(f32), t_p.astype(f32),
                         mut_t_p.astype(f32))
    stat, ctx_arrs, shared = bp.pack_chain_inputs(
        ctx, sh, pop_params, k_p, t_p, mut_t_p, cpb=16)
    u = bp.gen_block_uniforms(k_sweep, k_p.shape[0], NB, stat.NC, stat.MC,
                              dtype=f32)

    ref_out = jax.jit(bp.sweep_chain_jnp, static_argnames=("stat",))(
        stat, NB, ctx_arrs, shared, u)
    pal_out = bp.sweep_chain_pallas(stat, NB, ctx_arrs, shared, u,
                                    interpret=True)

    t_r, mut_r, kp_r, dG_r, dC_r, cnt_r = ref_out
    t_pal, mut_pal, kp_pal, dG_p, dC_p, cnt_p = pal_out
    np.testing.assert_allclose(np.asarray(t_pal).reshape(-1),
                               np.asarray(t_r).reshape(-1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut_pal).reshape(-1),
                               np.asarray(mut_r).reshape(-1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(kp_pal).reshape(-1),
                               np.asarray(kp_r).reshape(-1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_r))
    np.testing.assert_allclose(np.asarray(dG_p), np.asarray(dG_r),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real Mosaic lowering needs a TPU backend")
def test_pallas_tpu_matches_twin():
    """The REAL Mosaic kernel (not interpret mode) reproduces the XLA twin
    on the same chip with the same pre-generated uniforms — the in-CI TPU
    evidence that the production sweep kernel computes what its twin does.
    Pinned in f32 mode (the production TPU configuration): jax 0.9.0's
    Mosaic convert fallback recurses on 64-bit casts, see
    parallel/sweep.py:pallas_enabled."""
    with jax.enable_x64(False):
        _pallas_tpu_matches_twin_body()


def _pallas_tpu_matches_twin_body():
    run = _make_run(seed=31, P=4)
    (ts, evo, pop_params, grid, caches, ledger, ctx, sh, k_p, t_p, mut_t_p,
     k_sweep, pm) = _boundary_context(run)
    NB = 8
    f32 = jnp.float32
    to32 = lambda tree: jax.tree.map(
        lambda a: a.astype(f32) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)
    ctx, sh, pop_params = to32(ctx), to32(sh), to32(pop_params)
    k_p, t_p, mut_t_p = (k_p.astype(f32), t_p.astype(f32),
                         mut_t_p.astype(f32))
    stat, ctx_arrs, shared = bp.pack_chain_inputs(
        ctx, sh, pop_params, k_p, t_p, mut_t_p, cpb=16)
    u = bp.gen_block_uniforms(k_sweep, k_p.shape[0], NB, stat.NC, stat.MC,
                              dtype=f32)

    ref_out = jax.jit(bp.sweep_chain_jnp, static_argnames=("stat",))(
        stat, NB, ctx_arrs, shared, u)
    pal_out = bp.sweep_chain_pallas(stat, NB, ctx_arrs, shared, u)

    t_r, mut_r, kp_r, dG_r, dC_r, cnt_r = ref_out
    t_pal, mut_pal, kp_pal, dG_p, dC_p, cnt_p = pal_out
    # same accept/reject decisions => identical counts and matching states
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_r))
    np.testing.assert_allclose(np.asarray(t_pal).reshape(-1),
                               np.asarray(t_r).reshape(-1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(mut_pal).reshape(-1),
                               np.asarray(mut_r).reshape(-1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(kp_pal).reshape(-1),
                               np.asarray(kp_r).reshape(-1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dG_p), np.asarray(dG_r),
                               rtol=1e-3, atol=1e-3)
