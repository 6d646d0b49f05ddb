"""Fused sweep-block chain: one Pallas TPU kernel per part-sweep.

Why: the XLA sweep (parallel/sweep.py part_sweep) costs ~0.4 ms per block on
a v5e because each block body is ~300 tiny fused ops whose per-op dispatch
overhead dominates at these array sizes (n_cap~128, m_cap~384, C~512).  This
module re-expresses one part's ENTIRE block chain (n_blocks x [single
displacement, batched displacement, branch reform]) as a single Pallas kernel
(grid over parts, lax.fori_loop over blocks), eliminating the per-op
overhead.  Semantics are identical to sweep.py's kernels (same proposals,
same MH acceptances, reference subrun.cpp:98-320); only the RNG stream
differs (uniforms are pre-generated outside as [P, NB, .] tensors, which
keeps the kernel deterministic given the boundary key AND lets the pure-jnp
twin `sweep_chain_jnp` consume the very same numbers for exact equivalence
tests, tests/test_block_pallas.py).

Design rules (TPU/Mosaic):
  - no gather/scatter/nonzero: all indexed access is one-hot/broadcast masks
    over (NC, MC) / (NC, NC) / (NC, C) tiles -- trivially VMEM-resident;
  - everything 2-D ((1, X) rows, (X, Y) masks), broadcasted_iota only;
  - f32 only (the TPU production dtype; CPU/f64 keeps the XLA path).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


class BlockUniforms(NamedTuple):
    """Pre-generated randomness for NB blocks (leading [P, NB] axes)."""
    pri: jnp.ndarray      # f32[P, NB, NC]  batched-displace priorities
    prop: jnp.ndarray     # f32[P, NB, NC]  batched-displace proposal u
    acc: jnp.ndarray      # f32[P, NB, NC]  batched-displace acceptance u
    ref_u: jnp.ndarray    # f32[P, NB, MC]  reform time u
    ref_acc: jnp.ndarray  # f32[P, NB, NC]  reform acceptance u
    sc: jnp.ndarray       # f32[P, NB, 128] single-move scalars (lanes 0..6)
    norm: jnp.ndarray     # f32[P, NB, 128] standard normals (lane 0 used)


# sc lane assignments
_SC_SEL, _SC_NODE_I, _SC_NODE_T, _SC_PROP, _SC_ACC, _SC_OFF = 0, 1, 2, 3, 4, 5


def gen_block_uniforms(key, P: int, NB: int, NC: int, MC: int,
                       dtype=jnp.float32) -> BlockUniforms:
    ks = jax.random.split(key, 7)
    u = lambda k, *sh: jax.random.uniform(k, (P, NB) + sh, dtype)
    return BlockUniforms(
        pri=u(ks[0], NC), prop=u(ks[1], NC), acc=u(ks[2], NC),
        ref_u=u(ks[3], MC), ref_acc=u(ks[4], NC), sc=u(ks[5], 128),
        norm=jax.random.normal(ks[6], (P, NB, 128), dtype))


def gen_block_uniforms_from_keys(keys, NB: int, NC: int, MC: int,
                                 dtype=jnp.float32) -> BlockUniforms:
    """Per-part uniform streams from per-part keys (leading P axis).

    Unlike gen_block_uniforms (one stream shaped (P, ...) from one key), each
    part's stream depends only on ITS key — so any sharding of the part axis
    (vmap on one chip, shard_map over a mesh) consumes identical randomness
    and produces bit-identical trajectories."""
    def one(k):
        ks = jax.random.split(k, 7)
        u = lambda kk, *sh: jax.random.uniform(kk, (NB,) + sh, dtype)
        return BlockUniforms(
            pri=u(ks[0], NC), prop=u(ks[1], NC), acc=u(ks[2], NC),
            ref_u=u(ks[3], MC), ref_acc=u(ks[4], NC), sc=u(ks[5], 128),
            norm=jax.random.normal(ks[6], (NB, 128), dtype))

    return jax.vmap(one)(keys)


def _expm1_k(x):
    """expm1 without the primitive (Mosaic TPU has no expm1 lowering):
    3rd-order series below 1e-3 (rel err O(x^3) ~ 4e-11, below the f64
    twin's test tolerances everywhere), exp(x)-1 above (where f32
    cancellation is already < 1e-4 relative)."""
    return jnp.where(jnp.abs(x) < 1e-3,
                     x * (1.0 + x * (0.5 + x * (1.0 / 6.0))),
                     jnp.exp(x) - 1.0)


def _log1p_k(x):
    """log1p without the primitive; same series/threshold scheme."""
    return jnp.where(jnp.abs(x) < 1e-3,
                     x * (1.0 + x * (-0.5 + x * (1.0 / 3.0))),
                     jnp.log(1.0 + x))


def _bounded_exp_u(u, lam, a, b):
    """x ~ exp(lam*x) on [a, b] from uniform u (distributions.h:38-68 via
    inverse CDF; clip at +-80 as in mcmc/moves.bounded_exp_sample)."""
    u = jnp.maximum(u, 1e-30)
    ltr = lam * (b - a)
    safe_lam = jnp.where(lam == 0.0, 1.0, lam)
    ltr_c = jnp.clip(ltr, -80.0, 80.0)
    mid = a + _log1p_k(u * _expm1_k(ltr_c)) / safe_lam
    hi = b + jnp.log(u) / safe_lam
    lo = a + jnp.log(u) / safe_lam
    x = jnp.where(lam == 0.0, a + u * (b - a),
                  jnp.where((lam > 0.0) & (ltr > 80.0), hi,
                            jnp.where((lam < 0.0) & (ltr < -80.0), lo, mid)))
    return jnp.clip(x, a, b)


def _tb(m):
    """Transpose a bool mask via int32 (Mosaic can't transpose i1)."""
    return jnp.transpose(m.astype(jnp.int32)) != 0


def _log_pop_exp(t, log_n0, g, t0, log_min_pop):
    """log N(t) for the exp pop model (pop.exp_pop_at_time, in log space)."""
    return jnp.maximum(log_min_pop, log_n0 + g * (t - t0))


class ChainStatics(NamedTuple):
    NC: int
    MC: int
    C: int            # padded cell count (lane multiple)
    C_real: int       # live cells (grid formulas use this)
    cpb: int          # cells per color block
    no_single: bool
    no_reform: bool


def sweep_chain_part(stat: ChainStatics, n_blocks,
                     # per-part state rows (1, X)
                     t, mut_t, k_p,
                     # per-part static ctx rows
                     par, c0, c1, t_min, t_max, lam, dlam,
                     mnode, mvalid, msingle, slope, b_coef,
                     # shared cell rows (1, C)
                     A, nbar,
                     # per-part scalars (0-D)
                     part_root, is_run_root, n_leaves, n_nodes,
                     # shared scalars (0-D f32)
                     t_lo_g, t_step, t_max_tip,
                     log_n0, g_pop, t0_pop, log_min_pop,
                     # uniform-row accessor: get_u(i) -> 7-tuple of (1, X)
                     # rows (pri, prop, acc, ref_u, ref_acc, sc, norm) --
                     # a callback so the Pallas kernel can slice Refs (Mosaic
                     # has no value dynamic_slice) while the twin slices
                     # arrays
                     get_u=None):
    """One part's whole sweep chain on (1, X) rows; pure jnp so it runs both
    inside the Pallas kernel and under vmap as the exact twin."""
    NC, MC, C = stat.NC, stat.MC, stat.C
    f32 = t.dtype
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, NC), 1)     # (1, NC)
    iota_n_col = jax.lax.broadcasted_iota(jnp.int32, (NC, 1), 0)  # (NC, 1)
    valid_node = iota_n < n_nodes
    # slot->node one-hot (bool [NC, MC]): row n selects slots on node n's
    # branch; invariant across blocks (the pool is static within a sweep)
    mnode_row = mnode                                             # (1, MC)
    M_nm = (iota_n_col == mnode_row) & (mvalid != 0)              # (NC, MC)
    par_col = jnp.transpose(par)                                  # (NC, 1)
    P_nj = (par_col == iota_n) & (par_col >= 0)                   # (NC, NC)
    c0_col = jnp.transpose(c0)
    c1_col = jnp.transpose(c1)
    C0_nj = (c0_col == iota_n) & (c0_col >= 0)
    C1_nj = (c1_col == iota_n) & (c1_col >= 0)
    is_leaf = c0 < 0                                              # (1, NC)
    grid_lo = t_lo_g + t_step
    lb = t_lo_g + t_step * jax.lax.broadcasted_iota(
        jnp.int32, (1, C), 1).astype(f32)
    # padded cells sit above the grid; park their lb at +inf so frac terms
    # clip identically and contribute nothing
    cell_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    lb = jnp.where(cell_iota < stat.C_real, lb, jnp.inf)
    inv_nbar_dt = t_step / nbar                                   # (1, C)
    n_seg = stat.C_real // stat.cpb + 1
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, n_seg), 1)

    in_batch = valid_node & (iota_n != part_root)                 # (1, NC)
    movable_base = valid_node & (iota_n != part_root)

    def one_hot_scalar(idx):
        return iota_n == idx                                      # (1, NC)

    def single_displace(carry, usc_row, unorm_row):
        t, mut_t, k_p, dG, dC, cnt = carry
        get = lambda lane: jnp.sum(
            jnp.where(jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1) == lane, usc_row, 0.0))
        u_sel, u_ni, u_nt = get(_SC_SEL), get(_SC_NODE_I), get(_SC_NODE_T)
        u_p, u_a = get(_SC_PROP), get(_SC_ACC)
        z = jnp.sum(jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1) == 0, unorm_row, 0.0))

        inner = u_sel < 0.5
        n_inner = n_nodes - n_leaves
        node_i = n_leaves + jnp.floor(
            u_ni * jnp.maximum(n_inner, 1).astype(f32)).astype(jnp.int32)
        node_t = jnp.floor(
            u_nt * jnp.maximum(n_leaves, 1).astype(f32)).astype(jnp.int32)
        node = jnp.where(inner, node_i, node_t)
        oh = one_hot_scalar(node)                                  # (1, NC)
        is_root_move = inner & (node == part_root)
        tmin_n = jnp.sum(jnp.where(oh, t_min, 0.0))
        tmax_n = jnp.sum(jnp.where(oh, t_max, 0.0))
        valid = jnp.where(inner, (~is_root_move) | (is_run_root != 0),
                          tmin_n < tmax_n)

        own_mask = (mnode_row == node) & (mvalid != 0)             # (1, MC)
        own_max = jnp.max(jnp.where(own_mask, mut_t, -jnp.inf))

        par_n = jnp.sum(jnp.where(oh, par, 0))
        safe_par = jnp.maximum(par_n, 0)
        t_par = jnp.where(is_root_move, grid_lo,
                          jnp.sum(jnp.where(one_hot_scalar(safe_par), t, 0.0)))
        t_lo_bound = jnp.maximum(t_par, own_max)
        t_lo_bound = jnp.where(inner, t_lo_bound,
                               jnp.maximum(t_lo_bound, tmin_n))

        c0_n = jnp.sum(jnp.where(oh, c0, 0))
        c1_n = jnp.sum(jnp.where(oh, c1, 0))

        def child_bound(cn):
            ohc = one_hot_scalar(jnp.maximum(cn, 0))
            cmask = (mnode_row == jnp.maximum(cn, 0)) & (mvalid != 0)
            mut_min = jnp.min(jnp.where(cmask, mut_t, jnp.inf))
            t_c = jnp.sum(jnp.where(ohc, t, 0.0))
            return jnp.where(cn >= 0, jnp.minimum(t_c, mut_min), jnp.inf)

        t_hi = jnp.where(inner,
                         jnp.minimum(child_bound(c0_n), child_bound(c1_n)),
                         tmax_n)

        lam_n = jnp.sum(jnp.where(oh, lam, 0.0))
        dl0 = jnp.sum(jnp.where(one_hot_scalar(jnp.maximum(c0_n, 0)),
                                dlam, 0.0))
        dl1 = jnp.sum(jnp.where(one_hot_scalar(jnp.maximum(c1_n, 0)),
                                dlam, 0.0))
        lam_b0 = jnp.where(c0_n >= 0, lam_n + dl0, 0.0)
        lam_b1 = jnp.where(c1_n >= 0, lam_n + dl1, 0.0)
        d = jnp.where(inner,
                      jnp.where(is_root_move, 0.0, -lam_n) + lam_b0 + lam_b1,
                      -lam_n)

        old_t = jnp.sum(jnp.where(oh, t, 0.0))
        tree_span = jnp.maximum(t_max_tip - t_hi, 0.0)
        delta_scale = jnp.minimum(0.5 / jnp.maximum(lam_n, 1e-30), tree_span)
        root_t = old_t + delta_scale * z

        a = jnp.where(t_lo_bound > -jnp.inf, t_lo_bound, old_t - 1.0)
        bnd = jnp.where(t_hi < jnp.inf, t_hi, old_t + 1.0)
        bexp_t = _bounded_exp_u(u_p, d, jnp.minimum(a, bnd), bnd)
        new_t = jnp.where(is_root_move, root_t, bexp_t)
        in_bounds = valid & (new_t > t_lo_bound) & (new_t < t_hi) & \
            (t_lo_bound < t_hi)

        delta_log_G = d * (new_t - old_t)
        log_alpha = jnp.where(is_root_move, 0.0, delta_log_G)
        # vsc displace delta, dense over cells (vsc_device.displace_delta)
        sign = jnp.where(inner, -1.0, 1.0)
        frac_old = jnp.clip((old_t - lb) / t_step, 0.0, 1.0)
        frac_new = jnp.clip((new_t - lb) / t_step, 0.0, 1.0)
        dk = sign * (frac_new - frac_old)                          # (1, C)
        dquad = -jnp.sum(inv_nbar_dt *
                         (0.5 * ((k_p + dk) ** 2 - k_p ** 2) * A
                          - b_coef * dk))
        dlogN = jnp.where(
            inner,
            -(_log_pop_exp(new_t, log_n0, g_pop, t0_pop, log_min_pop)
              - _log_pop_exp(old_t, log_n0, g_pop, t0_pop, log_min_pop)),
            0.0)
        dcoal = dquad + dlogN
        log_mh = delta_log_G + dcoal - log_alpha
        accept = in_bounds & ((log_mh >= 0.0)
                              | (jnp.log(jnp.maximum(u_a, 1e-30)) < log_mh))

        t = jnp.where(oh & accept, new_t, t)
        k_p = jnp.where(accept, k_p + dk, k_p)
        dG = dG + jnp.where(accept, delta_log_G, 0.0)
        dC = dC + jnp.where(accept, dcoal, 0.0)
        cnt = cnt + jnp.where(n_nodes > 1, 1.0, 0.0)
        return (t, mut_t, k_p, dG, dC, cnt)

    def batched_displace(carry, upri_row, uprop_row, uacc_row, usc_row):
        t, mut_t, k_p, dG, dC, cnt = carry
        off_u = jnp.sum(jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1) == _SC_OFF, usc_row, 0.0))
        offset = jnp.floor(off_u * stat.cpb).astype(jnp.int32)

        own_max = jnp.max(jnp.where(M_nm, mut_t, -jnp.inf), axis=1,
                          keepdims=True)                           # (NC, 1)
        child_min = jnp.min(jnp.where(M_nm, mut_t, jnp.inf), axis=1,
                            keepdims=True)                         # (NC, 1)
        own_max_r = jnp.transpose(own_max)                         # (1, NC)
        child_min_r = jnp.transpose(child_min)

        t_par = jnp.sum(jnp.where(P_nj, t, 0.0), axis=1,
                        keepdims=True)                             # (NC, 1)
        t_par_r = jnp.transpose(t_par)
        cb_val = jnp.minimum(t, child_min_r)                       # (1, NC)
        cb0 = jnp.sum(jnp.where(C0_nj, cb_val, 0.0), axis=1, keepdims=True)
        cb0 = jnp.where(c0_col >= 0, cb0, jnp.inf)
        cb1 = jnp.sum(jnp.where(C1_nj, cb_val, 0.0), axis=1, keepdims=True)
        cb1 = jnp.where(c1_col >= 0, cb1, jnp.inf)
        t_hi_inner = jnp.transpose(jnp.minimum(cb0, cb1))          # (1, NC)

        t_lo = jnp.maximum(t_par_r, own_max_r)
        t_lo = jnp.where(is_leaf, jnp.maximum(t_lo, t_min), t_lo)
        t_hi = jnp.where(is_leaf, t_max, t_hi_inner)
        movable = movable_base & (t_lo < t_hi)

        cell_now = jnp.floor((t - t_lo_g) / t_step).astype(jnp.int32)
        in_grid = (cell_now >= 0) & (cell_now < stat.C_real)
        blk = jnp.clip((cell_now + offset) // stat.cpb, 0, n_seg - 1)
        blk_t_lo = t_lo_g + (blk * stat.cpb - offset).astype(f32) * t_step
        blk_t_hi = blk_t_lo + stat.cpb * t_step
        win_lo = jnp.maximum(t_lo, blk_t_lo)
        win_hi = jnp.minimum(t_hi, blk_t_hi)
        fits = movable & in_grid & (win_lo < win_hi)

        pri = jnp.where(fits, upri_row, -1.0)                      # (1, NC)
        blk_col = jnp.transpose(blk)                               # (NC, 1)
        seg_mask = blk_col == iota_s                               # (NC, S)
        best_s = jnp.max(jnp.where(seg_mask, jnp.transpose(pri), -1.0),
                         axis=0, keepdims=True)                    # (1, S)
        best_n = jnp.sum(jnp.where(seg_mask, best_s, 0.0), axis=1,
                         keepdims=True)                            # (NC, 1)
        selected = fits & (pri >= 0.0) & (pri == jnp.transpose(best_n))
        sel_par = jnp.sum((P_nj & selected).astype(jnp.int32), axis=1,
                          keepdims=True) > 0                       # (NC, 1)
        selected = selected & ~_tb(sel_par)

        dl0 = jnp.sum(jnp.where(C0_nj, dlam, 0.0), axis=1, keepdims=True)
        dl1 = jnp.sum(jnp.where(C1_nj, dlam, 0.0), axis=1, keepdims=True)
        lam_b0 = jnp.where(c0_col >= 0, jnp.transpose(lam) + dl0, 0.0)
        lam_b1 = jnp.where(c1_col >= 0, jnp.transpose(lam) + dl1, 0.0)
        d = -lam + jnp.transpose(lam_b0 + lam_b1)                  # (1, NC)

        old_t = t
        new_t = _bounded_exp_u(uprop_row, d, win_lo,
                               jnp.where(win_hi > win_lo, win_hi,
                                         win_lo + 1.0))
        new_t = jnp.clip(new_t, win_lo, win_hi)
        in_bounds = selected & (new_t > win_lo) & (new_t < win_hi)

        # vsc displace delta for every node row (vsc displace_delta_batch)
        sign = jnp.where(is_leaf, 1.0, -1.0)                       # (1, NC)
        t_old_col = jnp.transpose(old_t)                           # (NC, 1)
        t_new_col = jnp.transpose(jnp.where(in_bounds, new_t, old_t))
        frac_old = jnp.clip((t_old_col - lb) / t_step, 0.0, 1.0)   # (NC, C)
        frac_new = jnp.clip((t_new_col - lb) / t_step, 0.0, 1.0)
        dk = jnp.transpose(sign) * (frac_new - frac_old)           # (NC, C)
        dquad = -jnp.sum(inv_nbar_dt *
                         (0.5 * ((k_p + dk) ** 2 - k_p ** 2) * A
                          - b_coef * dk), axis=1, keepdims=True)   # (NC, 1)
        lN_new = _log_pop_exp(new_t, log_n0, g_pop, t0_pop, log_min_pop)
        lN_old = _log_pop_exp(old_t, log_n0, g_pop, t0_pop, log_min_pop)
        dcoal = jnp.transpose(dquad) + jnp.where(is_leaf, 0.0,
                                                 -(lN_new - lN_old))
        delta_log_G = d * (new_t - old_t)
        lu = jnp.log(jnp.maximum(uacc_row, 1e-30))
        accept = in_bounds & ((dcoal >= 0.0) | (lu < dcoal))       # (1, NC)

        t = jnp.where(accept, new_t, old_t)
        k_p = k_p + jnp.sum(jnp.where(_tb(accept), dk, 0.0),
                            axis=0, keepdims=True)                 # (1, C)
        dG = dG + jnp.sum(jnp.where(accept, delta_log_G, 0.0))
        dC = dC + jnp.sum(jnp.where(accept, dcoal, 0.0))
        cnt = cnt + jnp.sum(selected.astype(f32))
        return (t, mut_t, k_p, dG, dC, cnt)

    def reform(carry, uref_row, urefacc_row):
        t, mut_t, k_p, dG, dC, cnt = carry
        t_par = jnp.sum(jnp.where(P_nj, t, 0.0), axis=1, keepdims=True)
        t_col = jnp.transpose(t)                                   # (NC, 1)
        t_X = jnp.sum(jnp.where(M_nm, t_col, 0.0), axis=0,
                      keepdims=True)                               # (1, MC)
        t_P = jnp.sum(jnp.where(M_nm, t_par, 0.0), axis=0,
                      keepdims=True)                               # (1, MC)
        in_b_col = _tb(in_batch)                                   # (NC, 1)
        mut_in = (jnp.sum((M_nm & in_b_col).astype(jnp.int32), axis=0,
                          keepdims=True) > 0) & (mvalid != 0) & \
            (msingle != 0)                                         # (1, MC)
        u = jnp.maximum(uref_row, 1e-16)
        new_mut_t = jnp.where(mut_in, t_P + u * (t_X - t_P), mut_t)
        per_slot = jnp.where(mut_in, -slope * (new_mut_t - mut_t), 0.0)
        delta_n = jnp.sum(jnp.where(M_nm, per_slot, 0.0), axis=1,
                          keepdims=True)                           # (NC, 1)
        delta_n_r = jnp.transpose(delta_n)                         # (1, NC)
        lu = jnp.log(jnp.maximum(urefacc_row, 1e-30))
        accept_n = in_batch & ((delta_n_r >= 0.0) | (lu < delta_n_r))
        acc_col = _tb(accept_n)
        accept_slot = (jnp.sum((M_nm & acc_col).astype(jnp.int32), axis=0,
                               keepdims=True) > 0) & mut_in        # (1, MC)
        mut_t = jnp.where(accept_slot, new_mut_t, mut_t)
        dG = dG + jnp.sum(jnp.where(accept_n, delta_n_r, 0.0))
        cnt = cnt + jnp.sum(in_batch.astype(f32))
        return (t, mut_t, k_p, dG, dC, cnt)

    def block_body(i, carry):
        pri_row, prop_row, acc_row, ref_row, refacc_row, usc_row, \
            unorm_row = get_u(i)
        if not stat.no_single:
            carry = single_displace(carry, usc_row, unorm_row)
        carry = batched_displace(carry, pri_row, prop_row, acc_row, usc_row)
        if not stat.no_reform:
            carry = reform(carry, ref_row, refacc_row)
        return carry

    # derive the accumulators' initial values from per-part state so their
    # varying-axes annotation matches the loop body under shard_map
    zero = (t[0, 0] * 0.0).astype(f32)
    carry = (t, mut_t, k_p, zero, zero, zero)
    carry = jax.lax.fori_loop(0, n_blocks, block_body, carry)
    return carry


# ---------------------------------------------------------------------------
# jnp twin (vmapped over parts) -- the exact-equivalence oracle
# ---------------------------------------------------------------------------

def sweep_chain_jnp(stat: ChainStatics, n_blocks, ctx_arrs, shared, u):
    """Run the chain for all P parts with vmap; consumes the same uniforms
    as the Pallas kernel, so outputs are bit-comparable (up to f32 reassoc).

    ctx_arrs: dict of per-part arrays (leading P axis, then (1, X) rows).
    shared: dict of shared rows/scalars.  u: BlockUniforms.
    """
    def one(t, mut_t, k_p, par, c0, c1, t_min, t_max, lam, dlam, mnode,
            mvalid, msingle, slope, b_coef, part_root, is_run_root,
            n_leaves, n_nodes, pri, prop, acc, ref_u, ref_acc, sc, norm):
        def get_u(i):
            row = lambda a: jax.lax.dynamic_slice_in_dim(a, i, 1, axis=0)
            return (row(pri), row(prop), row(acc), row(ref_u),
                    row(ref_acc), row(sc), row(norm))
        return sweep_chain_part(
            stat, n_blocks, t, mut_t, k_p, par, c0, c1, t_min, t_max, lam,
            dlam, mnode, mvalid, msingle, slope, b_coef,
            shared["A"], shared["nbar"],
            part_root, is_run_root, n_leaves, n_nodes,
            shared["t_lo"], shared["t_step"], shared["t_max_tip"],
            shared["log_n0"], shared["g"], shared["t0"],
            shared["log_min_pop"],
            get_u=get_u)

    return jax.vmap(one)(
        ctx_arrs["t"], ctx_arrs["mut_t"], ctx_arrs["k_p"],
        ctx_arrs["par"], ctx_arrs["c0"], ctx_arrs["c1"],
        ctx_arrs["t_min"], ctx_arrs["t_max"], ctx_arrs["lam"],
        ctx_arrs["dlam"], ctx_arrs["mnode"], ctx_arrs["mvalid"],
        ctx_arrs["msingle"], ctx_arrs["slope"], ctx_arrs["b"],
        ctx_arrs["part_root"], ctx_arrs["is_run_root"],
        ctx_arrs["n_leaves"], ctx_arrs["n_nodes"],
        u.pri, u.prop, u.acc, u.ref_u, u.ref_acc, u.sc, u.norm)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def sweep_chain_pallas(stat: ChainStatics, n_blocks, ctx_arrs, shared, u,
                       interpret: bool = False):
    """Pallas execution of the chain: grid over parts, whole chain per
    program.  Same inputs/outputs as sweep_chain_jnp."""
    P = ctx_arrs["t"].shape[0]
    NC, MC, C = stat.NC, stat.MC, stat.C
    NB = u.pri.shape[1]
    f32 = ctx_arrs["t"].dtype

    fsc = jnp.stack([shared["t_lo"], shared["t_step"], shared["t_max_tip"],
                     shared["log_n0"], shared["g"], shared["t0"],
                     shared["log_min_pop"]]).astype(f32)
    nb_arr = jnp.asarray([n_blocks], jnp.int32)
    isc = jnp.concatenate([
        ctx_arrs["part_root"].reshape(P, 1),
        ctx_arrs["is_run_root"].reshape(P, 1).astype(jnp.int32),
        ctx_arrs["n_leaves"].reshape(P, 1),
        ctx_arrs["n_nodes"].reshape(P, 1),
    ], axis=1).astype(jnp.int32)                                   # (P, 4)

    # index maps take (grid idx, *scalar-prefetch refs) under
    # PrefetchScalarGridSpec; swallow the refs with *_
    def row_spec(X):
        return pl.BlockSpec((1, 1, X), lambda p, *_: (p, 0, 0),
                            memory_space=pltpu.VMEM)

    def shared_spec(X):
        return pl.BlockSpec((1, X), lambda p, *_: (0, 0),
                            memory_space=pltpu.VMEM)

    def u_spec(X):
        return pl.BlockSpec((1, NB, X), lambda p, *_: (p, 0, 0),
                            memory_space=pltpu.VMEM)

    # reshape per-part (P, 1, X) rows for (1, X) blocks inside
    def r3(a):
        return a.reshape(P, 1, a.shape[-1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,                 # nb_arr, fsc, isc
        grid=(P,),
        in_specs=[
            row_spec(NC), row_spec(MC), row_spec(C),       # t, mut, kp
            row_spec(NC), row_spec(NC), row_spec(NC),      # par, c0, c1
            row_spec(NC), row_spec(NC),                    # tmin, tmax
            row_spec(NC), row_spec(NC),                    # lam, dlam
            row_spec(MC), row_spec(MC), row_spec(MC),      # mnode,mvalid,msin
            row_spec(MC), row_spec(C),                     # slope, b
            shared_spec(C), shared_spec(C),                # A, nbar
            u_spec(NC), u_spec(NC), u_spec(NC),            # pri, prop, acc
            u_spec(MC), u_spec(NC),                        # ref_u, ref_acc
            u_spec(128), u_spec(128),                      # sc, norm
        ],
        out_specs=[
            row_spec(NC), row_spec(MC), row_spec(C), row_spec(128),
        ],
    )

    kern = partial(_kernel_entry, stat)
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, 1, NC), f32),
            jax.ShapeDtypeStruct((P, 1, MC), f32),
            jax.ShapeDtypeStruct((P, 1, C), f32),
            jax.ShapeDtypeStruct((P, 1, 128), f32),
        ],
        interpret=interpret,
    )(nb_arr, fsc, isc,
      r3(ctx_arrs["t"]), r3(ctx_arrs["mut_t"]), r3(ctx_arrs["k_p"]),
      r3(ctx_arrs["par"]), r3(ctx_arrs["c0"]), r3(ctx_arrs["c1"]),
      r3(ctx_arrs["t_min"]), r3(ctx_arrs["t_max"]),
      r3(ctx_arrs["lam"]), r3(ctx_arrs["dlam"]),
      r3(ctx_arrs["mnode"]), r3(ctx_arrs["mvalid"]),
      r3(ctx_arrs["msingle"]), r3(ctx_arrs["slope"]), r3(ctx_arrs["b"]),
      shared["A"].reshape(1, C), shared["nbar"].reshape(1, C),
      u.pri, u.prop, u.acc, u.ref_u, u.ref_acc, u.sc, u.norm)

    t_new, mut_new, kp_new, accrow = outs
    dG = accrow[:, 0, 0]
    dC = accrow[:, 0, 1]
    cnt = accrow[:, 0, 2]
    return (t_new.reshape(P, 1, NC), mut_new.reshape(P, 1, MC),
            kp_new.reshape(P, 1, C), dG, dC, cnt)


def _kernel_entry(stat, nb_ref, fsc_ref, isc_ref,
                  t_r, mut_r, kp_r, par_r, c0_r, c1_r, tmin_r, tmax_r,
                  lam_r, dlam_r, mnode_r, mvalid_r, msingle_r, slope_r,
                  b_r, A_r, nbar_r,
                  pri_r, prop_r, acc_r, refu_r, refacc_r, sc_r, norm_r,
                  t_o, mut_o, kp_o, acc_o):
    """Per-part program: read row blocks, run the chain, write outputs."""
    p = pl.program_id(0)
    n_blocks = nb_ref[0]
    t_lo, t_step, t_max_tip = fsc_ref[0], fsc_ref[1], fsc_ref[2]
    log_n0, g_pop, t0_pop, log_min_pop = (fsc_ref[3], fsc_ref[4],
                                          fsc_ref[5], fsc_ref[6])
    part_root = isc_ref[p, 0]
    is_run_root = isc_ref[p, 1]
    n_leaves = isc_ref[p, 2]
    n_nodes = isc_ref[p, 3]

    def get_u(i):
        # slice the Refs (Mosaic supports dynamic ref loads, not value
        # dynamic_slice): (1, NB, X) ref -> (1, X) row for block i
        row = lambda r: r[0, pl.dslice(i, 1), :]
        return (row(pri_r), row(prop_r), row(acc_r), row(refu_r),
                row(refacc_r), row(sc_r), row(norm_r))

    out = sweep_chain_part(
        stat, n_blocks,
        t_r[0], mut_r[0], kp_r[0],
        par_r[0], c0_r[0], c1_r[0], tmin_r[0], tmax_r[0],
        lam_r[0], dlam_r[0], mnode_r[0], mvalid_r[0], msingle_r[0],
        slope_r[0], b_r[0],
        A_r[:], nbar_r[:],
        part_root, is_run_root, n_leaves, n_nodes,
        t_lo, t_step, t_max_tip, log_n0, g_pop, t0_pop, log_min_pop,
        get_u=get_u)
    t_new, mut_new, kp_new, dG, dC, cnt = out
    t_o[0] = t_new
    mut_o[0] = mut_new
    kp_o[0] = kp_new
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc_o[0] = jnp.where(lane == 0, dG,
                         jnp.where(lane == 1, dC,
                                   jnp.where(lane == 2, cnt, 0.0)))


# ---------------------------------------------------------------------------
# Adapter from sweep.py's PartCtx/SweepShared to chain inputs
# ---------------------------------------------------------------------------

def pack_chain_inputs(ctx, sh, pop_params, k_p, t_p, mut_t_p,
                      cpb: int, no_single: bool = False,
                      no_reform: bool = False):
    """Pad sweep.py's per-part context to lane-aligned (P, 1, X) rows and
    bundle the shared scalars.  Padded entries are inert: node ids >= n_nodes
    are never movable, mut slots get mvalid=0, cells beyond C_real get
    lb=+inf inside the chain."""
    P, n_cap = ctx.parent.shape
    m_cap = ctx.mut_node_loc.shape[1]
    C_real = k_p.shape[1]
    NC = _round_up(n_cap, 128)
    MC = _round_up(m_cap, 128)
    C = _round_up(C_real, 128)
    f32 = t_p.dtype

    def padn(a, X, fill):
        pad = X - a.shape[-1]
        if pad == 0:
            return a
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=fill)

    def r3(a):
        return a.reshape(P, 1, a.shape[-1])

    ctx_arrs = {
        "t": r3(padn(t_p, NC, 0.0)),
        "mut_t": r3(padn(mut_t_p, MC, 0.0)),
        "k_p": r3(padn(k_p, C, 0.0)),
        "par": r3(padn(ctx.parent.astype(jnp.int32), NC, -1)),
        "c0": r3(padn(ctx.children[:, :, 0].astype(jnp.int32), NC, -1)),
        "c1": r3(padn(ctx.children[:, :, 1].astype(jnp.int32), NC, -1)),
        "t_min": r3(padn(ctx.t_min.astype(f32), NC, 0.0)),
        "t_max": r3(padn(ctx.t_max.astype(f32), NC, 0.0)),
        "lam": r3(padn(ctx.lam.astype(f32), NC, 0.0)),
        "dlam": r3(padn(ctx.dlam_miss.astype(f32), NC, 0.0)),
        "mnode": r3(padn(ctx.mut_node_loc.astype(jnp.int32), MC, -1)),
        "mvalid": r3(padn(ctx.mut_valid.astype(jnp.int32), MC, 0)),
        "msingle": r3(padn(ctx.mut_single.astype(jnp.int32), MC, 0)),
        "slope": r3(padn(ctx.slope.astype(f32), MC, 0.0)),
        "b": r3(padn(ctx.b.astype(f32), C, 0.0)),
        "part_root": ctx.part_root.astype(jnp.int32),
        "is_run_root": ctx.is_run_root.astype(jnp.int32),
        "n_leaves": ctx.n_leaves.astype(jnp.int32),
        "n_nodes": ctx.n_nodes.astype(jnp.int32),
    }
    min_pop = pop_params.min_pop.astype(f32)
    shared = {
        "A": jnp.pad(sh.A.astype(f32), (0, C - C_real),
                     constant_values=1.0).reshape(1, C),
        "nbar": jnp.pad(sh.popsize_bar.astype(f32), (0, C - C_real),
                        constant_values=1.0).reshape(1, C),
        "t_lo": sh.t_lo.astype(f32),
        "t_step": sh.t_step.astype(f32),
        "t_max_tip": sh.t_max_tip.astype(f32),
        "log_n0": jnp.log(pop_params.n0.astype(f32)),
        "g": pop_params.g.astype(f32),
        "t0": pop_params.t0.astype(f32),
        "log_min_pop": jnp.where(min_pop > 0.0, jnp.log(
            jnp.maximum(min_pop, 1e-30)), -jnp.inf),
    }
    stat = ChainStatics(NC=NC, MC=MC, C=C, C_real=C_real, cpb=cpb,
                        no_single=no_single, no_reform=no_reform)
    return stat, ctx_arrs, shared
