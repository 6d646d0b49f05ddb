"""Partition-decoupled (augmented) coalescent prior as jit kernels.

Device re-design of core/very_scalable_coalescent.{h,cpp}: the quadratic
lineage-count coupling k_bar*(k_bar-1) across partitions is broken by
auxiliary Gaussian per-part cell fields k_twiddle_p sampled at each global
boundary (cpp:198-219); each part's partial log prior then depends only on
its own k_bar_p plus frozen field totals (cpp:356-390), so node-time moves in
different parts are independent — the statistical fact that lets the local
sweep fan out over partitions (vmap on one chip, shard_map across chips).

Grid convention: unlike the reference's past-growing cells (cpp:14-24), cells
here share the forward-indexed boundary grid of ops/coalescent.py
(cell c covers [t_lo + c*dt, t_lo + (c+1)*dt)); the per-cell algebra is
orientation-independent.  All arrays are [P, C] stacked per part.

Per-cell partial quad (very_scalable_coalescent.cpp:356-390):

    partial_p = -sum_c (dt/Nbar_c) * (0.5 * kp_c^2 * A_c - b_pc * kp_c)
    b_pc      = ktp_pc * A_c - kt_c + 0.5        (frozen during a sweep)

With P=1 and field at its mean (ktp=0) this reduces exactly to the plain
scalable prior's -sum dt*k(k-1)/(2N).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import pop as popm


class VscFields(NamedTuple):
    """Frozen per-boundary augmentation state (shared: A, popsize_bar)."""
    A: jnp.ndarray            # f64[C] number of active parts per cell (>=1)
    b: jnp.ndarray            # f64[P, C] ktp*A - kt + 0.5 (0 at inactive cells)
    k_p: jnp.ndarray          # f64[P, C] per-part lineage-count staircases


def calc_k_bar_signed(t, sign, t_lo, t_step, num_cells: int):
    """Per-part time-averaged lineage counts from node times + signs.

    Generalizes ops/coalescent.calc_k_bar (sign +1 tips / -1 coalescences,
    scalable_coalescent.cpp:118-138) to the partition signs of
    partmaps.PartMaps.sign: part leaves +1, inner non-root -1, part root -2
    (-1 for the run-root part, which leaves the root lineage extending to the
    grid bottom), pads 0."""
    rel = (t - t_lo) / t_step
    cell = jnp.floor(rel).astype(jnp.int32)
    in_grid = (cell >= 0) & (cell < num_cells)
    frac = rel - cell
    cl = jnp.clip(cell, 0, num_cells - 1)
    k_frac = jnp.zeros(num_cells, t.dtype).at[cl].add(
        jnp.where(in_grid, sign * frac, 0.0))
    counts = jnp.zeros(num_cells, t.dtype).at[cl].add(
        jnp.where(in_grid, sign, 0.0))
    above = jnp.sum(jnp.where(cell >= num_cells, sign, 0.0))
    rev_cum = jnp.cumsum(counts[::-1])[::-1]
    return above + rev_cum - counts + k_frac


def active_cells(part_t_lo, part_t_hi, t_lo, t_step, num_cells: int):
    """bool[P, C]: cells overlapping each part's reachable time range
    (the reference's first_cell..last_cell bands, cpp:151-163; here the range
    is the static bound [subroot_t, max leaf t_max], grid bottom for the
    run-root part)."""
    lb = t_lo + t_step * jnp.arange(num_cells, dtype=t_step.dtype)  # [C]
    return ((lb[None, :] <= part_t_hi[:, None]) &
            (lb[None, :] + t_step > part_t_lo[:, None]))


def sample_fields(key, k_p, active, popsize_bar, t_step) -> VscFields:
    """Sample the auxiliary Gaussians and freeze the linear coefficients
    (make_very_scalable_coalescent_prior_parts, cpp:198-219):
    ktp ~ N(k_p - k/A, sqrt(Nbar/(A*dt))) at active cells, 0 elsewhere."""
    P, C = k_p.shape
    A = jnp.maximum(jnp.sum(active, axis=0).astype(k_p.dtype), 1.0)  # [C]
    k = jnp.sum(k_p, axis=0)                                          # [C]
    mu = k_p - (k / A)[None, :]
    sigma = jnp.sqrt(popsize_bar / (A * t_step))[None, :]
    z = jax.random.normal(key, (P, C), dtype=k_p.dtype)
    ktp = jnp.where(active, mu + sigma * z, 0.0)
    kt = jnp.sum(ktp, axis=0)
    b = jnp.where(active, ktp * A[None, :] - kt[None, :] + 0.5, 0.0)
    return VscFields(A=A, b=b, k_p=k_p)


def fields_at_mean(k_p, active, popsize_bar, t_step) -> VscFields:
    """Deterministic auxiliaries (test mode): ktp at its conditional mean.
    With P=1 this makes the partial prior equal the plain scalable prior."""
    A = jnp.maximum(jnp.sum(active, axis=0).astype(k_p.dtype), 1.0)
    k = jnp.sum(k_p, axis=0)
    ktp = jnp.where(active, k_p - (k / A)[None, :], 0.0)
    kt = jnp.sum(ktp, axis=0)
    b = jnp.where(active, ktp * A[None, :] - kt[None, :] + 0.5, 0.0)
    return VscFields(A=A, b=b, k_p=k_p)


def partial_quad(k_p, b_p, A, popsize_bar, t_step):
    """One part's quadratic partial log prior (cpp:356-390), excluding the
    per-coalescence -log N point terms."""
    return -jnp.sum((t_step / popsize_bar) * (0.5 * k_p * k_p * A - b_p * k_p))


def displace_delta(k_p, b_p, A, popsize_bar, t_lo, t_step, pop_params,
                   old_t, new_t, node_is_tip):
    """(delta partial log prior, new k_p) for one node displacement within a
    part, O(C) vectorized (cpp:309-465).  Inner nodes carry the -log N(t)
    point term; the part root is frozen and never displaced here."""
    C = k_p.shape[0]
    sign = jnp.where(node_is_tip, 1.0, -1.0)
    lb = t_lo + t_step * jnp.arange(C, dtype=k_p.dtype)
    frac_old = jnp.clip((old_t - lb) / t_step, 0.0, 1.0)
    frac_new = jnp.clip((new_t - lb) / t_step, 0.0, 1.0)
    dk = sign * (frac_new - frac_old)
    dquad = -jnp.sum((t_step / popsize_bar) *
                     (0.5 * ((k_p + dk) ** 2 - k_p ** 2) * A - b_p * dk))
    dlogN = jnp.where(
        node_is_tip, 0.0,
        -(jnp.log(popm.pop_at_time(pop_params, new_t)) -
          jnp.log(popm.pop_at_time(pop_params, old_t))))
    return dquad + dlogN, k_p + dk


def displace_delta_batch(k_p, b_p, A, popsize_bar, t_lo, t_step, pop_params,
                         old_t, new_t, node_is_tip):
    """Per-slot deltas for a batch of displacements in ONE part whose proposal
    windows touch disjoint cells (the coloring contract of
    sweep.batched_part_displace): each slot's delta is computed against the
    pre-batch k_p, which is exact because disjoint-cell quadratics compose
    additively.  Returns (delta[k], dk[k, C])."""
    C = k_p.shape[0]
    sign = jnp.where(node_is_tip, 1.0, -1.0)
    lb = (t_lo + t_step * jnp.arange(C, dtype=k_p.dtype))[None, :]
    frac_old = jnp.clip((old_t[:, None] - lb) / t_step, 0.0, 1.0)
    frac_new = jnp.clip((new_t[:, None] - lb) / t_step, 0.0, 1.0)
    dk = sign[:, None] * (frac_new - frac_old)                    # [k, C]
    dquad = -jnp.sum((t_step / popsize_bar)[None, :] *
                     (0.5 * ((k_p[None, :] + dk) ** 2 - (k_p ** 2)[None, :])
                      * A[None, :] - b_p[None, :] * dk), axis=1)
    logN_new = jnp.log(popm.pop_at_time(pop_params, new_t))
    logN_old = jnp.log(popm.pop_at_time(pop_params, old_t))
    delta = dquad + jnp.where(node_is_tip, 0.0, -(logN_new - logN_old))
    return delta, dk
