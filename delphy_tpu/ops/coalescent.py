"""Time-discretized Kingman coalescent prior on a dense cell grid.

Array re-design of the reference's Scalable_coalescent_prior
(core/scalable_coalescent.{h,cpp}): the staircase of time-averaged lineage
counts k_bar and pop sizes N_bar lives in fixed-size arrays of C cells covering
[t_lo, t_lo + C*t_step].  Instead of maintaining k_bar incrementally through a
deque, we have:

  - full recompute in O(N + C): each node contributes sign_i to every cell
    fully before its time plus a fractional part to its containing cell
    (sign +1 tips, -1 coalescences; cf. displace_tip/displace_coalescence,
    scalable_coalescent.cpp:118-138), realized as one scatter-add plus a
    reverse cumulative sum;
  - per-move displacement deltas in O(C) fully vectorized (cf. the cell-range
    loop of calc_delta_log_prior_after_displace_coalescence, cpp:189-251).

The grid is (re)built at every global-move boundary with margins wide enough
that within-sweep proposals stay on-grid (proposal bounds are clamped to the
grid, mirroring the reference's own proposal caps, subrun.cpp:188-199).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import pop as popm


class CoalGrid(NamedTuple):
    t_lo: jnp.ndarray         # f64 scalar: lower bound of cell 0
    t_step: jnp.ndarray       # f64 scalar
    k_bar: jnp.ndarray        # f64[C]
    popsize_bar: jnp.ndarray  # f64[C]

    @property
    def num_cells(self) -> int:
        return self.k_bar.shape[0]

    def cell_lbounds(self):
        return self.t_lo + self.t_step * jnp.arange(self.num_cells, dtype=jnp.float64)


def calc_popsize_bars(pop_params, t_lo, t_step, num_cells: int):
    """popsize_bar[c] = (1/dt) int_cell N dt, floored at 1e-100
    (scalable_coalescent.cpp:56-63)."""
    lb = t_lo + t_step * jnp.arange(num_cells, dtype=jnp.float64)
    vals = jax.vmap(lambda a: popm.pop_integral(pop_params, a, a + t_step))(lb) / t_step
    return jnp.maximum(vals, 1e-100)


def calc_k_bar(t: jnp.ndarray, is_tip: jnp.ndarray, t_lo, t_step, num_cells: int):
    """Time-averaged lineage counts per cell, from scratch, O(N + C)."""
    sign = jnp.where(is_tip, 1.0, -1.0)
    rel = (t - t_lo) / t_step
    cell = jnp.floor(rel).astype(jnp.int32)

    in_grid = (cell >= 0) & (cell < num_cells)
    frac = rel - cell
    k_frac = jnp.zeros(num_cells, jnp.float64).at[jnp.clip(cell, 0, num_cells - 1)].add(
        jnp.where(in_grid, sign * frac, 0.0))

    counts = jnp.zeros(num_cells, jnp.float64).at[jnp.clip(cell, 0, num_cells - 1)].add(
        jnp.where(in_grid, sign, 0.0))
    above = jnp.sum(jnp.where(cell >= num_cells, sign, 0.0))
    # k_full[c] = sum over nodes with cell_i > c = above + sum_{c' > c} counts[c']
    rev_cum = jnp.cumsum(counts[::-1])[::-1]  # inclusive suffix sum
    k_full = above + rev_cum - counts  # exclusive suffix sum
    return k_full + k_frac


def make_grid(pop_params, t, is_tip, t_lo, t_step, num_cells: int) -> CoalGrid:
    return CoalGrid(
        t_lo=jnp.asarray(t_lo, jnp.float64),
        t_step=jnp.asarray(t_step, jnp.float64),
        k_bar=calc_k_bar(t, is_tip, t_lo, t_step, num_cells),
        popsize_bar=calc_popsize_bars(pop_params, t_lo, t_step, num_cells),
    )


def calc_log_prior(grid: CoalGrid, pop_params, t, is_tip):
    """-sum_c dt k_bar (k_bar - 1) / (2 N_bar) - sum_coal log N(t_i)
    (scalable_coalescent.cpp:163-187)."""
    quad = -jnp.sum(grid.t_step * grid.k_bar * (grid.k_bar - 1.0) / (2.0 * grid.popsize_bar))
    logN = jnp.log(popm.pop_at_time(pop_params, t))
    return quad - jnp.sum(jnp.where(is_tip, 0.0, logN))


def displace_delta(grid: CoalGrid, pop_params, old_t, new_t, node_is_tip):
    """(delta_log_prior, new_k_bar) for one node displacement, O(C).

    node_is_tip: traced bool; tips add lineage mass when moving later
    (sign +1), coalescences remove it (sign -1); only coalescences carry the
    -log N(t) point term (scalable_coalescent.cpp:118-138, 189-251)."""
    sign = jnp.where(node_is_tip, 1.0, -1.0)
    lb = grid.cell_lbounds()
    frac_old = jnp.clip((old_t - lb) / grid.t_step, 0.0, 1.0)
    frac_new = jnp.clip((new_t - lb) / grid.t_step, 0.0, 1.0)
    dk = sign * (frac_new - frac_old)
    k = grid.k_bar
    delta_quad = -jnp.sum(grid.t_step * ((k + dk) * (k + dk - 1.0) - k * (k - 1.0))
                          / (2.0 * grid.popsize_bar))
    delta_logN = jnp.where(
        node_is_tip, 0.0,
        -(jnp.log(popm.pop_at_time(pop_params, new_t)) -
          jnp.log(popm.pop_at_time(pop_params, old_t))))
    return delta_quad + delta_logN, k + dk
