"""Fused exp-pop pseudo-Gibbs chain: 50 MH rounds in one Pallas TPU kernel.

Why: the reference runs 50 rounds of (n0 scale move, g random-walk move) at
every global boundary (core/run.cpp:755-761, 1237-1319).  The XLA expression
of that chain (mcmc/global_moves.exp_pop_moves) is ~100 sequential O(C)+O(N)
prior evaluations of ~25 tiny ops each, whose per-op dispatch overhead costs
~1.8 ms per boundary on a v5e — 40% of the whole Ebola-scale boundary.  This
module runs the identical chain as ONE kernel over VMEM-resident (1, C) /
(1, NC) rows, the same fusion strategy as block_pallas.py.

The chain body is pure jnp (`_chain_rows`), shared verbatim between the
Pallas kernel and a vmap-free jnp twin (`exp_pop_chain_jnp`) that consumes
the same pre-generated uniforms — so the two are bit-comparable (up to f32
reassociation) and the twin is pinned against the original exp_pop_moves
math in tests/test_pop_pallas.py.

Semantics vs exp_pop_moves: identical proposal densities, prior ratios and
accept rules (run.cpp:1237-1319); only the RNG layout differs (uniform lanes
pre-generated per round instead of sequential key splits), which changes the
sampled trajectory but not the kernel's stationary distribution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_pallas import _expm1_k, _round_up

# finite stand-ins for +/-inf (Mosaic inf arithmetic produces NaNs in
# clip/mul corners; 1e30 behaves identically under clip and comparisons
# at these magnitudes)
_BIG = 1.0e30
_TINY = 1e-30

# uniform lane assignment per round
_U_SCALE, _U_ACC_N0, _U_DELTA, _U_ACC_G = 0, 1, 2, 3


def _hyp_floats(hyp):
    """Static (hashable) hyperparameters of the two moves."""
    clamp = lambda v: max(-_BIG, min(_BIG, float(v)))
    return (float(hyp.pop_inv_n0_prior_alpha), float(hyp.pop_inv_n0_prior_beta),
            clamp(hyp.pop_g_min), clamp(hyp.pop_g_max),
            float(hyp.pop_g_prior_mu), float(hyp.pop_g_prior_scale),
            bool(hyp.pop_size_move_enabled),
            bool(hyp.pop_growth_rate_move_enabled))


def _lp_rows(lbs, k2, t_row, inner, t_step, t0, min_pop, n0, g):
    """Coalescent log prior for fixed k_bar on padded rows: exp_pop_integral
    with the min_pop floor (pop.py:63-75 / reference pop_model.cpp:43-91)
    plus the per-inner-node -log N(t) term.  Tested against the
    vmap/exp_pop_integral formulation in tests/test_pop_pallas.py."""
    a = lbs
    b = lbs + t_step
    half_k2_dt = 0.5 * t_step * k2
    log_min_pop = jnp.where(min_pop > 0.0,
                            jnp.log(jnp.maximum(min_pop, _TINY)), -_BIG)
    safe_g = jnp.where(g == 0.0, 1.0, g)
    tc = t0 + jnp.log(jnp.maximum(min_pop, _TINY) / n0) / safe_g
    no_cross = (min_pop <= 0.0) | (g == 0.0)
    tc = jnp.where(no_cross, jnp.where(g > 0.0, -_BIG, _BIG), tc)
    lo_c = jnp.clip(tc, a, b)
    clamped = jnp.where(g > 0.0, lo_c - a, b - lo_c)
    un_a = jnp.where(g > 0.0, lo_c, a)
    un_b = jnp.where(g > 0.0, b, lo_c)
    unclamped = (n0 / safe_g) * jnp.exp(safe_g * (un_a - t0)) \
        * _expm1_k(safe_g * (un_b - un_a))
    unclamped = jnp.where(g == 0.0, t_step * n0, unclamped)
    integral = clamped * min_pop + unclamped
    integral = jnp.where((g == 0.0) & (min_pop > 0.0),
                         t_step * jnp.maximum(min_pop, n0), integral)
    nbar = jnp.maximum(integral / t_step, _TINY)
    quad = -jnp.sum(half_k2_dt / nbar)
    logN = jnp.maximum(log_min_pop, jnp.log(n0) + g * (t_row - t0))
    return quad - jnp.sum(jnp.where(inner, logN, 0.0))


def _chain_rows(n_rounds: int, hypf, lbs, k2, t_row, inner,
                t_step, t0, min_pop, n0_0, g_0, get_u):
    """The 50-round chain on (1, C)/(1, NC) rows; runs inside the Pallas
    kernel and as the jnp twin.  lbs/k2 are the coalescent grid's cell lower
    bounds and k_bar*(k_bar-1); padded cells must carry k2 == 0 and a finite
    lbs.  t_row/inner are node times and the inner-node mask (padded nodes
    inner=False).  Returns (n0, g)."""
    (alpha, beta, g_min, g_max, g_mu, g_scale,
     size_enabled, growth_enabled) = hypf
    f = t_row.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def lp_of(n0, g):
        return _lp_rows(lbs, k2, t_row, inner, t_step, t0, min_pop, n0, g)

    def round_body(i, carry):
        n0, g, lp = carry
        u = get_u(i)  # (1, 128)
        pick = lambda j: jnp.sum(jnp.where(lane == j, u, 0.0))
        if size_enabled:
            # scale move on n0, Inverse-Gamma(alpha, beta) prior
            scale = 0.75 + pick(_U_SCALE) * (1.0 / 0.75 - 0.75)
            new_n0 = n0 * scale
            lpr = (-(alpha + 1.0) * jnp.log(scale)
                   - beta * (1.0 / new_n0 - 1.0 / n0))
            new_lp = lp_of(new_n0, g)
            log_mh = (new_lp - lp) + lpr - jnp.log(scale)
            acc = (log_mh > 0.0) | (
                jnp.log(jnp.maximum(pick(_U_ACC_N0), _TINY)) < log_mh)
            n0 = jnp.where(acc, new_n0, n0)
            lp = jnp.where(acc, new_lp, lp)
        if growth_enabled:
            # random-walk move on g, truncated Laplace prior
            delta = (2.0 * pick(_U_DELTA) - 1.0) * (1.0 / 365.0)
            new_g = g + delta
            ok = (new_g >= g_min) & (new_g <= g_max)
            lpr = (jnp.abs(g - g_mu) - jnp.abs(new_g - g_mu)) / g_scale
            new_lp = lp_of(n0, new_g)
            log_mh = (new_lp - lp) + lpr
            acc = ok & ((log_mh > 0.0) | (
                jnp.log(jnp.maximum(pick(_U_ACC_G), _TINY)) < log_mh))
            g = jnp.where(acc, new_g, g)
            lp = jnp.where(acc, new_lp, lp)
        return n0, g, lp

    n0_0 = n0_0.astype(f)
    g_0 = g_0.astype(f)
    n0, g, _ = jax.lax.fori_loop(0, n_rounds, round_body,
                                 (n0_0, g_0, lp_of(n0_0, g_0)))
    return n0, g


def pack_rows(grid, t, is_tip, dtype):
    """Pad grid/node arrays to lane-aligned (1, X) rows (inert padding)."""
    lbs = grid.cell_lbounds().astype(dtype)
    C_real = lbs.shape[0]
    C = _round_up(C_real, 128)
    k2 = (grid.k_bar * (grid.k_bar - 1.0)).astype(dtype)
    lbs = jnp.pad(lbs, (0, C - C_real), mode="edge").reshape(1, C)
    k2 = jnp.pad(k2, (0, C - C_real)).reshape(1, C)
    N_real = t.shape[0]
    NC = _round_up(N_real, 128)
    t_row = jnp.pad(t.astype(dtype), (0, NC - N_real)).reshape(1, NC)
    inner = jnp.pad(~is_tip, (0, NC - N_real)).reshape(1, NC)
    return lbs, k2, t_row, inner


def exp_pop_chain_jnp(u, lbs, k2, t_row, inner, t_step, t0, min_pop,
                      n0_0, g_0, hypf, n_rounds: int):
    """jnp twin: same rows, same uniforms, value dynamic_slice for rounds."""
    get_u = lambda i: jax.lax.dynamic_slice_in_dim(u, i, 1, axis=0)
    return _chain_rows(n_rounds, hypf, lbs, k2, t_row, inner,
                       t_step, t0, min_pop, n0_0, g_0, get_u)


def _kernel_entry(n_rounds, hypf, fsc_ref, u_r, lbs_r, k2_r, t_r, inner_r,
                  out_r):
    t_step, t0, min_pop, n0_0, g_0 = (fsc_ref[0], fsc_ref[1], fsc_ref[2],
                                      fsc_ref[3], fsc_ref[4])
    get_u = lambda i: u_r[pl.dslice(i, 1), :]
    n0, g = _chain_rows(n_rounds, hypf, lbs_r[:], k2_r[:], t_r[:],
                        inner_r[:] != 0, t_step, t0, min_pop, n0_0, g_0,
                        get_u)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_r[:] = jnp.where(lane == 0, n0, jnp.where(lane == 1, g, 0.0))


def exp_pop_chain_pallas(u, lbs, k2, t_row, inner, t_step, t0, min_pop,
                         n0_0, g_0, hypf, n_rounds: int,
                         interpret: bool = False):
    """Pallas execution: one program, whole chain in VMEM."""
    f = t_row.dtype
    C = lbs.shape[1]
    NC = t_row.shape[1]
    NR = u.shape[0]
    fsc = jnp.stack([jnp.asarray(t_step, f), jnp.asarray(t0, f),
                     jnp.asarray(min_pop, f), jnp.asarray(n0_0, f),
                     jnp.asarray(g_0, f)])

    spec = lambda *shape: pl.BlockSpec(shape, lambda *_: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # fsc
        grid=(1,),
        in_specs=[spec(NR, 128), spec(1, C), spec(1, C), spec(1, NC),
                  spec(1, NC)],
        out_specs=[spec(1, 128)],
    )
    (out,) = pl.pallas_call(
        partial(_kernel_entry, n_rounds, hypf),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, 128), f)],
        interpret=interpret,
    )(fsc, u, lbs, k2, t_row, inner.astype(jnp.int32))
    return out[0, 0], out[0, 1]


def exp_pop_chain(key, pop_params, grid, t, is_tip, hyp, n_rounds: int = 50,
                  use_kernel: bool = True, interpret: bool = False):
    """Drop-in chain runner: returns pop_params with updated (n0, g).

    use_kernel=True runs the Pallas kernel (TPU); False runs the jnp twin on
    the same uniforms (any backend) — outputs agree to f32 reassociation.
    """
    dtype = jnp.float32 if not jax.config.x64_enabled else jnp.float64
    u = jax.random.uniform(key, (n_rounds, 128), dtype)
    lbs, k2, t_row, inner = pack_rows(grid, t, is_tip, dtype)
    hypf = _hyp_floats(hyp)
    args = (u, lbs, k2, t_row, inner, grid.t_step.astype(dtype),
            pop_params.t0.astype(dtype), pop_params.min_pop.astype(dtype),
            pop_params.n0, pop_params.g, hypf, n_rounds)
    if use_kernel:
        n0, g = exp_pop_chain_pallas(*args, interpret=interpret)
    else:
        n0, g = exp_pop_chain_jnp(*args)
    zero = jnp.zeros((), pop_params.n0.dtype)
    return pop_params._replace(n0=n0.astype(pop_params.n0.dtype) + zero,
                               g=g.astype(pop_params.g.dtype) + zero)
