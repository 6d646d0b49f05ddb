"""Effective-population-size models for the coalescent prior.

Reference semantics: core/pop_model.{h,cpp}.  Each model provides
  pop_at_time(t)            N(t)*rho
  pop_integral(a, b)        int_a^b N dt
  intensity_integral(a, b)  int_a^b 1/N dt
as pure jax functions vectorizable over (a, b).

The exponential model includes the reference's min_pop floor with the
crossover-time t_c treatment (core/pop_model.cpp:22-145).  The Skygrid model
supports both staircase (Gill et al 2012) and log-linear interpolation
(core/pop_model.cpp:147-560), evaluated with the same bias-compensated
log-sum-exp core, vectorized over the knot axis instead of the reference's
interval loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

STAIRCASE = 1
LOG_LINEAR = 2


class ExpPopParams(NamedTuple):
    t0: jnp.ndarray
    n0: jnp.ndarray        # pop at t0 (> 0)
    g: jnp.ndarray         # growth rate [1/day]
    min_pop: jnp.ndarray   # floor (>= 0); reference default 1.0 (run.cpp:21)

    @property
    def t_c(self):
        """Crossover time where n0*exp(g*(t-t0)) == min_pop; +/-inf when no crossing."""
        safe_g = jnp.where(self.g == 0.0, 1.0, self.g)
        tc = self.t0 + jnp.log(self.min_pop / self.n0) / safe_g
        # no floor or zero growth: crossing never matters; park it at -inf (g>0)
        # or +inf (g<=0) so that clamped-segment logic degenerates correctly
        no_cross = (self.min_pop <= 0.0) | (self.g == 0.0)
        return jnp.where(no_cross, jnp.where(self.g > 0.0, -jnp.inf, jnp.inf), tc)


def exp_pop_at_time(p: ExpPopParams, t):
    return jnp.maximum(p.min_pop, p.n0 * jnp.exp((t - p.t0) * p.g))


def _exp_unclamped_pop_integral(p: ExpPopParams, a, b):
    # int_a^b n0 exp(g (t - t0)) dt, stable for g -> 0
    g = p.g
    safe_g = jnp.where(g == 0.0, 1.0, g)
    val = p.n0 / safe_g * jnp.exp(safe_g * (a - p.t0)) * jnp.expm1(safe_g * (b - a))
    return jnp.where(g == 0.0, (b - a) * p.n0, val)


def _exp_unclamped_intensity_integral(p: ExpPopParams, a, b):
    g = p.g
    safe_g = jnp.where(g == 0.0, 1.0, g)
    val = -1.0 / (p.n0 * safe_g) * jnp.exp(-safe_g * (a - p.t0)) * jnp.expm1(-safe_g * (b - a))
    return jnp.where(g == 0.0, (b - a) / p.n0, val)


def exp_pop_integral(p: ExpPopParams, a, b):
    """int_a^b N dt with the min_pop floor (reference core/pop_model.cpp:43-91)."""
    tc = p.t_c
    # Split [a,b] at tc into clamped and unclamped segments.
    # g > 0: clamped below tc; g < 0: clamped above tc; min_pop==0/g==0 handled by tc = +/-inf.
    lo_c = jnp.clip(tc, a, b)   # split point
    clamped_lo = jnp.where(p.g > 0.0, lo_c - a, b - lo_c)        # length of clamped part
    un_a = jnp.where(p.g > 0.0, lo_c, a)
    un_b = jnp.where(p.g > 0.0, b, lo_c)
    base = clamped_lo * p.min_pop + _exp_unclamped_pop_integral(p, un_a, un_b)
    # special case: g == 0 with active floor
    const_val = (b - a) * jnp.maximum(p.min_pop, p.n0)
    return jnp.where((p.g == 0.0) & (p.min_pop > 0.0), const_val, base)


def exp_intensity_integral(p: ExpPopParams, a, b):
    """int_a^b 1/N dt with the min_pop floor (reference core/pop_model.cpp:93-145)."""
    tc = p.t_c
    lo_c = jnp.clip(tc, a, b)
    clamped_len = jnp.where(p.g > 0.0, lo_c - a, b - lo_c)
    un_a = jnp.where(p.g > 0.0, lo_c, a)
    un_b = jnp.where(p.g > 0.0, b, lo_c)
    inv_min = jnp.where(p.min_pop > 0.0, 1.0 / jnp.where(p.min_pop > 0.0, p.min_pop, 1.0), 0.0)
    base = clamped_len * inv_min + _exp_unclamped_intensity_integral(p, un_a, un_b)
    const_val = (b - a) / jnp.maximum(p.min_pop, p.n0)
    return jnp.where((p.g == 0.0) & (p.min_pop > 0.0), const_val, base)


import dataclasses

import jax


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SkygridPopParams:
    x: jnp.ndarray       # knot times, shape [M+1], strictly increasing
    gamma: jnp.ndarray   # log N at knots, shape [M+1]
    type: int            # STAIRCASE or LOG_LINEAR (static aux data)
    tau: jnp.ndarray = 1.0  # GMRF precision (sampled parameter)

    def tree_flatten(self):
        return (self.x, self.gamma, self.tau), self.type

    @classmethod
    def tree_unflatten(cls, aux, children):
        x, gamma, tau = children
        return cls(x=x, gamma=gamma, type=aux, tau=tau)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


def skygrid_log_N(p: SkygridPopParams, t):
    """log N(t) (reference core/pop_model.cpp:181-200); t may be an array."""
    t = jnp.asarray(t)
    x, gamma = p.x, p.gamma
    M = x.shape[0] - 1
    k = jnp.searchsorted(x, t, side="left")  # interval_containing_t
    if p.type == STAIRCASE:
        idx = jnp.clip(jnp.maximum(k, 1) - 1 + 1, 0, M)  # k in [1,M] -> gamma[k]
        idx = jnp.where(k == 0, 0, jnp.where(k > M, M, k))
        return gamma[idx]
    else:
        km1 = jnp.clip(k - 1, 0, M - 1)
        c = (t - x[km1]) / (x[km1 + 1] - x[km1])
        mid = (1 - c) * gamma[km1] + c * gamma[km1 + 1]
        return jnp.where(k == 0, gamma[0], jnp.where(k > M, gamma[M], mid))


def skygrid_pop_at_time(p: SkygridPopParams, t):
    return jnp.exp(skygrid_log_N(p, t))


def _skygrid_log_int_core(x, gamma_eff, type_, a, b):
    """log(int_a^b exp(gamma(t)) dt), bias-compensated; vectorized over intervals.

    Reference: core/pop_model.cpp log_int_N_core (247-330).  Each of the M+2
    intervals contributes the integral over its intersection with [a,b]; here
    all contributions are computed at once and combined with logsumexp.
    """
    M = x.shape[0] - 1
    # interval k spans (edge_lo[k], edge_hi[k]], k = 0..M+1
    edge_lo = jnp.concatenate([jnp.array([-jnp.inf]), x])
    edge_hi = jnp.concatenate([x, jnp.array([jnp.inf])])
    lo = jnp.clip(edge_lo, a, b)
    hi = jnp.clip(edge_hi, a, b)
    dt = jnp.maximum(hi - lo, 0.0)

    if type_ == STAIRCASE:
        # per-interval gamma: interval 0 -> gamma[0], k in 1..M -> gamma[k],
        # interval M+1 -> gamma[M]; M+2 intervals total
        g_k = jnp.concatenate([gamma_eff, gamma_eff[-1:]])
        # contribution_k = exp(g_k) * dt_k
        log_contrib = jnp.where(dt > 0.0, g_k + jnp.log(jnp.where(dt > 0.0, dt, 1.0)), -jnp.inf)
    else:
        # inner interval k (1..M): gamma interpolates linearly
        km = jnp.arange(M)  # inner interval index - 1
        x_lo, x_hi = x[km], x[km + 1]
        g_lo_k, g_hi_k = gamma_eff[km], gamma_eff[km + 1]
        lo_i, hi_i = lo[1:M + 1], hi[1:M + 1]
        dt_i = jnp.maximum(hi_i - lo_i, 0.0)
        c_lo = (lo_i - x_lo) / (x_hi - x_lo)
        c_hi = (hi_i - x_lo) / (x_hi - x_lo)
        G_lo = (1 - c_lo) * g_lo_k + c_lo * g_hi_k
        G_hi = (1 - c_hi) * g_lo_k + c_hi * g_hi_k
        D = G_hi - G_lo
        # expm1(D)/D is accurate for small nonzero D; guard D == 0
        safe_D = jnp.where(D == 0.0, 1.0, D)
        fac = jnp.where(D == 0.0, 1.0, jnp.expm1(safe_D) / safe_D)
        log_inner = jnp.where(
            dt_i > 0.0,
            G_lo + jnp.log(jnp.where(dt_i > 0.0, dt_i * fac, 1.0)),
            -jnp.inf)
        log_first = jnp.where(dt[0] > 0.0,
                              gamma_eff[0] + jnp.log(jnp.where(dt[0] > 0.0, dt[0], 1.0)), -jnp.inf)
        log_last = jnp.where(dt[M + 1] > 0.0,
                             gamma_eff[M] + jnp.log(jnp.where(dt[M + 1] > 0.0, dt[M + 1], 1.0)), -jnp.inf)
        log_contrib = jnp.concatenate([log_first[None], log_inner, log_last[None]])

    m = jnp.max(log_contrib)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    return m + jnp.log(jnp.sum(jnp.exp(log_contrib - m)))


def skygrid_pop_integral(p: SkygridPopParams, a, b):
    return jnp.exp(_skygrid_log_int_core(p.x, p.gamma, p.type, a, b))


def skygrid_intensity_integral(p: SkygridPopParams, a, b):
    return jnp.exp(_skygrid_log_int_core(p.x, -p.gamma, p.type, a, b))


# --- Uniform dispatch -------------------------------------------------------
# Pop model params are one of the NamedTuples above; dispatch is static
# (python isinstance), so each jitted kernel specializes on the model type.

def pop_at_time(p, t):
    if isinstance(p, ExpPopParams):
        return exp_pop_at_time(p, t)
    return skygrid_pop_at_time(p, t)


def pop_integral(p, a, b):
    if isinstance(p, ExpPopParams):
        return exp_pop_integral(p, a, b)
    return skygrid_pop_integral(p, a, b)


def intensity_integral(p, a, b):
    if isinstance(p, ExpPopParams):
        return exp_intensity_integral(p, a, b)
    return skygrid_intensity_integral(p, a, b)


def render_population_curve(p, t_start: float, t_end: float,
                            num_t_cells: int):
    """Cell-averaged N(t) staircase over [t_start, t_end]
    (pop_model.cpp:562-573 render_population_curve; the WASM surface's
    pop-curve entry point, api.h:46-52)."""
    import numpy as np
    cell = (t_end - t_start) / num_t_cells
    lo = t_start + cell * np.arange(num_t_cells)
    import jax
    vals = jax.vmap(lambda a: pop_integral(p, a, a + cell))(
        jnp.asarray(lo)) / cell
    return np.asarray(vals)
