"""Fused HKY pseudo-Gibbs chain: 10x (frequency + kappa) moves in one kernel.

The reference runs 10 rounds of HKY delta-exchange frequency moves and kappa
scale moves at every global boundary (core/run.cpp:714-719, 953-1103).  As
XLA ops (mcmc/global_moves.hky_frequencies_move/hky_kappa_move inside a
fori_loop) the 20 sequential tiny-op MH steps cost ~0.8 ms per boundary on a
v5e — pure per-op dispatch overhead, the stats (Ttwiddle_a, M_ab, root_freq)
are 4- and 16-vectors.  Same fusion strategy as pop_pallas.py: the chain
body is pure jnp on (1, 4)/(4, 4) tiles, shared between the Pallas kernel
and a jnp twin consuming identical pre-generated uniforms
(tests/test_hky_pallas.py pins the twin against the original moves).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30

# uniform lane assignment per round
_U_D, _U_IA, _U_IB, _U_ACC_F, _U_SCALE, _U_ACC_K = 0, 1, 2, 3, 4, 5


def _hky_q_tiles(kappa, pi_row, ar, br):
    """HKY85 rate matrix on a (4, 4) tile (evo.hky_q, core/evo_hky.cpp:7-50).
    ar/br are broadcasted_iota row/col indices; pi_row is (1, 4)."""
    transition = (ar != br) & (ar % 2 == br % 2)
    transversion = (ar % 2) != (br % 2)
    r = jnp.where(transition, kappa, 0.0) + jnp.where(transversion, 1.0, 0.0)
    pi_col = jnp.transpose(pi_row)                       # (4, 1)
    R = jnp.sum(pi_col * r * pi_row)
    q = r * pi_row / R
    rowsum = jnp.sum(q, axis=1, keepdims=True)           # (4, 1)
    return q - jnp.where(ar == br, 1.0, 0.0) * rowsum


def _chain_rows(n_rounds: int, hypf, mu, kappa0, pi0, Ttwiddle_a, M_ab,
                root_freq, get_u):
    """The 10-round chain on (1, 4)/(4, 4) tiles.  Returns (kappa, pi, q)."""
    (kappa_m, kappa_s, freq_enabled, kappa_enabled) = hypf
    ar = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
    br = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    off = ar != br
    Mpos = off & (M_ab > 0.0)

    def delta_of(new_q, new_qa, old_q, old_qa):
        d = -mu * jnp.sum((new_qa - old_qa) * Ttwiddle_a)
        safe_ratio = jnp.where(old_q > 0.0,
                               new_q / jnp.where(old_q > 0.0, old_q, 1.0),
                               1.0)
        d += jnp.sum(jnp.where(Mpos, M_ab * jnp.log(safe_ratio), 0.0))
        return d

    def qa_of(q):
        return jnp.transpose(-jnp.sum(jnp.where(ar == br, q, 0.0), axis=1,
                                      keepdims=True))     # (1, 4)

    def round_body(i, carry):
        kappa, pi, q, qa = carry
        u = get_u(i)  # (1, 128)
        pick = lambda j: jnp.sum(jnp.where(lane128 == j, u, 0.0))
        if freq_enabled:
            # delta-exchange on two frequencies (run.cpp:953-1034)
            d = pick(_U_D) * 0.01
            ia = jnp.floor(pick(_U_IA) * 4.0).astype(jnp.int32)
            ib = (ia + 1 + jnp.floor(pick(_U_IB) * 3.0).astype(jnp.int32)) % 4
            new_pi = pi + jnp.where(lane4 == ia, d, 0.0) \
                - jnp.where(lane4 == ib, d, 0.0)
            pia = jnp.sum(jnp.where(lane4 == ia, new_pi, 0.0))
            pib = jnp.sum(jnp.where(lane4 == ib, new_pi, 0.0))
            ok = (pia > 0.0) & (pia < 1.0) & (pib > 0.0) & (pib < 1.0)
            safe_pi = jnp.where(new_pi > 0.0, new_pi, 1.0)
            new_q = _hky_q_tiles(kappa, safe_pi, ar, br)
            new_qa = qa_of(new_q)
            delta = delta_of(new_q, new_qa, q, qa)
            delta += jnp.sum(jnp.where(root_freq > 0.0,
                                       root_freq * jnp.log(safe_pi / pi),
                                       0.0))
            acc = ok & ((delta > 0.0) | (
                jnp.log(jnp.maximum(pick(_U_ACC_F), _TINY)) < delta))
            pi = jnp.where(acc, new_pi, pi)
            q = jnp.where(acc, new_q, q)
            qa = jnp.where(acc, new_qa, qa)
        if kappa_enabled:
            # scale move on kappa, log-normal prior (run.cpp:1036-1103)
            scale = 0.75 + pick(_U_SCALE) * (1.0 / 0.75 - 0.75)
            new_kappa = kappa * scale
            new_q = _hky_q_tiles(new_kappa, pi, ar, br)
            new_qa = qa_of(new_q)
            lpr = ((-(jnp.log(new_kappa) - kappa_m) ** 2
                    + (jnp.log(kappa) - kappa_m) ** 2)
                   / (2.0 * kappa_s * kappa_s)) + jnp.log(kappa / new_kappa)
            log_alpha = jnp.log(kappa / new_kappa)
            log_mh = delta_of(new_q, new_qa, q, qa) + lpr + log_alpha
            acc = (log_mh > 0.0) | (
                jnp.log(jnp.maximum(pick(_U_ACC_K), _TINY)) < log_mh)
            kappa = jnp.where(acc, new_kappa, kappa)
            q = jnp.where(acc, new_q, q)
            qa = jnp.where(acc, new_qa, qa)
        return kappa, pi, q, qa

    f = pi0.dtype
    q0 = _hky_q_tiles(kappa0, pi0, ar, br)
    kappa, pi, q, _ = jax.lax.fori_loop(
        0, n_rounds, round_body, (kappa0.astype(f), pi0, q0, qa_of(q0)))
    return kappa, pi, q


def hky_chain_jnp(u, mu, kappa0, pi0, Ttwiddle_a, M_ab, root_freq, hypf,
                  n_rounds: int):
    get_u = lambda i: jax.lax.dynamic_slice_in_dim(u, i, 1, axis=0)
    return _chain_rows(n_rounds, hypf, mu, kappa0, pi0, Ttwiddle_a, M_ab,
                       root_freq, get_u)


def _kernel_entry(n_rounds, hypf, fsc_ref, u_r, pi_r, tt_r, m_r, rf_r,
                  kappa_o, pi_o, q_o):
    mu, kappa0 = fsc_ref[0], fsc_ref[1]
    get_u = lambda i: u_r[pl.dslice(i, 1), :]
    kappa, pi, q = _chain_rows(n_rounds, hypf, mu, kappa0, pi_r[:], tt_r[:],
                               m_r[:], rf_r[:], get_u)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    kappa_o[:] = jnp.where(lane == 0, kappa, 0.0)
    pi_o[:] = pi
    q_o[:] = q


def hky_chain_pallas(u, mu, kappa0, pi0, Ttwiddle_a, M_ab, root_freq, hypf,
                     n_rounds: int, interpret: bool = False):
    f = pi0.dtype
    NR = u.shape[0]
    fsc = jnp.stack([jnp.asarray(mu, f), jnp.asarray(kappa0, f)])
    spec = lambda *shape: pl.BlockSpec(shape, lambda *_: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[spec(NR, 128), spec(1, 4), spec(1, 4), spec(4, 4),
                  spec(1, 4)],
        out_specs=[spec(1, 128), spec(1, 4), spec(4, 4)],
    )
    kappa_o, pi_o, q_o = pl.pallas_call(
        partial(_kernel_entry, n_rounds, hypf),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, 128), f),
                   jax.ShapeDtypeStruct((1, 4), f),
                   jax.ShapeDtypeStruct((4, 4), f)],
        interpret=interpret,
    )(fsc, u, pi0, Ttwiddle_a, M_ab, root_freq)
    return kappa_o[0, 0], pi_o, q_o


def hky_chain(key, evo, Ttwiddle_a, M_ab, root_freq, hyp, n_rounds: int = 10,
              use_kernel: bool = True, interpret: bool = False):
    """Drop-in for the 10x hky fori_loop: returns evo with updated
    (kappa, pi, q, q_tab)."""
    dtype = jnp.float32 if not jax.config.x64_enabled else jnp.float64
    u = jax.random.uniform(key, (n_rounds, 128), dtype)
    hypf = (float(hyp.kappa_prior_mean_log), float(hyp.kappa_prior_sigma_log),
            True, True)
    args = (u, evo.mu.astype(dtype), evo.kappa.astype(dtype),
            evo.pi.astype(dtype).reshape(1, 4),
            Ttwiddle_a.astype(dtype).reshape(1, 4),
            M_ab.astype(dtype).reshape(4, 4),
            root_freq.astype(dtype).reshape(1, 4), hypf, n_rounds)
    if use_kernel:
        kappa, pi, q = hky_chain_pallas(*args, interpret=interpret)
    else:
        kappa, pi, q = hky_chain_jnp(*args)
    dt = evo.pi.dtype
    return evo._replace(kappa=kappa.astype(evo.kappa.dtype),
                        pi=pi.reshape(4).astype(dt),
                        q=q.astype(dt),
                        q_tab=q.astype(dt)[None])
