"""Pop-model integral tests vs numeric quadrature (reference strategy:
tests/pop_model_tests.cpp)."""

import numpy as np
import pytest
from scipy import integrate

import jax.numpy as jnp

from delphy_tpu import pop


def quad(f, a, b):
    v, _ = integrate.quad(f, a, b, limit=200)
    return v


@pytest.mark.parametrize("g", [0.0, 0.05, -0.05])
@pytest.mark.parametrize("min_pop", [0.0, 1.0, 50.0])
def test_exp_pop_integrals(g, min_pop):
    p = pop.ExpPopParams(t0=jnp.float64(100.0), n0=jnp.float64(200.0),
                         g=jnp.float64(g), min_pop=jnp.float64(min_pop))

    def N(t):
        return max(min_pop, 200.0 * np.exp((t - 100.0) * g))

    for (a, b) in [(0.0, 50.0), (-100.0, 300.0), (90.0, 110.0), (120.0, 121.0),
                   (-500.0, -400.0)]:
        got = float(pop.exp_pop_integral(p, a, b))
        expect = quad(N, a, b)
        np.testing.assert_allclose(got, expect, rtol=1e-6, err_msg=f"pop_integral {a},{b}")
        got_i = float(pop.exp_intensity_integral(p, a, b))
        expect_i = quad(lambda t: 1.0 / N(t), a, b)
        np.testing.assert_allclose(got_i, expect_i, rtol=1e-6, err_msg=f"intensity {a},{b}")


def test_exp_pop_at_time():
    p = pop.ExpPopParams(t0=jnp.float64(0.0), n0=jnp.float64(10.0),
                         g=jnp.float64(-0.1), min_pop=jnp.float64(2.0))
    np.testing.assert_allclose(float(pop.exp_pop_at_time(p, 0.0)), 10.0)
    np.testing.assert_allclose(float(pop.exp_pop_at_time(p, 100.0)), 2.0)


@pytest.mark.parametrize("type_", [pop.STAIRCASE, pop.LOG_LINEAR])
def test_skygrid_integrals(type_):
    x = jnp.array([0.0, 10.0, 25.0, 40.0])
    gamma = jnp.array([2.0, 3.5, 1.0, 4.0])
    p = pop.SkygridPopParams(x=x, gamma=gamma, type=type_)

    xs = np.asarray(x)
    gs = np.asarray(gamma)

    def logN(t):
        if t <= xs[0]:
            return gs[0]
        if t > xs[-1]:
            return gs[-1]
        k = int(np.searchsorted(xs, t, side="left"))
        if type_ == pop.STAIRCASE:
            return gs[k]
        c = (t - xs[k - 1]) / (xs[k] - xs[k - 1])
        return (1 - c) * gs[k - 1] + c * gs[k]

    for t in [-5.0, 0.0, 3.0, 10.0, 17.0, 25.0, 33.0, 40.0, 55.0]:
        np.testing.assert_allclose(float(pop.skygrid_log_N(p, t)), logN(t), rtol=1e-12,
                                   err_msg=f"log_N at {t}")

    for (a, b) in [(-20.0, 5.0), (2.0, 38.0), (12.0, 13.0), (-10.0, 60.0), (45.0, 50.0)]:
        got = float(pop.skygrid_pop_integral(p, a, b))
        expect = quad(lambda t: np.exp(logN(t)), a, b)
        np.testing.assert_allclose(got, expect, rtol=1e-6, err_msg=f"pop_integral {a},{b}")
        got_i = float(pop.skygrid_intensity_integral(p, a, b))
        expect_i = quad(lambda t: np.exp(-logN(t)), a, b)
        np.testing.assert_allclose(got_i, expect_i, rtol=1e-6, err_msg=f"intensity {a},{b}")


def test_skygrid_degenerate_equal_gammas():
    x = jnp.array([0.0, 10.0])
    gamma = jnp.array([2.0, 2.0])
    for type_ in (pop.STAIRCASE, pop.LOG_LINEAR):
        p = pop.SkygridPopParams(x=x, gamma=gamma, type=type_)
        np.testing.assert_allclose(float(pop.skygrid_pop_integral(p, 0.0, 10.0)),
                                   10.0 * np.exp(2.0), rtol=1e-10)

def test_render_population_curve():
    from delphy_tpu.pop import (ExpPopParams, render_population_curve,
                                exp_pop_at_time)
    import jax.numpy as jnp
    p = ExpPopParams(t0=jnp.float64(0.0), n0=jnp.float64(100.0),
                     g=jnp.float64(0.01), min_pop=jnp.float64(1e-3))
    curve = render_population_curve(p, -100.0, 0.0, 20)
    assert curve.shape == (20,)
    # cell averages of a growing population are increasing and bracket N(t)
    assert (np.diff(curve) > 0).all()
    assert curve[-1] <= 100.0 + 1e-6
    # midpoint value is close to the cell average for smooth N
    mid = float(exp_pop_at_time(p, -2.5))
    np.testing.assert_allclose(curve[-1], mid, rtol=0.01)
