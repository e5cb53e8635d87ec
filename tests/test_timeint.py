"""Unit tests for the time integrators: coefficient algebra against the
reference formulas (timeIntegration.py:144-150), convergence order on model
ODEs, and consistency of the Jet-compatible state-dict API.
"""

import numpy as np
import jax.numpy as jnp

from tigar_tpu.timeint import (BackwardEulerIntegrator,
                               GeneralizedAlphaIntegrator, LoadStepper)


def test_generalized_alpha_coefficients():
    rho = 0.5
    gi = GeneralizedAlphaIntegrator(rho, 0.1, jnp.zeros(1),
                                    (jnp.zeros(1),) * 3)
    # second-order system coefficients (timeIntegration.py:144-150)
    assert np.isclose(gi.alpha_m, (2.0 - rho) / (1.0 + rho))
    assert np.isclose(gi.alpha_f, 1.0 / (1.0 + rho))
    assert np.isclose(gi.gamma, 0.5 + gi.alpha_m - gi.alpha_f)
    assert np.isclose(gi.beta, 0.25 * (1.0 + gi.alpha_m - gi.alpha_f) ** 2)
    # first-order alpha_m
    gi1 = GeneralizedAlphaIntegrator(rho, 0.1, jnp.zeros(1),
                                     (jnp.zeros(1),) * 2)
    assert np.isclose(gi1.alpha_m, 0.5 * (3.0 - rho) / (1.0 + rho))
    # midpoint special case
    gmid = GeneralizedAlphaIntegrator(1.0, 0.1, jnp.zeros(1),
                                      (jnp.zeros(1),) * 2)
    assert np.isclose(gmid.alpha_m, 0.5) and np.isclose(gmid.alpha_f, 0.5)


def _solve_decay_gen_alpha(n_steps, rho=0.5):
    """Solve xdot = -x, x(0)=1 over [0,1] with generalized-alpha (1st order),
    solving the alpha-level collocation equation exactly per step."""
    dt = 1.0 / n_steps
    x = jnp.asarray([1.0])
    xdot = jnp.asarray([-1.0])
    gi = GeneralizedAlphaIntegrator(rho, dt, x, (x, xdot))
    for _ in range(n_steps):
        # residual: xdot_alpha + x_alpha = 0, linear in unknown x_{n+1}
        s0 = {"u": jnp.zeros(1), "x_old": gi.x_old, "xdot_old": gi.xdot_old}
        s1 = {"u": jnp.ones(1), "x_old": gi.x_old, "xdot_old": gi.xdot_old}
        r0 = gi.xdot_alpha_of(s0) + gi.x_alpha_of(s0)
        r1 = gi.xdot_alpha_of(s1) + gi.x_alpha_of(s1)
        slope = r1 - r0
        gi.x = -r0 / slope
        gi.advance()
    return float(gi.x_old[0])


def test_generalized_alpha_second_order_accuracy():
    exact = np.exp(-1.0)
    e1 = abs(_solve_decay_gen_alpha(8) - exact)
    e2 = abs(_solve_decay_gen_alpha(16) - exact)
    e3 = abs(_solve_decay_gen_alpha(32) - exact)
    r1 = np.log2(e1 / e2)
    r2 = np.log2(e2 / e3)
    assert r1 > 1.8 and r2 > 1.8, (e1, e2, e3)


def test_backward_euler_first_order_accuracy():
    exact = np.exp(-1.0)

    def solve(n):
        dt = 1.0 / n
        be = BackwardEulerIntegrator(dt, jnp.asarray([1.0]),
                                     (jnp.asarray([1.0]),))
        for _ in range(n):
            # (x - x_old)/dt + x = 0  ->  x = x_old/(1+dt)
            be.x = be.x_old / (1.0 + dt)
            be.advance()
        return float(be.x_old[0])

    e1 = abs(solve(16) - exact)
    e2 = abs(solve(32) - exact)
    assert 0.8 < np.log2(e1 / e2) < 1.2


def test_gen_alpha_oscillator_energy():
    """2nd-order system xddot = -x with rho_inf=1 (midpoint): energy must be
    conserved to high accuracy."""
    dt = 0.05
    n = 200
    gi = GeneralizedAlphaIntegrator(1.0, dt, jnp.asarray([1.0]),
                                    (jnp.asarray([1.0]), jnp.asarray([0.0]),
                                     jnp.asarray([-1.0])))
    for _ in range(n):
        # residual(x) = xddot_alpha + x_alpha = 0, linear in x
        s = lambda u: {"u": u, "x_old": gi.x_old, "xdot_old": gi.xdot_old,
                       "xddot_old": gi.xddot_old}
        r0 = gi.xddot_alpha_of(s(jnp.zeros(1))) + gi.x_alpha_of(s(jnp.zeros(1)))
        r1 = gi.xddot_alpha_of(s(jnp.ones(1))) + gi.x_alpha_of(s(jnp.ones(1)))
        gi.x = -r0 / (r1 - r0)
        gi.advance()
    E = float(gi.x_old[0] ** 2 + gi.xdot_old[0] ** 2)
    assert abs(E - 1.0) < 1e-3
    # solution tracks cos(t)
    assert abs(float(gi.x_old[0]) - np.cos(n * dt)) < 5e-3


def test_load_stepper():
    ls = LoadStepper(0.25)
    assert np.isclose(ls.t, 0.25)
    ls.advance()
    assert np.isclose(ls.t, 0.5)


def test_same_velocity_predictor():
    """Predictor formula (timeIntegration.py:210-224): for the exact linear
    oscillator state it should approximate x(t+dt) to O(dt^2)."""
    import math
    dt = 0.01
    # x = cos(t) at t=0: x=1, xdot=0, xddot=-1
    gi = GeneralizedAlphaIntegrator(0.5, dt, jnp.asarray([1.0]),
                                    (jnp.asarray([1.0]), jnp.asarray([0.0]),
                                     jnp.asarray([-1.0])))
    pred = float(gi.same_velocity_predictor()[0])
    # Newmark-weighted second-order predictor: error is O(dt^2) with a
    # rho_inf-dependent constant
    assert abs(pred - math.cos(dt)) < 2.0 * dt ** 2
    # first-order systems: predictor is x_old
    gi1 = GeneralizedAlphaIntegrator(0.5, dt, jnp.asarray([2.0]),
                                     (jnp.asarray([3.0]), jnp.asarray([0.0])))
    assert float(gi1.same_velocity_predictor()[0]) == 3.0


def test_backward_euler_second_order_system():
    """xddot = -x with backward Euler: stable, damped oscillation."""
    dt = 0.05
    be = BackwardEulerIntegrator(dt, jnp.asarray([1.0]),
                                 (jnp.asarray([1.0]), jnp.asarray([0.0])))
    for _ in range(100):
        # residual(x) = xddot(x) + x = 0, linear
        s = lambda u: {"u": u, "x_old": be.x_old, "xdot_old": be.xdot_old}
        r0 = be.xddot_of(s(jnp.zeros(1))) + 0.0
        r1 = be.xddot_of(s(jnp.ones(1))) + 1.0
        be.x = -r0 / (r1 - r0)
        be.advance()
    x = float(be.x_old[0])
    # numerically damped but bounded
    assert abs(x) < 1.0
    assert np.isfinite(x)
