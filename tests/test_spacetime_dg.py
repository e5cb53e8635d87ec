"""Space-time DG integration test: 1D heat equation with linear-in-time
shape functions packed in a doubled field space (reference:
LinearDGSpaceTimeIntegrator, timeIntegration.py:249-366).  Third-order
accuracy in the time step is verified against the exact decaying mode.
"""

import math

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.timeint import LinearDGSpaceTimeIntegrator


def solve_heat_dg(n_steps, p=3, nel=24):
    """u_t = u_xx on (0,1), u = sin(pi x) e^{-pi^2 t}, t in [0, T]."""
    T = 0.02
    dt = T / n_steps
    cm = ExplicitBSplineControlMesh([p], [uniform_knots(p, 0.0, 1.0, nel)])
    # doubled space: field 0 = past-edge values, field 1 = future-edge
    sp = EqualOrderSpline(2, cm)
    basis = sp.get_scalar_spline()
    for f in (0, 1):
        for side in (0, 1):
            sp.add_zero_dofs(f, basis.side_dofs(0, side))
    spline = ExtractedSpline(sp, quad_degree=2 * p)

    # exact initial state: L2 projection of sin(pi x) into both time nodes
    U0half = spline.project(
        lambda ctx: jnp.stack([jnp.sin(jnp.pi * ctx.x[0])] * 2),
        rationalize=False)

    ti = LinearDGSpaceTimeIntegrator(dt, U0half, U0half,
                                     n_time_quad_pts=2)

    def res(ctx, s, v):
        u = s["u"]
        u_old = s["u_old"]
        ut = ti.f_t(u)  # constant-in-time Jet
        u_fn = ti.f(u)
        v_fn = ti.f(v)

        def spatial(t):
            uj = u_fn(t)
            vj = v_fn(t)
            return (ut.val * vj.val
                    + jnp.sum(ctx.grad(uj) * ctx.grad(vj)))

        interior = ti.int_dt(spatial)
        # upwind jump at the past edge of the slab
        jump = (ti.at_past_bdry(u).val - ti.at_future_bdry(u_old).val) \
            * ti.at_past_bdry(v).val
        return interior + jump

    for step in range(n_steps):
        state = {"u": ti.x, "u_old": ti.x_old}
        ti.x = spline.solve_nonlinear_variational_problem(res, U0=state)
        ti.advance()

    # error of the future-edge value at final time
    decay = math.exp(-math.pi ** 2 * T)

    def err_density(ctx, u):
        uf = ti.at_future_bdry(u)  # value at the final slab's future edge
        e = uf.val - decay * jnp.sin(jnp.pi * ctx.x[0])
        return e * e

    return math.sqrt(float(spline.assemble_functional(err_density,
                                                      U=ti.x_old)))


def test_spacetime_dg_third_order():
    errs = [solve_heat_dg(n) for n in (1, 2, 4)]
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    assert errs[-1] < 1e-6, errs
    for r in rates:
        assert r > 2.6, (errs, rates)
