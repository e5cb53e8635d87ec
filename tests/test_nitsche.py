"""Nitsche weak Dirichlet BCs, expressed as user-level boundary form terms
(no strong zero-DoF constraints anywhere).

The reference imposes Dirichlet BCs strongly via zeroed IGA DoFs
(tIGAr/common.py:265-282, 1197-1200); weak imposition there would be a
user-written UFL boundary form over spline.ds.  Here the same capability
flows through the per-term boundary measures (models/extracted.py term()/
("ds", dir, side) domains) with the physical normal and gradients available
at boundary quadrature points (forms.QP.normal), proving the form language
covers Nitsche's method: symmetric consistency + penalty

    -(du/dn) v - (dv/dn)(u - g) + (beta/h)(u - g) v   on each side.
"""

import math

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def _solve_nitsche_poisson(p, nel, beta_scale=10.0):
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)   # NO strong zero DoFs
    spline = ExtractedSpline(sp, quad_degree=2 * p)

    def soln(x):
        # nonzero on the boundary: exercises the inhomogeneous data path
        return jnp.sin(jnp.pi * x[0]) * jnp.cos(jnp.pi * x[1]) + x[0] * x[1]

    def f_rhs(x):
        return 2.0 * jnp.pi ** 2 * jnp.sin(jnp.pi * x[0]) \
            * jnp.cos(jnp.pi * x[1])

    h = 1.0 / nel
    beta = beta_scale * p * p / h

    def vol(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v)) - f_rhs(ctx.x) * v.val

    def nitsche(ctx, u, v):
        g = soln(ctx.x)
        dun = jnp.dot(ctx.grad(u), ctx.normal)
        dvn = jnp.dot(ctx.grad(v), ctx.normal)
        jump = u.val - g
        return -dun * v.val - dvn * jump + beta * jump * v.val

    U = spline.solve_linear_variational_problem({"dx": vol, "ds": nitsche})
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                 rationalize=False))
    return err


def test_nitsche_poisson_optimal_rate():
    p = 2
    errs = [_solve_nitsche_poisson(p, nel) for nel in (8, 16, 32)]
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    assert errs[-1] < 2e-5
    assert min(rates) > p + 0.7, (errs, rates)


def test_nitsche_matches_strong_bcs():
    """With homogeneous data and a large penalty, the Nitsche solution is
    close to the strongly-constrained solution of the same problem."""
    p, nel = 2, 12

    def f_rhs(x):
        return 2.0 * jnp.pi ** 2 * jnp.sin(jnp.pi * x[0]) \
            * jnp.sin(jnp.pi * x[1])

    def vol(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v)) - f_rhs(ctx.x) * v.val

    # strong
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline_s = ExtractedSpline(sp, quad_degree=2 * p)
    U_strong = spline_s.solve_linear_variational_problem(vol)

    # weak
    h = 1.0 / nel
    beta = 100.0 * p * p / h

    def nitsche(ctx, u, v):
        dun = jnp.dot(ctx.grad(u), ctx.normal)
        dvn = jnp.dot(ctx.grad(v), ctx.normal)
        return -dun * v.val - dvn * u.val + beta * u.val * v.val

    sp2 = EqualOrderSpline(1, ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2))
    spline_w = ExtractedSpline(sp2, quad_degree=2 * p)
    U_weak = spline_w.solve_linear_variational_problem(
        {"dx": vol, "ds": nitsche})

    # identical spaces/DoF layouts: compare coefficient vectors directly
    diff = float(jnp.linalg.norm(U_weak - U_strong)) \
        / float(jnp.linalg.norm(U_strong))
    assert diff < 5e-3, diff
