"""Periodic spline assembly tests: wrapped (mod-ncp) connectivity flowing
through projection and solves -- the reference supports unclamped knot
vectors with node indices wrapping modulo ncp (BSplines.py:310-319,
generateFieldsCompat periodicities, compatibleSplines.py:58-64).
"""

import math

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import (ExplicitBSplineControlMesh,
                                      TensorBSplineBasis)
from tigar_tpu.models.space import FieldListSpline, EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def make_periodic_space(p, nel):
    """Identity control mesh (open) with a periodic unknown field on the
    same Bezier grid."""
    cm = ExplicitBSplineControlMesh([p], [uniform_knots(p, 0.0, 1.0, nel)])
    field = TensorBSplineBasis([p],
                               [uniform_knots(p, 0.0, 1.0, nel,
                                              periodic=True)])
    assert field.kvs[0].is_periodic
    assert field.ncp == nel  # wrapped basis: one DoF per element
    return FieldListSpline(cm, [field])


def test_periodic_projection_accuracy():
    """L2 projection of a periodic function onto periodic splines converges
    at the optimal rate (exercises wrapped connectivity in assembly)."""
    p = 3
    errs = []
    for nel in (8, 16, 32):
        sp = make_periodic_space(p, nel)
        spline = ExtractedSpline(sp, quad_degree=2 * p)

        def f(ctx):
            return jnp.sin(2.0 * jnp.pi * ctx.x[0])

        U = spline.project(f, rationalize=False)
        errs.append(float(spline.errornorm(U, f, rationalize=False)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > p + 1 - 0.3, (errs, rates)


def test_periodic_poisson_solve():
    """Periodic reaction-diffusion (-u'' + u = f): no boundary conditions,
    nonsingular thanks to the reaction term; optimal convergence."""
    p = 2

    def soln(x):
        return jnp.cos(2.0 * jnp.pi * x)

    errs = []
    for nel in (8, 16, 32):
        sp = make_periodic_space(p, nel)
        spline = ExtractedSpline(sp, quad_degree=2 * p)

        def a(ctx, u, v):
            return jnp.sum(ctx.grad(u) * ctx.grad(v)) + u.val * v.val

        def L(ctx, v):
            lam = 4.0 * jnp.pi ** 2 + 1.0
            return lam * soln(ctx.x[0]) * v.val

        U = spline.solve_linear_variational_problem(a, rhs_form=L,
                                                    apply_bcs=False)
        errs.append(float(spline.errornorm(
            U, lambda ctx: soln(ctx.x[0]), rationalize=False)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > p + 1 - 0.3, (errs, rates)
