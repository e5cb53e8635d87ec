"""Biharmonic problem on quartic C^3 B-splines -- the simplest weak form
inaccessible to C^0 finite elements.  Energy-norm convergence is measured
(L2 is suboptimal for low degrees).  Mirror of demos/biharmonic/biharmonic.py.
"""

import math

import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline

p = q = 4


def exact(x):
    return (jnp.cos(jnp.pi * x[0]) + 1.0) * (jnp.cos(jnp.pi * x[1]) + 1.0)


def lap_exact(x):
    return jnp.trace(jax.hessian(exact)(x))


def f_rhs(x):
    return jnp.trace(jax.hessian(lap_exact)(x))


errors = []
for level in range(3):
    NEL = 10 * 2 ** level
    mesh = ExplicitBSplineControlMesh(
        [p, q], [uniform_knots(p, -1.0, 1.0, NEL)] * 2)
    gen = EqualOrderSpline(1, mesh)
    basis = gen.get_scalar_spline()
    for direction in (0, 1):
        for side in (0, 1):
            # two layers of control points: strongly enforces u = 0 AND
            # grad(u) . n = 0 (clamped)
            gen.add_zero_dofs(0, basis.side_dofs(direction, side,
                                                 n_layers=2))
    spline = ExtractedSpline(gen, quad_degree=2 * max(p, q), nders=2)

    def a(ctx, u, v):
        return ctx.lap(u) * ctx.lap(v)

    def L(ctx, v):
        return f_rhs(ctx.x) * v.val

    U = spline.solve_linear_variational_problem(a, rhs_form=L)

    def err_density(ctx, u):
        e = ctx.lap(u) - lap_exact(ctx.x)
        return e * e

    err = float(jnp.sqrt(spline.assemble_functional(err_density, U=U)))
    errors.append(err)
    rate = ("--" if level == 0
            else math.log(errors[level - 1] / errors[level]) / math.log(2.0))
    print(f"Energy error for level {level} = {err}  (rate = {rate})")
