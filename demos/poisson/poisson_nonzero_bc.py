"""Poisson with inhomogeneous Dirichlet BCs via project-then-Newton:
the homogeneous BC applies to each Newton increment, preserving boundary
data set in the initial guess.  Mirror of demos/poisson/poisson-nonzero-bc.py.
"""

import math

import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline

p = q = 2
errors = []
for level in range(3):
    NEL = 10 * 2 ** level
    mesh = ExplicitBSplineControlMesh(
        [p, q], [uniform_knots(p, 0.0, 1.0, NEL)] * 2)
    gen = EqualOrderSpline(1, mesh)
    basis = gen.get_scalar_spline()
    for direction in (0, 1):
        for side in (0, 1):
            gen.add_zero_dofs(0, basis.side_dofs(direction, side))
    spline = ExtractedSpline(gen, quad_degree=2 * max(p, q))

    def soln(x):
        return jnp.cos(jnp.pi * x[0]) * jnp.cos(jnp.pi * x[1])

    # initial guess: L2 projection of a function satisfying the BC
    lump_mass = False
    U0 = spline.project(lambda ctx: soln(ctx.x), rationalize=False,
                        lump_mass=lump_mass)

    def res(ctx, u, v):
        return (jnp.sum(ctx.grad(u) * ctx.grad(v))
                - 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val)

    U = spline.solve_nonlinear_variational_problem(res, U0=U0)
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                 rationalize=False))
    errors.append(err)
    rate = ("--" if level == 0
            else math.log(errors[level - 1] / errors[level]) / math.log(2.0))
    print(f"L2 Error for level {level} = {err}  (rate = {rate})")
