"""Poisson on an explicit cubic B-spline patch, verified with manufactured
solutions over three refinement levels (optimal L2 rate p+1 = 4).

Mirror of the reference demo demos/poisson/poisson.py.
"""

import math

import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.io import write_extraction, write_vtk

N_LEVELS = 3
p = q = 3
x0 = y0 = 0.0
Lx = Ly = 1.0

errors = []
for level in range(N_LEVELS):
    NEL = 10 * 2 ** level
    print("Generating extraction...")
    mesh = ExplicitBSplineControlMesh(
        [p, q], [uniform_knots(p, x0, x0 + Lx, NEL),
                 uniform_knots(q, y0, y0 + Ly, NEL)])
    gen = EqualOrderSpline(1, mesh)
    basis = gen.get_scalar_spline()
    for direction in (0, 1):
        for side in (0, 1):
            gen.add_zero_dofs(0, basis.side_dofs(direction, side))
    write_extraction(gen, "./extraction")

    print("Setting up extracted spline...")
    spline = ExtractedSpline(gen, quad_degree=2 * max(p, q))

    print("Solving...")

    def soln(x):
        return (jnp.sin(jnp.pi * (x[0] - x0) / Lx)
                * jnp.sin(jnp.pi * (x[1] - y0) / Ly))

    def a(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    def L(ctx, v):
        f = (jnp.pi ** 2 / Lx ** 2 + jnp.pi ** 2 / Ly ** 2) * soln(ctx.x)
        return f * v.val

    U = spline.solve_linear_variational_problem(a, rhs_form=L)
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                 rationalize=False))
    errors.append(err)
    rate = ("--" if level == 0
            else math.log(errors[level - 1] / errors[level]) / math.log(2.0))
    print(f"L2 Error for level {level} = {err}  (rate = {rate})")

write_vtk("results_u.vtk", spline, fields={"u": U})
