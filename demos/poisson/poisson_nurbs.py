"""Poisson on a distorted quadratic NURBS geometry with rationalized
trial/test functions; optimal L2 rate p+1 = 3.

Mirror of demos/poisson/poisson-nurbs.py (igakit geometry generation is
replaced by direct control-net construction + knot-insertion refinement).
"""

import math

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.refine import uniform_refine
from tigar_tpu.models.nurbs import NURBSControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.io import write_vtk

degrees = [2, 2]
kvecs0 = [np.asarray([-1.0, -1, -1, 1, 1, 1])] * 2
ctrl0 = np.zeros((3, 3, 3))
ctrl0[:, :, :2] = np.asarray([[[-1.0, -1.0], [0.0, -1.0], [1.0, -1.0]],
                              [[-1.0, 0.0], [0.7, 0.3], [1.0, 0.0]],
                              [[-1.0, 1.0], [0.0, 1.0], [1.0, 1.0]]])
ctrl0[:, :, 2] = 1.0

errors = []
for level in range(3):
    print("Creating geometry (knot insertion)...")
    kvecs, ctrl = uniform_refine(degrees, kvecs0, ctrl0, levels=level + 3)
    mesh = NURBSControlMesh(degrees, kvecs, ctrl)
    gen = EqualOrderSpline(1, mesh)
    basis = gen.get_scalar_spline()
    for direction in (0, 1):
        for side in (0, 1):
            gen.add_zero_dofs(0, basis.side_dofs(direction, side))

    spline = ExtractedSpline(gen, quad_degree=4)
    print("Solving...")

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def a(ctx, u, v):
        uu, vv = ctx.rationalize(u), ctx.rationalize(v)
        return jnp.sum(ctx.grad(uu) * ctx.grad(vv))

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * ctx.rationalize(v).val

    U = spline.solve_linear_variational_problem(a, rhs_form=L)
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x)))
    errors.append(err)
    rate = ("--" if level == 0
            else math.log(errors[level - 1] / errors[level]) / math.log(2.0))
    print(f"L2 Error for level {level} = {err}  (rate = {rate})")

write_vtk("results_u.vtk", spline, fields={"u": U})
