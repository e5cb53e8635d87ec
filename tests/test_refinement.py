"""Mixed-precision iterative refinement: the Poisson system solved to full
f64 accuracy (1e-12 relative residual, optimal-L2 solution) with all inner
CG work in float32 through the fast-path operator."""

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.ops.fastpath import make_laplace_operator
from tigar_tpu.solvers.linear import jacobi_preconditioner
from tigar_tpu.solvers.refinement import refine_solve


def test_refinement_reaches_f64_accuracy():
    p, nel = 2, 16
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline = ExtractedSpline(sp, quad_degree=2 * p)

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def a_form(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    b = spline.assemble_vector(L)
    asm = spline._assembler("dx")
    op32 = make_laplace_operator(asm, spline.mask)
    op64 = spline.matrix_operator(a_form)
    diag = spline.assemble_diagonal(a_form).astype(jnp.float32)
    M32 = jacobi_preconditioner(diag)

    x, sweeps, rel = refine_solve(op64, op32, b, tol=1e-12, inner_iters=60,
                                  M_f32=M32)
    assert rel < 1e-12, (sweeps, rel)
    # matches the direct f64 solve to near machine precision
    x_direct = spline.solve_linear_variational_problem(a_form, rhs_form=L)
    err = float(jnp.linalg.norm(x - x_direct)
                / jnp.linalg.norm(x_direct))
    assert err < 1e-10, err
