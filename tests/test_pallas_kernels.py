"""Pallas fused element-apply tests (interpret mode on CPU): the f32 fast
path must match the XLA tangent action of the Laplace form to f32 accuracy,
and a CG solve through it must converge to the Poisson solution."""

import numpy as np
import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.ops.pallas_kernels import make_laplace_operator
from tigar_tpu.solvers.linear import solve_krylov, jacobi_preconditioner


def make_poisson(nel=9, p=2):
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    return ExtractedSpline(sp, quad_degree=2 * p)


def a_form(ctx, u, v):
    return jnp.sum(ctx.grad(u) * ctx.grad(v))


def test_fused_apply_matches_xla_action():
    spline = make_poisson()
    asm = spline._assembler("dx")
    op = make_laplace_operator(asm, spline.mask, tile_e=32, interpret=True,
                               use_pallas=True)
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=spline.ndof))
    ref = spline.tangent_action(
        a_form, jnp.zeros(spline.ndof, dtype=spline.dtype), W)
    got = op(W)
    denom = float(jnp.linalg.norm(ref))
    assert float(jnp.linalg.norm(got - ref)) / denom < 1e-6


def test_cg_through_fused_apply():
    spline = make_poisson()
    asm = spline._assembler("dx")
    op = make_laplace_operator(asm, spline.mask, tile_e=32, interpret=True)

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    b = spline.assemble_vector(L)
    diag = spline.assemble_diagonal(a_form)
    U = solve_krylov(op, b, method="cg", tol=1e-7,
                     M=jacobi_preconditioner(diag))
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                 rationalize=False))
    assert err < 5e-4  # f32 fast path: discretization-level accuracy
