"""Integration test: 2D Poisson with manufactured solution on an explicit
cubic B-spline patch -- mirrors demos/poisson/poisson.py:16-140 with hard
thresholds on the observed L2 convergence rate (optimal = p+1 = 4).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def poisson_error(p, nel, solver=None):
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline = ExtractedSpline(sp, quad_degree=2 * p)
    if solver is not None:
        spline.set_solver_options(linear_solver=solver)

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def a(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    U = spline.solve_linear_variational_problem(a, rhs_form=L)
    err = spline.errornorm(U, lambda ctx: soln(ctx.x), rationalize=False)
    return float(err)


def test_poisson_convergence_rate():
    p = 3
    errs = [poisson_error(p, n) for n in (8, 16, 32)]
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    assert errs[-1] < 1e-7
    for r in rates:
        assert r > p + 1 - 0.25, f"suboptimal rate {r}"


def test_poisson_matrix_free_cg_matches_direct():
    e_direct = poisson_error(2, 12, solver="direct")
    e_cg = poisson_error(2, 12, solver="cg")
    assert np.isclose(e_direct, e_cg, rtol=1e-6)


def test_poisson_residual_form_path():
    """solveLinearVariationalProblem with a residual form instead of a==L
    (reference: common.py:1266-1290)."""
    p, nel = 2, 10
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

    def res(ctx, u, v):
        return (jnp.sum(ctx.grad(u) * ctx.grad(v))
                - 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val)

    U = spline.solve_linear_variational_problem(res)
    err = spline.errornorm(U, lambda ctx: soln(ctx.x), rationalize=False)
    assert float(err) < 5e-4


def test_poisson_nonlinear_solver_on_linear_problem():
    """Newton on the linear residual converges in one iteration."""
    p, nel = 2, 8
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

    def res(ctx, u, v):
        return (jnp.sum(ctx.grad(u) * ctx.grad(v))
                - 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val)

    U = spline.solve_nonlinear_variational_problem(res)
    err = spline.errornorm(U, lambda ctx: soln(ctx.x), rationalize=False)
    assert float(err) < 2e-3


def test_poisson_graded_nonuniform_knots():
    """Geometrically graded (non-uniform) knot vectors: exercises
    element-size weighting in tabulation/quadrature; the solution on a
    boundary-layer-like problem still converges."""
    import numpy as np

    def graded_knots(p, nel, ratio=3.0):
        # element sizes in geometric progression
        sizes = ratio ** np.linspace(0.0, 1.0, nel)
        breaks = np.concatenate([[0.0], np.cumsum(sizes)])
        breaks /= breaks[-1]
        return np.concatenate([np.zeros(p), breaks, np.ones(p)])

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def a(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    p = 2
    errs = []
    for nel in (8, 16, 32):
        kv = graded_knots(p, nel)
        cm = ExplicitBSplineControlMesh([p, p], [kv, kv])
        sp = EqualOrderSpline(1, cm)
        basis = sp.get_scalar_spline()
        for d in (0, 1):
            for s in (0, 1):
                sp.add_zero_dofs(0, basis.side_dofs(d, s))
        spline = ExtractedSpline(sp, quad_degree=2 * p)
        U = spline.solve_linear_variational_problem(a, rhs_form=L)
        errs.append(float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                           rationalize=False)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > p + 1 - 0.35, (errs, rates)


def test_sparse_assembled_matrix():
    """BCOO sparse assembly matches the dense matrix and solves Poisson
    through repeated sparse matvecs."""
    from tigar_tpu.solvers.linear import solve_krylov, jacobi_preconditioner
    p, nel = 2, 10
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline = ExtractedSpline(sp, quad_degree=2 * p)

    def a(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    A_dense = np.asarray(spline.assemble_matrix(a))
    M = spline.assemble_sparse(a)
    assert np.allclose(np.asarray(M.todense()), A_dense, atol=1e-12)

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    b = spline.assemble_vector(L)
    diag = spline.assemble_diagonal(a)
    U = solve_krylov(lambda w: M @ w, b, method="cg", tol=1e-12,
                     M=jacobi_preconditioner(diag))
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                 rationalize=False))
    assert err < 5e-4
