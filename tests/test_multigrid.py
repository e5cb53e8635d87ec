"""Geometric multigrid tests: exact knot-insertion transfers, V-cycle
preconditioned CG with h-independent iteration counts, and the "mg_cg"
linear-solver dispatch (the framework's answer to the reference's PETSc
preconditioner zoo, tIGAr/common.py:1236-1263)."""

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots, KnotVector
from tigar_tpu.models.bspline import (TensorBSplineBasis,
                                      ExplicitBSplineControlMesh)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.solvers.multigrid import (Multigrid, coarsen_knots,
                                         insertion_matrix_1d)


def test_insertion_matrix_reproduces_function():
    """Fine coefficients P @ coarse must represent the SAME spline
    function (knot insertion is exact)."""
    p = 3
    kc = KnotVector(p, uniform_knots(p, 0.0, 1.0, 4))
    kf = KnotVector(p, uniform_knots(p, 0.0, 1.0, 8))
    P = insertion_matrix_1d(kc, kf)
    assert P.shape == (kf.ncp, kc.ncp)
    rng = np.random.default_rng(0)
    cc = rng.normal(size=kc.ncp)
    cf = P @ cc
    xs = rng.uniform(0.0, 1.0, size=50)
    bc = TensorBSplineBasis([p], [kc.knots])
    bf = TensorBSplineBasis([p], [kf.knots])
    vc = bc.evaluate(cc, xs[:, None])
    vf = bf.evaluate(cf, xs[:, None])
    assert np.max(np.abs(vc - vf)) < 1e-13

    # partition of unity is preserved: rows of P sum to 1
    assert np.max(np.abs(P.sum(axis=1) - 1.0)) < 1e-13


def test_coarsen_knots_nested_nonuniform():
    """coarsen_knots of a graded vector stays nested (subset) and halves
    the element count."""
    p = 2
    interior = np.array([0.1, 0.3, 0.4, 0.7])
    knots = np.concatenate([[0.0] * (p + 1), interior, [1.0] * (p + 1)])
    kv = KnotVector(p, knots)
    ck = coarsen_knots(kv)
    kvc = KnotVector(p, ck)
    assert kvc.nel == 3  # 5 elements -> interior knots 0.3, 0.7 kept
    P = insertion_matrix_1d(kvc, kv)
    rng = np.random.default_rng(1)
    cc = rng.normal(size=kvc.ncp)
    bc = TensorBSplineBasis([p], [ck])
    bf = TensorBSplineBasis([p], [knots])
    xs = rng.uniform(0.0, 1.0, size=40)
    assert np.max(np.abs(bc.evaluate(cc, xs[:, None])
                         - bf.evaluate(P @ cc, xs[:, None]))) < 1e-13


def _poisson_spline(p, nel):
    mesh = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    gen = EqualOrderSpline(1, mesh)
    basis = gen.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            gen.add_zero_dofs(0, basis.side_dofs(d, s))
    return ExtractedSpline(gen, quad_degree=2 * p)


def _a(ctx, u, v):
    return jnp.sum(ctx.grad(u) * ctx.grad(v))


def _L(ctx, v):
    f = 2.0 * jnp.pi ** 2 * jnp.sin(jnp.pi * ctx.x[0]) \
        * jnp.sin(jnp.pi * ctx.x[1])
    return f * v.val


def _pcg_iters(action, b, M, tol=1e-10, maxiter=200):
    """Host-side preconditioned CG, counting iterations to ||r|| <= tol||b||."""
    x = jnp.zeros_like(b)
    r = b - action(x)
    z = M(r)
    pvec = z
    rz = float(jnp.vdot(r, z))
    b_norm = float(jnp.linalg.norm(b))
    for it in range(maxiter):
        if float(jnp.linalg.norm(r)) <= tol * b_norm:
            return x, it
        Ap = action(pvec)
        alpha = rz / float(jnp.vdot(pvec, Ap))
        x = x + alpha * pvec
        r = r - alpha * Ap
        z = M(r)
        rz_new = float(jnp.vdot(r, z))
        pvec = z + (rz_new / rz) * pvec
        rz = rz_new
    raise AssertionError("PCG did not converge")


def test_mg_cg_h_independent_iterations():
    """V(2,2)-preconditioned CG on 2D Poisson: iteration count small and
    h-independent (the point of multigrid; Jacobi-CG grows like 1/h)."""
    p = 2
    iters = {}
    for nel in (16, 32):
        levels = [_poisson_spline(p, n)
                  for n in (nel, nel // 2, nel // 4, nel // 8)]
        mg = Multigrid(levels, _a, n_smooth=2, omega=0.7)
        spline = levels[0]
        b = spline.assemble_vector(_L)
        action = spline.matrix_operator(_a)
        x, it = _pcg_iters(action, b, mg)
        iters[nel] = it
        # solution correct: compare to dense direct
        A = spline.assemble_matrix(_a)
        x_direct = jnp.linalg.solve(A, b)
        err = float(jnp.max(jnp.abs(x - x_direct)))
        assert err < 1e-8 * float(jnp.max(jnp.abs(x_direct)))
    assert iters[16] <= 15 and iters[32] <= 15
    assert iters[32] <= iters[16] + 2  # h-independence


def test_mg_cg_linear_solver_dispatch():
    """linear_solver='mg_cg' end-to-end through
    solve_linear_variational_problem matches the dense direct solve."""
    p = 3
    fine = _poisson_spline(p, 16)
    coarse = [_poisson_spline(p, 8), _poisson_spline(p, 4)]
    U_direct = fine.solve_linear_variational_problem(_a, rhs_form=_L)
    fine.set_solver_options(linear_solver="mg_cg", mg_levels=coarse,
                            linear_tol=1e-12)
    U_mg = fine.solve_linear_variational_problem(_a, rhs_form=_L)
    scale = float(jnp.max(jnp.abs(U_direct)))
    assert float(jnp.max(jnp.abs(U_mg - U_direct))) < 1e-8 * scale
