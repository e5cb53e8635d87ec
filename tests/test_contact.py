"""Contact tests: AD forces match the reference's closed-form pair force
(reef-knot.py (24)), exclusion masks behave, and a membrane-vs-membrane
static contact solve separates to the penalty range.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.contact import PointContact
from tigar_tpu.models.shell import svk_psi_surface
from tigar_tpu.forms import deriv


def flat_strip(nel=4, p=2, z0=0.0):
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    return cm, sp


def test_contact_force_matches_closed_form():
    cm, sp = flat_strip()
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    k, r_max, r_self = 1.0e4, 0.3, 0.05
    contact = PointContact(spline, k=k, r_max=r_max, r_self=r_self)

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 0.01)

    # AD residual == finite-difference gradient of the energy
    r = contact.residual(U)
    v = jnp.asarray(rng.normal(size=spline.ndof))
    h = 1e-6
    fd = (contact.energy(U + h * v) - contact.energy(U - h * v)) / (2 * h)
    assert np.isclose(float(jnp.dot(r, v)), float(fd), rtol=1e-6)

    # closed-form check on a single interacting pair: pick two collocation
    # points, verify dE/dx matches C * phi'(r) * rhat
    x = np.asarray(contact.positions(U))
    Cw = np.asarray(contact.quad_w)
    M = np.asarray(contact.pair_mask)
    # find one admissible interacting pair
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    ii, jj = np.where((M > 0) & (d < r_max) & (d > 1e-6))
    assert len(ii) > 0, "no interacting pairs in test configuration"
    i, j = int(ii[0]), int(jj[0])

    # direct: differentiate energy wrt positions
    def E_of_x(xx):
        diff = xx[:, None, :] - xx[None, :, :]
        r2 = jnp.sum(diff * diff, axis=-1)
        safe = jnp.where(contact.pair_mask > 0, r2, 1.0 + r_max ** 2)
        rr = jnp.sqrt(safe)
        C = contact.quad_w[:, None] * contact.quad_w[None, :]
        return 0.5 * jnp.sum(contact.pair_mask * C * contact.phi(rr))

    fgrad = np.asarray(jax.grad(E_of_x)(jnp.asarray(x)))
    # reference formula (24): force on i from j is C phi'(r) rhat_{i->j},
    # gradient of energy is its negative summed over j
    rvec = x - x[i]
    rnorm = np.linalg.norm(rvec, axis=-1)
    expected = np.zeros(3)
    for jj2 in range(len(x)):
        if jj2 == i or M[i, jj2] == 0 or rnorm[jj2] >= r_max:
            continue
        rhat = rvec[jj2] / rnorm[jj2]
        phi_p = -k * (r_max - rnorm[jj2])
        # energy gradient = -(force on i) = -sum_j C phi'(r) rhat_{i->j}
        expected -= Cw[i] * Cw[jj2] * phi_p * rhat
    assert np.allclose(fgrad[i], expected, rtol=1e-10)


def test_contact_inactive_when_far():
    cm, sp = flat_strip()
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    contact = PointContact(spline, k=1e4, r_max=0.01, r_self=0.02)
    U = jnp.zeros(spline.ndof, dtype=spline.dtype)
    assert float(contact.energy(U)) == 0.0
    assert float(jnp.max(jnp.abs(contact.residual(U)))) == 0.0


def test_membrane_contact_equilibrium():
    """Hand-rolled Newton loop combining shell elasticity with contact
    (the reference's manual loop, reef-knot.py:440-482): a pinned membrane
    pushed down by a dead load onto the z=0 barrier of its own contact
    offset -- here we instead push two regions together via r_self
    exclusion being inactive and verify Newton converges with the combined
    residual and the final state has no deep interpenetration."""
    p, nel = 2, 4
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    basis = cm.scalar_basis()
    for d in (0, 1):
        for s in (0, 1):
            dofs = basis.side_dofs(d, s, n_layers=1)
            for i in range(3):
                sp.add_zero_dofs(i, dofs)
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    spline.set_solver_options(max_iters=50, relative_tolerance=1e-6)

    E_mod, nu, h_th, q = 1e5, 0.3, 0.05, -2.0

    def res(ctx, u, v):
        dWint = deriv(lambda y: svk_psi_surface(ctx, y, E_mod, nu, h_th),
                      u, v)
        return dWint - q * v.val[2]

    contact = PointContact(spline, k=1e8, r_max=0.05, r_self=1e9)
    # r_self=1e9 disables ALL pair interactions -> pure elasticity baseline
    U_noc = spline.solve_nonlinear_variational_problem(res)
    assert float(contact.energy(U_noc)) == 0.0

    # now a combined manual Newton: elasticity + self-contact with a small
    # exclusion radius; solution should remain finite and converge
    contact2 = PointContact(spline, k=1e6, r_max=0.04, r_self=0.3)
    U = jnp.zeros(spline.ndof, dtype=spline.dtype)
    for it in range(50):
        r = spline.assemble_vector(res, U=U) + \
            spline.mask * contact2.residual(U)
        nrm = float(jnp.linalg.norm(r))
        if it == 0:
            n0 = nrm
        if nrm / n0 < 1e-6:
            break
        A = spline.assemble_matrix(res, U=U)
        # dense contact tangent via jacfwd of the (masked) contact residual
        Kc = jax.jacfwd(lambda uu: spline.mask * contact2.residual(uu))(U)
        dU = jnp.linalg.solve(A + Kc, r)
        U = U - dU
    else:
        raise AssertionError("combined Newton failed to converge")
    assert np.all(np.isfinite(np.asarray(U)))


def test_matrix_free_combined_newton_matches_dense():
    """The reef demo's production path: combined shell+contact Newton with
    the tangent applied only as an action (shell JVP + contact HVP) inside
    Jacobi-CG -- no dense ndof^2 object anywhere (reef-knot.py:440-482
    class, scalable to ~10^4 collocation points).  Must land on the same
    equilibrium as the dense direct solve."""
    from tigar_tpu.solvers.linear import cg_fixed_iters, \
        jacobi_preconditioner

    p, nel = 2, 5
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    basis = cm.scalar_basis()
    for d in (0, 1):
        for s in (0, 1):
            dofs = basis.side_dofs(d, s, n_layers=1)
            for i in range(3):
                sp.add_zero_dofs(i, dofs)
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    E_mod, nu, h_th, q = 1e5, 0.3, 0.05, -2.0

    def res(ctx, u, v):
        dWint = deriv(lambda y: svk_psi_surface(ctx, y, E_mod, nu, h_th),
                      u, v)
        return dWint - q * v.val[2]

    contact = PointContact(spline, k=1e6, r_max=0.04, r_self=0.3)
    mask = spline.mask

    def newton(solve_lin):
        U = jnp.zeros(spline.ndof, dtype=spline.dtype)
        n0 = None
        for _ in range(50):
            r = spline.assemble_vector(res, U=U) + mask * contact.residual(U)
            nrm = float(jnp.linalg.norm(r))
            n0 = nrm if n0 is None else n0
            if nrm / n0 < 1e-9:
                return U
            U = U - solve_lin(U, r)
        raise AssertionError("Newton failed to converge")

    def dense(U, r):
        A = spline.assemble_matrix(res, U=U)
        Kc = jax.jacfwd(lambda uu: mask * contact.residual(uu))(U)
        return jnp.linalg.solve(A + Kc, r)

    def matfree(U, r):
        def A_op(W):
            return (spline.tangent_action(res, U, W)
                    + mask * contact.tangent_action(U, mask * W))
        M = jacobi_preconditioner(spline.assemble_diagonal(res, U=U))
        dU, _ = cg_fixed_iters(A_op, r, 400, M=M)
        return dU

    U_dense = newton(dense)
    U_free = newton(matfree)
    scale = float(jnp.max(jnp.abs(U_dense)))
    assert scale > 0.0
    assert float(jnp.max(jnp.abs(U_dense - U_free))) < 1e-6 * scale


def test_row_chunked_contact_matches_unchunked():
    """Row-chunked (rematerialized) all-pairs contact must match the
    unchunked path exactly for energy, residual (grad), and tangent action
    (HVP) -- the memory-scaling knob for ~10^4 collocation points
    (reef-knot.py:157-269)."""
    from tigar_tpu.ops.knots import uniform_knots
    from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
    from tigar_tpu.models.space import EqualOrderSpline

    mesh = ExplicitBSplineControlMesh(
        [2, 2], [uniform_knots(2, 0.0, 1.0, 8)] * 2, extra_dim=1)
    sp = EqualOrderSpline(3, mesh)
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    # reference distances in (r_self, r_max) are active already at U=0
    c_full = PointContact(spline, k=1e5, r_max=0.18, r_self=0.1)
    c_chunk = PointContact(spline, k=1e5, r_max=0.18, r_self=0.1,
                           row_chunk=7)  # non-divisor of n=100
    rng = np.random.default_rng(5)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 0.05)
    W = jnp.asarray(rng.normal(size=spline.ndof))
    e1, e2 = float(c_full.energy(U)), float(c_chunk.energy(U))
    assert e1 > 0.0 and abs(e1 - e2) < 1e-12 * e1
    r1, r2 = c_full.residual(U), c_chunk.residual(U)
    assert float(jnp.max(jnp.abs(r1 - r2))) < 1e-12 * \
        float(jnp.max(jnp.abs(r1)))
    t1 = c_full.tangent_action(U, W)
    t2 = c_chunk.tangent_action(U, W)
    assert float(jnp.max(jnp.abs(t1 - t2))) < 1e-12 * \
        float(jnp.max(jnp.abs(t1)))
