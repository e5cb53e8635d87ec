"""Unit tests for the spline core: knot vectors, Cox-de Boor values and
derivatives, Greville points, tabulation identities.

The reference has no unit tests (SURVEY.md section 4); these verify against
closed forms and finite differences.
"""

import numpy as np
import pytest

from tigar_tpu.ops.knots import KnotVector, uniform_knots, ij2dof, dof2ij
from tigar_tpu.ops.basis import bspline_basis_ders, eval_basis, \
    bernstein_basis_ders
from tigar_tpu.ops.quadrature import gauss_rule, npoints_for_degree
from tigar_tpu.models.bspline import TensorBSplineBasis, \
    ExplicitBSplineControlMesh


def test_uniform_knots_open():
    k = uniform_knots(3, 0.0, 1.0, 4)
    assert len(k) == 4 + 4 + 3  # (p+1)*2 + (N-1) interior
    assert np.allclose(k[:4], 0.0) and np.allclose(k[-4:], 1.0)
    assert np.allclose(k[4:7], [0.25, 0.5, 0.75])


def test_uniform_knots_periodic():
    k = uniform_knots(2, 0.0, 1.0, 5, periodic=True)
    assert len(k) == 6
    kv = KnotVector(2, k)
    assert kv.is_periodic
    assert kv.ncp == 5  # len(knots) - mult[0] = 6 - 1
    assert kv.nel == 5


def test_uniform_knots_continuity_drop():
    k = uniform_knots(3, 0.0, 1.0, 2, continuity_drop=1)
    kv = KnotVector(3, k)
    assert kv.nel == 2
    assert int(kv.multiplicities[1]) == 2


def test_knotvector_basic():
    kv = KnotVector(3, uniform_knots(3, 0.0, 1.0, 10))
    assert kv.ncp == 13  # N + p
    assert kv.nel == 10
    assert not kv.is_periodic
    assert not kv.is_discontinuous()
    spans = kv.element_spans()
    assert spans[0] == 3 and spans[-1] == 12
    nodes = kv.element_nodes()
    assert nodes.shape == (10, 4)
    assert list(nodes[0]) == [0, 1, 2, 3]
    assert list(nodes[-1]) == [9, 10, 11, 12]


def test_greville_open():
    p, nel = 3, 4
    kv = KnotVector(p, uniform_knots(p, 0.0, 1.0, nel))
    g = kv.greville()
    assert np.isclose(g[0], 0.0) and np.isclose(g[-1], 1.0)
    assert np.all(np.diff(g) > 0)
    # interior Greville = mean of p consecutive knots
    assert np.isclose(g[1], np.mean(kv.knots[2:2 + p]))


def test_partition_of_unity_and_derivative_sums():
    """Sum of basis values == 1; sums of derivatives == 0."""
    for p in [1, 2, 3, 4]:
        kv = KnotVector(p, uniform_knots(p, 0.0, 2.0, 7))
        u = np.linspace(0.0, 2.0, 53)
        _, ders = eval_basis(kv, u, nders=min(2, p))
        assert np.allclose(ders[:, 0, :].sum(axis=1), 1.0, atol=1e-13)
        for k in range(1, min(2, p) + 1):
            assert np.allclose(ders[:, k, :].sum(axis=1), 0.0, atol=1e-10)


def test_linear_basis_closed_form():
    kv = KnotVector(1, uniform_knots(1, 0.0, 1.0, 2))
    nodes, ders = eval_basis(kv, np.asarray([0.25]), nders=1)
    # at u=0.25 in element 0: N0 = 0.5, N1 = 0.5 (hat functions, h=0.5)
    assert np.allclose(ders[0, 0], [0.5, 0.5])
    assert np.allclose(ders[0, 1], [-2.0, 2.0])


def test_quadratic_basis_closed_form():
    # single-element Bernstein case: open knots, p=2 on (0,1)
    kv = KnotVector(2, [0, 0, 0, 1, 1, 1])
    u = np.asarray([0.3])
    _, ders = eval_basis(kv, u, nders=2)
    t = 0.3
    B = [(1 - t) ** 2, 2 * t * (1 - t), t ** 2]
    dB = [-2 * (1 - t), 2 - 4 * t, 2 * t]
    d2B = [2.0, -4.0, 2.0]
    assert np.allclose(ders[0, 0], B)
    assert np.allclose(ders[0, 1], dB)
    assert np.allclose(ders[0, 2], d2B)


def test_derivatives_vs_finite_differences():
    p = 3
    kv = KnotVector(p, uniform_knots(p, 0.0, 1.0, 6))
    u = np.asarray([0.37, 0.62, 0.05, 0.98])
    h = 1e-6
    _, d0 = eval_basis(kv, u, nders=2)
    _, dp = eval_basis(kv, u + h, nders=1)
    _, dm = eval_basis(kv, u - h, nders=1)
    fd1 = (dp[:, 0] - dm[:, 0]) / (2 * h)
    fd2 = (dp[:, 1] - dm[:, 1]) / (2 * h)
    assert np.allclose(d0[:, 1], fd1, atol=1e-6)
    assert np.allclose(d0[:, 2], fd2, atol=1e-4)


def test_periodic_basis_partition_of_unity():
    p = 2
    kv = KnotVector(p, uniform_knots(p, 0.0, 1.0, 8, periodic=True))
    u = np.linspace(0.05, 0.95, 31)
    nodes, ders = eval_basis(kv, u, nders=1)
    assert np.all(nodes < kv.ncp)
    assert np.allclose(ders[:, 0, :].sum(axis=1), 1.0, atol=1e-13)


def test_bernstein_matches_closed_form():
    ders = bernstein_basis_ders(3, np.asarray([0.2]), 1, interval=(-1, 1))
    t = (0.2 + 1) / 2.0
    B = [(1 - t) ** 3, 3 * t * (1 - t) ** 2, 3 * t ** 2 * (1 - t), t ** 3]
    assert np.allclose(ders[0, 0], B)


def test_gauss_rules():
    for n in range(1, 8):
        pts, wts = gauss_rule(n)
        # integrates x^k exactly for k <= 2n-1
        for k in range(0, 2 * n):
            exact = (1 - (-1) ** (k + 1)) / (k + 1)
            assert np.isclose(np.sum(wts * pts ** k), exact, atol=1e-13)
    assert npoints_for_degree(6) == 4
    assert npoints_for_degree(2 * 3) == 4


def test_tabulation_2d_identities():
    p, q = 3, 2
    basis = TensorBSplineBasis([p, q], [uniform_knots(p, 0.0, 1.0, 4),
                                        uniform_knots(q, 0.0, 2.0, 3)])
    tab = basis.tabulate(3, nders=2)
    assert tab.conn.shape == (12, 12)  # nel=4*3, nen=4*3
    assert tab.ncp == basis.ncp
    # partition of unity + zero derivative sums at all quad points
    assert np.allclose(tab.N.sum(axis=2), 1.0, atol=1e-12)
    assert np.allclose(tab.dN.sum(axis=2), 0.0, atol=1e-10)
    assert np.allclose(tab.d2N.sum(axis=2), 0.0, atol=1e-8)
    # quadrature weights sum to parametric area
    assert np.isclose(tab.qw.sum(), 2.0, atol=1e-12)
    # Hessian symmetric
    assert np.allclose(tab.d2N, np.transpose(tab.d2N, (0, 1, 2, 4, 3)))


def test_tabulation_reproduces_polynomials():
    """Interpolate x^2*y and verify values/gradients/Hessians at quad points
    via Greville fit (degree >= 2 reproduces quadratics)."""
    p = 2
    basis = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, 5),
                                        uniform_knots(p, 0.0, 1.0, 4)])
    tab = basis.tabulate(4, nders=2)
    # Build coefficients by solving global interpolation at Greville points
    gp = basis.greville_points()
    # assemble full collocation matrix from tabulation of greville pts:
    # simpler: least-squares using quadrature points
    f = lambda x, y: x ** 2 * y + 3.0 * x - y
    A = np.zeros((tab.nel * tab.nq, basis.ncp))
    rows = np.repeat(np.arange(tab.nel * tab.nq), tab.nen)
    cols = np.broadcast_to(tab.conn[:, None, :],
                           (tab.nel, tab.nq, tab.nen)).reshape(-1)
    A[rows, cols.reshape(-1)] = tab.N.reshape(-1)
    rhs = f(tab.qp[..., 0], tab.qp[..., 1]).reshape(-1)
    coef, *_ = np.linalg.lstsq(A, rhs, rcond=None)
    # evaluate at quad points from tabulation
    ce = coef[tab.conn]  # [nel, nen]
    vals = np.einsum("eqa,ea->eq", tab.N, ce)
    grads = np.einsum("eqad,ea->eqd", tab.dN, ce)
    hess = np.einsum("eqadc,ea->eqdc", tab.d2N, ce)
    x, y = tab.qp[..., 0], tab.qp[..., 1]
    assert np.allclose(vals, f(x, y), atol=1e-9)
    assert np.allclose(grads[..., 0], 2 * x * y + 3.0, atol=1e-8)
    assert np.allclose(grads[..., 1], x ** 2 - 1.0, atol=1e-8)
    assert np.allclose(hess[..., 0, 0], 2 * y, atol=1e-7)
    assert np.allclose(hess[..., 0, 1], 2 * x, atol=1e-7)
    assert np.allclose(hess[..., 1, 1], 0.0, atol=1e-7)


def test_boundary_tabulation():
    p = 2
    basis = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, 3),
                                        uniform_knots(p, 0.0, 1.0, 5)])
    tab = basis.tabulate_boundary(3, 1, direction=0, side=1)
    assert tab.normal is not None and tab.normal[0] == 1.0
    # all quad points on xi_0 = 1
    assert np.allclose(tab.qp[..., 0], 1.0)
    # facet measure = length of eta-interval
    assert np.isclose(tab.qw.sum(), 1.0)
    assert np.allclose(tab.N.sum(axis=2), 1.0, atol=1e-12)


def test_side_dofs():
    p = 2
    basis = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, 3),
                                        uniform_knots(p, 0.0, 1.0, 3)])
    M = basis.ncp_per_dir[0]
    d0 = basis.side_dofs(0, 0)
    assert set(d0.tolist()) == {ij2dof(0, j, M) for j in range(M)}
    d1 = basis.side_dofs(1, 1, n_layers=2)
    N = basis.ncp_per_dir[1]
    expect = {ij2dof(i, N - 1, M) for i in range(M)} | \
             {ij2dof(i, N - 2, M) for i in range(M)}
    assert set(d1.tolist()) == expect


def test_explicit_control_mesh():
    cm = ExplicitBSplineControlMesh([2, 2], [uniform_knots(2, 0.0, 1.0, 3),
                                             uniform_knots(2, 0.0, 2.0, 3)])
    B = cm.homogeneous_points()
    assert B.shape == (25, 3)
    assert np.allclose(B[:, -1], 1.0)
    assert np.isclose(B[0, 0], 0.0) and np.isclose(B[-1, 1], 2.0)
    # extra dim embedding
    cm3 = ExplicitBSplineControlMesh([2], [uniform_knots(2, 0.0, 1.0, 3)],
                                     extra_dim=1)
    assert cm3.nsd == 2
    B3 = cm3.homogeneous_points()
    assert B3.shape[1] == 3
    assert np.allclose(B3[:, 1], 0.0)
