"""Sum-factorized operator tests: the factorized stiffness/mass apply must
match the generic AD tangent action to machine precision on rational 2D and
explicit 3D geometries, and a CG solve through it must reproduce the
Poisson solution."""

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.ops.refine import uniform_refine
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.nurbs import NURBSControlMesh, quarter_annulus_control
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.ops.sumfac import make_sumfac_operator
from tigar_tpu.solvers.linear import solve_krylov, jacobi_preconditioner


def a_form(ctx, u, v):
    return jnp.sum(ctx.grad(u) * ctx.grad(v))


def m_form(ctx, u, v):
    return u.val * v.val


def _check_operator(spline, ck, cm):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=spline.ndof))
    U0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
    ref = (ck * spline.tangent_action(a_form, U0, W)
           + cm * spline.tangent_action(m_form, U0, W)
           - (ck + cm - 1.0) * (1.0 - spline.mask) * W)
    op = make_sumfac_operator(spline, ck=ck, cm=cm)
    got = op(W)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-12, rel


def test_sumfac_2d_rational():
    degrees, kvecs, ctrl = quarter_annulus_control()
    kvecs, ctrl = uniform_refine(degrees, kvecs, ctrl, levels=2)
    cm_ = NURBSControlMesh(degrees, kvecs, ctrl)
    sp = EqualOrderSpline(1, cm_)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        sp.add_zero_dofs(0, basis.side_dofs(d, 0))
    spline = ExtractedSpline(sp, quad_degree=6)
    _check_operator(spline, 1.0, 0.0)
    _check_operator(spline, 0.0, 1.0)
    _check_operator(spline, 2.0, 0.5)  # Helmholtz-type combination


def test_sumfac_3d():
    p = 2
    cm_ = ExplicitBSplineControlMesh(
        [p, p, p], [uniform_knots(p, 0.0, 1.0, 4)] * 3)
    sp = EqualOrderSpline(1, cm_)
    basis = sp.get_scalar_spline()
    for d in range(3):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline = ExtractedSpline(sp, quad_degree=2 * p)
    _check_operator(spline, 1.0, 0.0)
    _check_operator(spline, 1.0, 3.0)


def test_sumfac_poisson_solve():
    p, nel = 3, 16
    cm_ = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm_)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline = ExtractedSpline(sp, quad_degree=2 * p)

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    b = spline.assemble_vector(L)
    op = make_sumfac_operator(spline, ck=1.0)
    diag = spline.assemble_diagonal(a_form)
    U = solve_krylov(op, b, method="cg", tol=1e-13,
                     M=jacobi_preconditioner(diag))
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                 rationalize=False))
    assert err < 2e-6


def test_sumfac_identity_geometry():
    """Identity-geometry construction (no ExtractedSpline, no per-point
    geometry storage) matches the general path."""
    from tigar_tpu.models.bspline import TensorBSplineBasis
    from tigar_tpu.ops.sumfac import make_sumfac_identity_operator
    p, nel = 2, 5
    cm_ = ExplicitBSplineControlMesh(
        [p, p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 3)
    sp = EqualOrderSpline(1, cm_)
    spline = ExtractedSpline(sp, quad_degree=2 * p)
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.normal(size=spline.ndof))
    ref = make_sumfac_operator(spline, ck=1.0, cm=0.7, apply_bcs=False)(W)
    got = make_sumfac_identity_operator(cm_.scalar_basis(), 2 * p,
                                        ck=1.0, cm=0.7)(W)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-13, rel


def test_sumfac_gather_fallback_continuity_drop():
    """Knot vectors with interior multiplicity > 1 break stride-1 windows;
    the gather path must be selected and agree with the AD action."""
    from tigar_tpu.ops.sumfac import build_sumfac_data
    p, nel = 2, 6
    kv = uniform_knots(p, 0.0, 1.0, nel, continuity_drop=1)
    cm_ = ExplicitBSplineControlMesh([p, p], [kv, kv])
    sp = EqualOrderSpline(1, cm_)
    spline = ExtractedSpline(sp, quad_degree=2 * p)
    data = build_sumfac_data(sp.fields[0], spline.geometry,
                             spline.quad_degree)
    assert not data["sliding"]
    _check_operator(spline, 1.0, 0.5)


def test_sumfac_sliding_selected():
    from tigar_tpu.ops.sumfac import build_sumfac_data
    p, nel = 2, 5
    cm_ = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm_)
    spline = ExtractedSpline(sp, quad_degree=2 * p)
    data = build_sumfac_data(sp.fields[0], spline.geometry,
                             spline.quad_degree)
    assert data["sliding"]


def test_sumfac_rhs_and_error_match_generic():
    """Matrix-free RHS assembly and L2 error via sliding chains agree with
    the generic AD assembler (identity geometry)."""
    from tigar_tpu.ops.sumfac import sumfac_linear_form, sumfac_l2_error
    p, nel = 2, 6
    cm_ = ExplicitBSplineControlMesh(
        [p, p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 3)
    sp = EqualOrderSpline(1, cm_)
    spline = ExtractedSpline(sp, quad_degree=2 * p)

    def f3(x, y, z):
        return jnp.sin(jnp.pi * x) * jnp.cos(y) * (1.0 + z ** 2)

    b_ref = spline.assemble_vector(
        lambda ctx, v: f3(ctx.x[0], ctx.x[1], ctx.x[2]) * v.val,
        apply_bcs=False)
    b = sumfac_linear_form(cm_.scalar_basis(), 2 * p, f3)
    assert np.allclose(np.asarray(b), np.asarray(b_ref), atol=1e-13)

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 0.1)
    e_ref = float(spline.errornorm(
        U, lambda ctx: f3(ctx.x[0], ctx.x[1], ctx.x[2]),
        rationalize=False))
    e = float(sumfac_l2_error(cm_.scalar_basis(), 2 * p, U, f3))
    assert np.isclose(e, e_ref, rtol=1e-12)


# -- periodic (wrapped-window) sum factorization ------------------------------


def _periodic_space(pdirs, p, nel):
    """Identity control mesh with a (per-direction) periodic unknown field
    on the same Bezier grid (the TG-3D space family,
    compatibleSplines.py:42-64)."""
    from tigar_tpu.models.bspline import TensorBSplineBasis
    from tigar_tpu.models.space import FieldListSpline
    dim = len(pdirs)
    cm_ = ExplicitBSplineControlMesh(
        [p] * dim, [uniform_knots(p, 0.0, 1.0, nel)] * dim)
    field = TensorBSplineBasis(
        [p] * dim, [uniform_knots(p, 0.0, 1.0, nel, periodic=per)
                    for per in pdirs])
    return ExtractedSpline(FieldListSpline(cm_, [field]),
                           quad_degree=2 * p)


def test_sumfac_periodic_sliding():
    """Fully periodic 2D: sliding path selected (circular pad/fold) and
    matching the generic AD action on the wrapped space."""
    from tigar_tpu.ops.sumfac import build_sumfac_data
    spline = _periodic_space((True, True), 2, 6)
    data = build_sumfac_data(spline.space.fields[0], spline.geometry,
                             spline.quad_degree)
    assert data["sliding"] and all(data["periodic"])
    _check_operator(spline, 1.0, 0.7)


def test_sumfac_periodic_mixed_open():
    """Periodic x open mixed directions through the sliding chains."""
    spline = _periodic_space((True, False), 3, 5)
    _check_operator(spline, 0.6, 1.0)


def test_sumfac_periodic_gather():
    """Periodic with interior multiplicity (continuity drop): stride-1
    windows break, the gather path must wrap indices mod ncp."""
    from tigar_tpu.models.bspline import TensorBSplineBasis
    from tigar_tpu.models.space import FieldListSpline
    from tigar_tpu.ops.sumfac import build_sumfac_data
    p, nel = 2, 6
    cm_ = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    field = TensorBSplineBasis(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel, periodic=True,
                               continuity_drop=1),
                 uniform_knots(p, 0.0, 1.0, nel, periodic=True)])
    spline = ExtractedSpline(FieldListSpline(cm_, [field]),
                             quad_degree=2 * p)
    data = build_sumfac_data(spline.space.fields[0], spline.geometry,
                             spline.quad_degree)
    assert not data["sliding"]
    _check_operator(spline, 1.0, 0.5)


def test_sumfac_periodic_3d_identity():
    """Fully periodic 3D identity-geometry operator (no ExtractedSpline)
    against the general path on the wrapped space."""
    from tigar_tpu.models.bspline import TensorBSplineBasis
    from tigar_tpu.ops.sumfac import make_sumfac_identity_operator
    p, nel = 2, 4
    spline = _periodic_space((True, True, True), p, nel)
    basis = spline.space.fields[0]
    rng = np.random.default_rng(5)
    W = jnp.asarray(rng.normal(size=spline.ndof))
    ref = make_sumfac_operator(spline, ck=1.0, cm=0.7, apply_bcs=False)(W)
    got = make_sumfac_identity_operator(basis, 2 * p, ck=1.0, cm=0.7)(W)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-13, rel
