"""NURBS tests: exact rational geometry, knot insertion, and Poisson on
rational/distorted geometries -- mirrors demos/poisson/poisson-nurbs.py and
poisson-nonzero-bc.py, plus a genuinely-rational quarter-annulus case the
reference covers via igakit geometry.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tigar_tpu.ops.refine import insert_knot, uniform_refine
from tigar_tpu.models.nurbs import NURBSControlMesh, quarter_annulus_control
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.ops.knots import uniform_knots


def test_knot_insertion_preserves_curve():
    """Inserting knots must not change the NURBS curve."""
    p = 2
    knots = np.asarray([0.0, 0, 0, 1, 1, 1])
    s = 1 / np.sqrt(2)
    # quarter circle arc
    ctrl = np.asarray([[1.0, 0.0, 1.0],
                       [s, s, s],
                       [0.0, 1.0, 1.0]])
    k2, c2 = insert_knot(p, knots, ctrl, 0.5)
    k3, c3 = insert_knot(p, k2, c2, 0.25)

    from tigar_tpu.ops.knots import KnotVector
    from tigar_tpu.ops.basis import eval_basis

    def eval_curve(knots_, ctrl_, u):
        kv = KnotVector(p, knots_)
        nodes, ders = eval_basis(kv, u, 0)
        num = np.einsum("na,nac->nc", ders[:, 0, :], ctrl_[nodes])
        return num[:, :2] / num[:, 2:3]

    u = np.linspace(0, 1, 17)
    x0 = eval_curve(knots, ctrl, u)
    x1 = eval_curve(k3, c3, u)
    assert np.allclose(x0, x1, atol=1e-13)
    # and the curve is exactly the unit circle
    assert np.allclose(np.linalg.norm(x0, axis=1), 1.0, atol=1e-13)


def make_annulus_spline(levels, quad_deg=6, nders=1):
    degrees, kvecs, ctrl = quarter_annulus_control()
    kvecs, ctrl = uniform_refine(degrees, kvecs, ctrl, levels=levels)
    cm = NURBSControlMesh(degrees, kvecs, ctrl)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    return sp, ExtractedSpline(sp, quad_degree=quad_deg, nders=nders)


def test_annulus_geometry_exact():
    """The rational map must represent the quarter annulus exactly:
    area and all physical quadrature-point radii."""
    _, spline = make_annulus_spline(levels=1)
    area = float(spline.assemble_functional(lambda ctx: 1.0))
    assert np.isclose(area, 0.75 * np.pi, rtol=1e-10)
    geom = spline.geometry
    r = np.linalg.norm(np.asarray(geom.x), axis=-1)
    assert np.all(r > 1.0 - 1e-12) and np.all(r < 2.0 + 1e-12)


def test_poisson_on_quarter_annulus_rational():
    """Poisson with rationalized trial/test functions on exactly-curved
    geometry; optimal rate p+1 = 3 (reference analog:
    poisson-nurbs.py:121-138, rationalize() :121-124)."""

    def soln(x):
        r2 = x[0] ** 2 + x[1] ** 2
        return (r2 - 1.0) * (r2 - 4.0) * x[0] * x[1]

    def f(x):
        return -jnp.trace(jax.hessian(soln)(x))

    errs = []
    for levels in (1, 2, 3):
        _, spline = make_annulus_spline(levels)

        def a(ctx, u, v):
            uu = ctx.rationalize(u)
            vv = ctx.rationalize(v)
            return jnp.sum(ctx.grad(uu) * ctx.grad(vv))

        def L(ctx, v):
            return f(ctx.x) * ctx.rationalize(v).val

        U = spline.solve_linear_variational_problem(a, rhs_form=L)
        errs.append(float(spline.errornorm(
            U, lambda ctx: soln(ctx.x), rationalize=True)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    assert errs[-1] < 5e-3  # solution amplitude is ~9 on this domain
    for r in rates:
        assert r > 3 - 0.35, f"suboptimal NURBS rate {r}: errs={errs}"


def test_poisson_distorted_square():
    """Poisson on the distorted bi-unit square of poisson-nurbs.py:32-40
    (polynomial B-spline geometry with interior distortion, weight = 1)."""
    degrees = [2, 2]
    kvecs = [np.asarray([-1.0, -1, -1, 1, 1, 1])] * 2
    ctrl = np.zeros((3, 3, 3))
    pts = np.asarray([[[-1.0, -1.0], [0.0, -1.0], [1.0, -1.0]],
                      [[-1.0, 0.0], [0.7, 0.3], [1.0, 0.0]],
                      [[-1.0, 1.0], [0.0, 1.0], [1.0, 1.0]]])
    ctrl[:, :, :2] = pts
    ctrl[:, :, 2] = 1.0

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    errs = []
    for levels in (3, 4, 5):
        kv, c = uniform_refine(degrees, kvecs, ctrl, levels=levels)
        cm = NURBSControlMesh(degrees, kv, c)
        sp = EqualOrderSpline(1, cm)
        basis = sp.get_scalar_spline()
        for d in (0, 1):
            for s in (0, 1):
                sp.add_zero_dofs(0, basis.side_dofs(d, s))
        spline = ExtractedSpline(sp, quad_degree=4)

        def a(ctx, u, v):
            uu = ctx.rationalize(u)
            vv = ctx.rationalize(v)
            return jnp.sum(ctx.grad(uu) * ctx.grad(vv))

        def L(ctx, v):
            return 2.0 * jnp.pi ** 2 * soln(ctx.x) * ctx.rationalize(v).val

        U = spline.solve_linear_variational_problem(a, rhs_form=L)
        errs.append(float(spline.errornorm(
            U, lambda ctx: soln(ctx.x), rationalize=True)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > 3 - 0.35, f"suboptimal rate {r}: errs={errs}"


def test_poisson_nonzero_bc():
    """Inhomogeneous Dirichlet BCs via project-then-Newton (reference:
    poisson-nonzero-bc.py:79-105)."""
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
        return jnp.cos(jnp.pi * x[0]) * jnp.cos(jnp.pi * x[1])

    # initial guess: L2 projection of the exact solution (satisfies the BC)
    U0 = spline.project(lambda ctx: soln(ctx.x), rationalize=False)

    def res(ctx, u, v):
        return (jnp.sum(ctx.grad(u) * ctx.grad(v))
                - 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val)

    U = spline.solve_nonlinear_variational_problem(res, U0=U0)
    err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                 rationalize=False))
    assert err < 5e-5

    # lumped-mass projection path (poisson-nonzero-bc.py:91-92)
    U0l = spline.project(lambda ctx: soln(ctx.x), rationalize=False,
                         lump_mass=True)
    Ul = spline.solve_nonlinear_variational_problem(res, U0=U0l)
    errl = float(spline.errornorm(Ul, lambda ctx: soln(ctx.x),
                                  rationalize=False))
    # lumped projection of the boundary data is only 2nd-order accurate
    # (poisson-nonzero-bc.py:89-90), so expect ~h^2 here
    assert errl < 2e-2


def test_trivariate_nurbs_volume():
    """Exact trivariate rational geometry: a quarter-annulus extruded in z
    (degrees [2,2,1]); volume = 3*pi/4 * H to near machine precision."""
    from tigar_tpu.models.nurbs import quarter_annulus_control

    degrees2, kvecs2, ctrl2 = quarter_annulus_control()
    H = 0.7
    degrees = degrees2 + [1]
    kvecs = kvecs2 + [np.asarray([0.0, 0.0, 1.0, 1.0])]
    # extrude: homogeneous (wx, wy, wz, w) with z in {0, H}
    ctrl = np.zeros((3, 3, 2, 4))
    for k, z in enumerate([0.0, H]):
        ctrl[:, :, k, 0] = ctrl2[:, :, 0]
        ctrl[:, :, k, 1] = ctrl2[:, :, 1]
        ctrl[:, :, k, 2] = z * ctrl2[:, :, 2]   # w*z
        ctrl[:, :, k, 3] = ctrl2[:, :, 2]       # w
    cm = NURBSControlMesh(degrees, kvecs, ctrl)
    assert cm.nsd == 3
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=12)
    vol = float(spline.assemble_functional(lambda ctx: 1.0))
    assert np.isclose(vol, 0.75 * np.pi * H, rtol=1e-9)


def test_rational_hessian_chain_on_curved_geometry():
    """Linear polynomials are exactly representable in the isoparametric
    rational space; after L2 projection, the rationalized jet's physical
    gradient must be the exact constant and its physical Hessian exactly
    zero at every quadrature point -- validating the full rational
    quotient rule + second-derivative chain rule through d2F."""
    import jax as _jax
    degrees, kvecs, ctrl = quarter_annulus_control()
    kvecs, ctrl = uniform_refine(degrees, kvecs, ctrl, levels=1)
    cm = NURBSControlMesh(degrees, kvecs, ctrl)
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=8, nders=2)

    def f(x):
        return 3.0 * x[0] - 2.0 * x[1] + 0.5

    U = spline.project(lambda ctx: f(ctx.x), rationalize=True)
    asm = spline._assembler("dx")
    uj = asm.jets(U)

    def check(ctx, u):
        uu = ctx.rationalize(u)
        g = ctx.grad(uu)
        H = ctx.hess(uu)
        lap = ctx.lap(uu)
        return (jnp.max(jnp.abs(g - jnp.asarray([3.0, -2.0]))),
                jnp.max(jnp.abs(H)), jnp.abs(lap))

    eg, eh, el = _jax.vmap(_jax.vmap(check))(asm.ctx, uj)
    assert float(jnp.max(eg)) < 1e-10
    assert float(jnp.max(eh)) < 1e-8
    assert float(jnp.max(el)) < 1e-8
