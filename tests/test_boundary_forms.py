"""Boundary-integral (ds) form tests: surface Jacobians, mapped normals,
and a Poisson problem with a Neumann boundary term -- the reference's
spline.ds measure (tIGArMeasure with surfaceJacobian,
calculusUtils.py:71-80, common.py:931-939).
"""

import math

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.ops.refine import uniform_refine
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.nurbs import NURBSControlMesh, quarter_annulus_control
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def test_boundary_measure_lengths():
    """Perimeter of the quarter annulus via ds integrals: two straight
    radial sides (length 1) and two arcs (pi/2 and pi)."""
    degrees, kvecs, ctrl = quarter_annulus_control()
    kvecs, ctrl = uniform_refine(degrees, kvecs, ctrl, levels=2)
    cm = NURBSControlMesh(degrees, kvecs, ctrl)
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=10)

    one = lambda ctx: 1.0
    # radial sides: angular direction 0 at sides 0/1
    for side in (0, 1):
        L = float(spline.assemble_functional({("ds", 0, side): one}))
        assert np.isclose(L, 1.0, rtol=1e-10), (side, L)
    # inner arc (radius 1): radial direction 1, side 0
    L_in = float(spline.assemble_functional({("ds", 1, 0): one}))
    assert np.isclose(L_in, 0.5 * np.pi, rtol=1e-8)
    L_out = float(spline.assemble_functional({("ds", 1, 1): one}))
    assert np.isclose(L_out, np.pi, rtol=1e-8)


def test_boundary_normals():
    """Physical unit normals on the annulus arcs point radially."""
    degrees, kvecs, ctrl = quarter_annulus_control()
    kvecs, ctrl = uniform_refine(degrees, kvecs, ctrl, levels=1)
    cm = NURBSControlMesh(degrees, kvecs, ctrl)
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=8)
    asm = spline._assembler(("ds", 1, 1))  # outer arc
    x = np.asarray(asm.ctx.x)
    n = np.asarray(asm.ctx.normal)
    rhat = x / np.linalg.norm(x, axis=-1, keepdims=True)
    assert np.allclose(n, rhat, atol=1e-12)  # outward radial
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-13)


def test_poisson_with_neumann_term():
    """Manufactured Poisson with an inhomogeneous Neumann condition on the
    x=1 side entering as a ds form; optimal convergence."""
    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    # du/dn at x = 1 is pi*cos(pi)*sin(pi y) = -pi sin(pi y)
    def g_neumann(ctx):
        return -jnp.pi * jnp.sin(jnp.pi * ctx.x[1])

    p = 2
    errs = []
    for nel in (8, 16, 32):
        cm = ExplicitBSplineControlMesh(
            [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
        sp = EqualOrderSpline(1, cm)
        basis = sp.get_scalar_spline()
        # Dirichlet everywhere except the x=1 side
        sp.add_zero_dofs(0, basis.side_dofs(0, 0))
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(1, s))
        spline = ExtractedSpline(sp, quad_degree=2 * p)

        def a(ctx, u, v):
            return jnp.sum(ctx.grad(u) * ctx.grad(v))

        L = {
            "dx": lambda ctx, v: 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val,
            ("ds", 0, 1): lambda ctx, v: g_neumann(ctx) * v.val,
        }
        U = spline.solve_linear_variational_problem(a, rhs_form=L)
        errs.append(float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                           rationalize=False)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > p + 1 - 0.3, (errs, rates)
