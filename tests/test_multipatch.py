"""Multi-patch tests: DoF layout, concatenated-batch assembly, the legacy
ASCII reader (BSplines.py:967-1081), and a two-patch Poisson solve.

Note: control points are not merged between patches (matching the
reference's documented limitation, BSplines.py:656-659); the PDE test uses a
manufactured solution vanishing on the interface so both patches can be
constrained there.
"""

import math

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import TensorBSplineBasis
from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                         MultiPatchControlMesh,
                                         read_legacy_multipatch)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def two_patch_mesh(p, nel):
    """[0,1]x[0,1] split at x = 0.5 into two patches."""
    patches = [TensorBSplineBasis([p, p],
                                  [uniform_knots(p, 0.0, 1.0, nel)] * 2)
               for _ in range(2)]
    basis = MultiPatchBSplineBasis(patches)
    bnets = []
    for k in range(2):
        gp = patches[k].greville_points()  # local (0,1)^2 after normalize
        B = np.zeros((gp.shape[0], 3))
        B[:, 0] = 0.5 * gp[:, 0] + 0.5 * k
        B[:, 1] = gp[:, 1]
        B[:, 2] = 1.0
        bnets.append(B)
    return MultiPatchControlMesh(basis, bnets)


def test_multipatch_structure():
    cm = two_patch_mesh(2, 3)
    basis = cm.scalar_basis()
    assert basis.n_patches == 2
    assert basis.ncp == 2 * 25
    assert basis.nel == 18
    tab = basis.tabulate(3, 1)
    assert tab.conn.shape == (18, 9)
    # second patch's elements index into the offset DoF block
    assert tab.conn[9:].min() >= 25
    # partition of unity with masks applied
    N = tab.N * (tab.mask[:, None, :] if tab.mask is not None else 1.0)
    assert np.allclose(N.sum(axis=2), 1.0, atol=1e-12)
    # global side dofs per patch
    d = basis.patch_side_dofs(1, 0, 1)
    assert d.min() >= 25 and len(d) == 5


def test_multipatch_area():
    cm = two_patch_mesh(2, 3)
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=4)
    area = float(spline.assemble_functional(lambda ctx: 1.0))
    assert np.isclose(area, 1.0, atol=1e-12)


def test_two_patch_poisson():
    """Manufactured solution vanishing on the interface x=0.5; optimal
    convergence through the concatenated element batch."""

    def soln(x):
        return jnp.sin(2.0 * jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def a(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    def L(ctx, v):
        return 5.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    p = 2
    errs = []
    for nel in (4, 8, 16):
        cm = two_patch_mesh(p, nel)
        basis = cm.scalar_basis()
        sp = EqualOrderSpline(1, cm)
        for patch in (0, 1):
            for d in (0, 1):
                for s in (0, 1):
                    sp.add_zero_dofs_global(
                        basis.patch_side_dofs(patch, d, s))
        spline = ExtractedSpline(sp, quad_degree=2 * p)
        U = spline.solve_linear_variational_problem(a, rhs_form=L)
        errs.append(float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                                           rationalize=False)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > p + 1 - 0.3, (errs, rates)


def test_legacy_multipatch_reader(tmp_path):
    """Round-trip the Hughes-group ASCII format (quarter-annulus-like arc
    patches with genuine weights)."""
    s = 1.0 / math.sqrt(2.0)
    for i, x0 in enumerate([0.0, 2.0]):
        lines = ["2", "2 1", "3 2",
                 "0 0 0 1 1 1", "0 0 1 1"]
        # 3x2 control points, i fastest (angular), j radial; w last
        pts = []
        for j, r in enumerate([1.0, 2.0]):
            for (dx, dy, w) in [(1, 0, 1.0), (1, 1, s), (0, 1, 1.0)]:
                pts.append((x0 + r * dx, r * dy, w))
        for (x, y, w) in pts:
            lines.append(f"{x} {y} {w}")
        (tmp_path / f"patch.{i + 1}.dat").write_text("\n".join(lines) + "\n")

    cm = read_legacy_multipatch(str(tmp_path / "patch."), 2, ".dat")
    basis = cm.scalar_basis()
    assert basis.n_patches == 2
    assert basis.ncp == 12
    assert cm.nsd == 2
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=14)  # rational Jacobian: needs high quadrature for near-exact area
    area = float(spline.assemble_functional(lambda ctx: 1.0))
    # two exact quarter annuli (r in [1,2]): 2 * (3 pi / 4)
    assert np.isclose(area, 1.5 * np.pi, rtol=1e-10)


def test_two_patch_rational_poisson():
    """Multipatch + rational weights combined: two quarter-annulus NURBS
    patches forming a half annulus, manufactured solution vanishing on all
    patch boundaries (incl. the interface), optimal rate 3."""
    import jax
    import jax.numpy as jnp
    from tigar_tpu.models.nurbs import quarter_annulus_control
    from tigar_tpu.ops.refine import uniform_refine
    from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                             MultiPatchControlMesh)

    def soln(x):
        r2 = x[0] ** 2 + x[1] ** 2
        return (r2 - 1.0) * (r2 - 4.0) * x[0] * x[1]

    def f_rhs(x):
        return -jnp.trace(jax.hessian(soln)(x))

    errs = []
    for levels in (1, 2, 3):
        degrees, kvecs0, ctrl0 = quarter_annulus_control()
        kvecs, ctrl1 = uniform_refine(degrees, kvecs0, ctrl0, levels=levels)
        # second patch: rotate control net by 90 degrees, (x,y)->(-y,x)
        ctrl2 = ctrl1.copy()
        ctrl2[..., 0], ctrl2[..., 1] = -ctrl1[..., 1].copy(), \
            ctrl1[..., 0].copy()
        patches = [TensorBSplineBasis(degrees, [k.copy() for k in kvecs])
                   for _ in range(2)]
        basis = MultiPatchBSplineBasis(patches)
        cm = MultiPatchControlMesh(basis, [ctrl1, ctrl2])
        sp = EqualOrderSpline(1, cm)
        for patch in (0, 1):
            for d in (0, 1):
                for s in (0, 1):
                    sp.add_zero_dofs_global(
                        basis.patch_side_dofs(patch, d, s))
        spline = ExtractedSpline(sp, quad_degree=6)

        def a(ctx, u, v):
            uu, vv = ctx.rationalize(u), ctx.rationalize(v)
            return jnp.sum(ctx.grad(uu) * ctx.grad(vv))

        def L(ctx, v):
            return f_rhs(ctx.x) * ctx.rationalize(v).val

        # sanity: half-annulus area exact
        if levels == 1:
            area = float(spline.assemble_functional(lambda ctx: 1.0))
            assert np.isclose(area, 1.5 * np.pi, rtol=1e-4)  # Gauss on rational J

        U = spline.solve_linear_variational_problem(a, rhs_form=L)
        errs.append(float(spline.errornorm(U, lambda ctx: soln(ctx.x))))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > 3 - 0.4, (errs, rates)


def test_merged_multipatch_c0_coupling():
    """DoF merging across the patch interface (the reference's IPER TODO,
    BSplines.py:656-659): a manufactured solution NOT vanishing at the
    interface converges optimally on the C0-coupled half annulus."""
    import jax
    import jax.numpy as jnp
    from tigar_tpu.models.nurbs import quarter_annulus_control
    from tigar_tpu.ops.refine import uniform_refine
    from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                             merge_coincident_dofs,
                                             MergedControlMesh)

    def soln(x):
        r2 = x[0] ** 2 + x[1] ** 2
        return (r2 - 1.0) * (r2 - 4.0) * x[1]

    def f_rhs(x):
        return -jnp.trace(jax.hessian(soln)(x))

    errs = []
    for levels in (1, 2, 3):
        degrees, kvecs0, ctrl0 = quarter_annulus_control()
        kvecs, ctrl1 = uniform_refine(degrees, kvecs0, ctrl0, levels=levels)
        ctrl2 = ctrl1.copy()
        ctrl2[..., 0], ctrl2[..., 1] = -ctrl1[..., 1].copy(), \
            ctrl1[..., 0].copy()
        patches = [TensorBSplineBasis(degrees, [k.copy() for k in kvecs])
                   for _ in range(2)]
        mp = MultiPatchBSplineBasis(patches)
        merged, bnet = merge_coincident_dofs(mp, [ctrl1, ctrl2])
        assert merged.ncp < mp.ncp  # interface DoFs actually merged
        cm = MergedControlMesh(merged, bnet)
        sp = EqualOrderSpline(1, cm)
        # Dirichlet on the outer boundary only (NOT the interface):
        # radial sides of both patches + the two angular ends
        outer = [merged.map_dofs(mp.patch_side_dofs(p, 1, s))
                 for p in (0, 1) for s in (0, 1)]
        outer += [merged.map_dofs(mp.patch_side_dofs(0, 0, 0)),
                  merged.map_dofs(mp.patch_side_dofs(1, 0, 1))]
        for dofs in outer:
            sp.add_zero_dofs_global(dofs)
        spline = ExtractedSpline(sp, quad_degree=6)

        def a(ctx, u, v):
            uu, vv = ctx.rationalize(u), ctx.rationalize(v)
            return jnp.sum(ctx.grad(uu) * ctx.grad(vv))

        def L(ctx, v):
            return f_rhs(ctx.x) * ctx.rationalize(v).val

        U = spline.solve_linear_variational_problem(a, rhs_form=L)
        errs.append(float(spline.errornorm(U, lambda ctx: soln(ctx.x))))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    for r in rates:
        assert r > 3 - 0.4, (errs, rates)
