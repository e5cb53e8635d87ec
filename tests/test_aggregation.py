"""Algebraic two-level smoothed-aggregation preconditioning
(solvers/aggregation.py): the PC path for NON-tensor-product spaces --
T-splines with extraordinary points and C0-merged multipatch -- where
the geometric knot-insertion hierarchy of mg_cg does not exist
(reference analog: the PETSc PC zoo via the options database,
common.py:11-12,1255-1258)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import (ExplicitBSplineControlMesh,
                                      TensorBSplineBasis)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.tsplines import RhinoTSplineControlMesh
from tigar_tpu.solvers.aggregation import (grid_aggregates, TwoLevelSA,
                                           control_point_aggregates)


def _star_spline(tmp_path, nel, tag, n_sectors=3):
    from tigar_tpu.models.tsplines import (make_star_extraction,
                                           write_rhino_extraction)
    bnet, nodes_list, ops_list = make_star_extraction(n_sectors, nel)
    fname = str(tmp_path / f"star_sa_{tag}.iga")
    write_rhino_extraction(fname, bnet, nodes_list, ops_list)
    cm = RhinoTSplineControlMesh(fname)
    sp = EqualOrderSpline(1, cm)
    sp.add_zero_dofs(0, cm.scalar_basis().boundary_dofs(1))
    return ExtractedSpline(sp, quad_degree=6)


def _poisson_forms():
    def a(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    def L(ctx, v):
        return (1.0 + ctx.x[0] + jnp.sin(2.0 * ctx.x[1])) * v.val

    return a, L


def _pcg_iters(amv, b, M, tol=1e-8, maxiter=2000):
    """Host-driven PCG, returns iterations to |r| <= tol * |b|."""
    x = jnp.zeros_like(b)
    r = b
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    nb = float(jnp.linalg.norm(b))
    for k in range(1, maxiter + 1):
        Ap = amv(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        if float(jnp.linalg.norm(r)) <= tol * nb:
            return k
        z = M(r)
        rz_new = jnp.vdot(r, z)
        p = z + (rz_new / rz) * p
        rz = rz_new
    return maxiter + 1


def test_grid_aggregates_basic():
    pts = np.array([[0.0, 0.0], [0.1, 0.1], [2.0, 0.0], [2.1, 0.1],
                    [0.0, 2.0]])
    lbl = grid_aggregates(pts, 1.0)
    assert lbl[0] == lbl[1]
    assert lbl[2] == lbl[3]
    assert len({lbl[0], lbl[2], lbl[4]}) == 3


def test_sa_cg_star_tspline_matches_direct(tmp_path):
    """sa_cg on the valence-3 extraordinary-point T-spline reproduces the
    dense direct solution."""
    a, L = _poisson_forms()
    spline = _star_spline(tmp_path, nel=4, tag="m")
    U_dir = spline.solve_linear_variational_problem(a, rhs_form=L)
    spline.set_solver_options(linear_solver="sa_cg", linear_tol=1e-12,
                              linear_max_iter=400)
    U_sa = spline.solve_linear_variational_problem(a, rhs_form=L)
    err = float(jnp.max(jnp.abs(U_sa - U_dir))
                / jnp.max(jnp.abs(U_dir)))
    assert err < 1e-8, err


def test_sa_beats_jacobi_and_scales(tmp_path):
    """Two-level SA-preconditioned CG is h-INDEPENDENT on the star
    T-spline Poisson operator (fixed coarsening ratio + exact coarse
    solve) while Jacobi-CG degrades under refinement.  Measured (V(2,2),
    spectral-radius-normalized weights): SA 22/23/23 iterations at
    nel=4/8/16 vs Jacobi 41/50/63."""
    a, L = _poisson_forms()
    iters = {}
    for nel in (4, 8, 16):
        spline = _star_spline(tmp_path, nel, tag=f"s{nel}")
        pre, M_sp = TwoLevelSA.from_spline(spline, a)
        b = spline.assemble_vector(L)
        d = np.zeros(spline.ndof)
        idx = np.asarray(M_sp.indices)
        on = ((idx[:, 0] == idx[:, 1]) & (idx[:, 0] >= 0)
              & (idx[:, 0] < spline.ndof))  # padded sentinel entries
        np.add.at(d, idx[on, 0], np.asarray(M_sp.data)[on])
        dinv = jnp.asarray(1.0 / np.where(d != 0.0, d, 1.0))
        amv = lambda W: M_sp @ W
        iters[("jac", nel)] = _pcg_iters(amv, b, lambda r: dinv * r)
        iters[("sa", nel)] = _pcg_iters(amv, b, pre)
    for nel in (4, 8, 16):
        assert iters[("sa", nel)] < 0.65 * iters[("jac", nel)], iters
    # h-independence: SA counts flat under refinement, Jacobi growing
    sa = [iters[("sa", n)] for n in (4, 8, 16)]
    jac = [iters[("jac", n)] for n in (4, 8, 16)]
    assert max(sa) <= 1.25 * min(sa), iters
    assert jac[-1] >= 1.35 * jac[0], iters


def test_sa_cg_merged_multipatch(tmp_path):
    """sa_cg on a C0-merged two-patch rational space (half annulus)
    matches the direct solve -- ragged merged connectivity, rational
    weights."""
    import jax
    from tigar_tpu.models.nurbs import quarter_annulus_control
    from tigar_tpu.ops.refine import uniform_refine
    from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                             merge_coincident_dofs,
                                             MergedControlMesh)

    degrees, kvecs0, ctrl0 = quarter_annulus_control()
    kvecs, ctrl1 = uniform_refine(degrees, kvecs0, ctrl0, levels=2)
    ctrl2 = ctrl1.copy()
    ctrl2[..., 0], ctrl2[..., 1] = -ctrl1[..., 1].copy(), \
        ctrl1[..., 0].copy()
    patches = [TensorBSplineBasis(degrees, [k.copy() for k in kvecs])
               for _ in range(2)]
    mp = MultiPatchBSplineBasis(patches)
    merged, bnet = merge_coincident_dofs(mp, [ctrl1, ctrl2])
    cm = MergedControlMesh(merged, bnet)
    sp = EqualOrderSpline(1, cm)
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
        return ctx.x[1] * ctx.rationalize(v).val

    U_dir = spline.solve_linear_variational_problem(a, rhs_form=L)
    spline.set_solver_options(linear_solver="sa_cg", linear_tol=1e-12,
                              linear_max_iter=400)
    U_sa = spline.solve_linear_variational_problem(a, rhs_form=L)
    err = float(jnp.max(jnp.abs(U_sa - U_dir)) / jnp.max(jnp.abs(U_dir)))
    assert err < 1e-8, err


def test_control_point_aggregates_equal_order_only(tmp_path):
    """Field-list spaces are rejected (aggregation needs the shared
    control net)."""
    from tigar_tpu.models.space import FieldListSpline
    p, nel = 2, 4
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    b1 = TensorBSplineBasis([p, p],
                            [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    b2 = TensorBSplineBasis([p, p - 1],
                            [uniform_knots(p, 0.0, 1.0, nel),
                             uniform_knots(p - 1, 0.0, 1.0, nel)])
    sp = FieldListSpline(cm, [b1, b2])
    spline = ExtractedSpline(sp, quad_degree=2 * p)
    with pytest.raises(ValueError, match="equal-order"):
        control_point_aggregates(spline)


def test_multilevel_sa_matches_direct(tmp_path):
    """sa_levels>2 (recursive MultilevelSA, round-4): the sa_cg public
    path with a genuinely multilevel hierarchy reproduces the direct
    solution on the extraordinary-point T-spline."""
    a, L = _poisson_forms()
    spline = _star_spline(tmp_path, nel=8, tag="ml")
    U_dir = spline.solve_linear_variational_problem(a, rhs_form=L)
    spline.set_solver_options(linear_solver="sa_cg", linear_tol=1e-12,
                              linear_max_iter=400, sa_levels=4,
                              sa_coarse_size=8)
    U_ml = spline.solve_linear_variational_problem(a, rhs_form=L)
    err = float(jnp.max(jnp.abs(U_ml - U_dir)) / jnp.max(jnp.abs(U_dir)))
    assert err < 1e-8, err
    # the cached preconditioner really is multilevel with sparse P
    from tigar_tpu.solvers.aggregation import MultilevelSA
    (pre, _), = [v for _, v in spline._sa_cache.values()]
    assert isinstance(pre, MultilevelSA)
    assert pre.n_levels >= 3, pre.level_sizes


def test_multilevel_sa_near_flat_iterations(tmp_path):
    """Multilevel SA-PCG iteration counts stay near-flat across three
    star-T-spline refinements while every hierarchy is >= 3 levels
    (sparse prolongations, re-aggregated coarse operators)."""
    from tigar_tpu.solvers.aggregation import MultilevelSA
    a, L = _poisson_forms()
    iters = []
    for nel in (8, 16, 32):
        sp = _star_spline(tmp_path, nel, tag=f"mls{nel}")
        pre, M_sp = MultilevelSA.from_spline(sp, a, coarse_size=8)
        assert pre.n_levels >= 3, pre.level_sizes
        b = sp.assemble_vector(L)
        iters.append(_pcg_iters(lambda W: M_sp @ W, b, pre, tol=1e-8))
    # near-flat: no worse than 35% growth over a 16x DoF range
    assert iters[-1] <= 1.35 * iters[0] + 1, iters


def test_multilevel_sa_wcycle_and_quadratic_kernel(tmp_path):
    """Round-5 MultilevelSA options: cycle="W" and
    near_kernel="quadratic" both produce SPD-preconditioned PCG that
    matches the direct solution; quadratic enriches the tentative space
    (more coarse columns -> larger level sizes) without losing
    convergence.  The bending-tangent measurements motivating them are
    in scripts/bench_mlsa_shell.py."""
    from tigar_tpu.solvers.aggregation import MultilevelSA
    a, L = _poisson_forms()
    sp = _star_spline(tmp_path, nel=12, tag="wq")
    b = sp.assemble_vector(L)
    ref = None
    for nk, cyc in (("linear", "V"), ("linear", "W"),
                    ("quadratic", "V"), ("quadratic", "W")):
        pre, M_sp = MultilevelSA.from_spline(sp, a, coarse_size=8,
                                             near_kernel=nk, cycle=cyc)
        it = _pcg_iters(lambda W: M_sp @ W, b, pre, tol=1e-10)
        assert it < 200, (nk, cyc, it)
        if ref is None:
            ref = pre.level_sizes
        elif nk == "quadratic" and cyc == "V":
            # quadratic tentative space is strictly richer level-1
            assert pre.level_sizes[1] > ref[1], (pre.level_sizes, ref)
