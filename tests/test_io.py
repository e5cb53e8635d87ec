"""I/O tests: extraction serialization round trip (the reference's
writeExtraction/initFromFilesystem split, common.py:435-502, 716-722) and
VTK visualization output.
"""

import os

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import (ExplicitBSplineControlMesh,
                                      TensorBSplineBasis)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.compatible import BSplineCompat
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.io import write_extraction, read_extraction, write_vtk, \
    write_pvd


def poisson_solve(space, p):
    spline = ExtractedSpline(space, quad_degree=2 * p)

    def soln(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def a(ctx, u, v):
        return jnp.sum(ctx.grad(u) * ctx.grad(v))

    def L(ctx, v):
        return 2.0 * jnp.pi ** 2 * soln(ctx.x) * v.val

    U = spline.solve_linear_variational_problem(a, rhs_form=L)
    err = spline.errornorm(U, lambda ctx: soln(ctx.x), rationalize=False)
    return spline, U, float(err)


def test_extraction_roundtrip_equal_order(tmp_path):
    p, nel = 2, 6
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    write_extraction(sp, str(tmp_path / "extraction"))

    sp2 = read_extraction(str(tmp_path / "extraction"))
    assert sp2.ndof == sp.ndof
    assert np.array_equal(sp2.zero_dofs(), sp.zero_dofs())
    # reloaded space solves to the same answer
    _, U1, e1 = poisson_solve(sp, p)
    _, U2, e2 = poisson_solve(sp2, p)
    assert np.allclose(np.asarray(U1), np.asarray(U2), atol=1e-12)
    assert np.isclose(e1, e2, rtol=1e-12)


def test_extraction_roundtrip_compat(tmp_path):
    cm = ExplicitBSplineControlMesh(
        [1, 1], [uniform_knots(1, 0.0, 1.0, 4)] * 2)
    sp = BSplineCompat(cm, "RT", [1, 1])
    for f in range(2):
        b = sp.get_field_spline(f)
        for s in (0, 1):
            sp.add_zero_dofs(f, b.side_dofs(f, s))
    write_extraction(sp, str(tmp_path / "rt"))
    sp2 = read_extraction(str(tmp_path / "rt"))
    assert sp2.ndof == sp.ndof
    assert [f.degrees for f in sp2.fields] == [[2, 1], [1, 2]]
    assert np.array_equal(sp2.zero_dofs(), sp.zero_dofs())


def test_vtk_output(tmp_path):
    p, nel = 2, 4
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s))
    spline, U, _ = poisson_solve(sp, p)

    fn = str(tmp_path / "u.vtk")
    write_vtk(fn, spline, fields={"u": U},
              pointwise={"J": lambda ctx: ctx.sqrtJ}, resolution=2)
    txt = open(fn).read()
    assert "DATASET UNSTRUCTURED_GRID" in txt
    npts = (2 + 1) ** 2 * nel ** 2
    assert f"POINTS {npts} double" in txt
    assert "SCALARS u double 1" in txt
    assert "SCALARS J double 1" in txt
    # pvd series
    write_pvd(str(tmp_path / "u.pvd"), [(0.0, "u.vtk")])
    assert "Collection" in open(str(tmp_path / "u.pvd")).read()


def test_extracted_spline_from_directory(tmp_path):
    """ExtractedSpline(dirname, quad_degree) constructor parity
    (common.py:676-706)."""
    from tigar_tpu.models.extracted import ExtractedSpline as ES
    p, nel = 2, 5
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    write_extraction(sp, str(tmp_path / "x"))
    spline = ES(str(tmp_path / "x"), quad_degree=2 * p)
    assert spline.ndof == sp.ndof
    area = float(spline.assemble_functional(lambda ctx: 1.0))
    assert np.isclose(area, 1.0, atol=1e-12)


def test_state_checkpoint_roundtrip(tmp_path):
    from tigar_tpu.io import save_state, load_state
    import jax.numpy as jnp
    U = jnp.arange(10.0)
    V = jnp.ones(3)
    save_state(str(tmp_path / "ckpt.npz"), u=U, xdot_old=V, step=np.asarray(7))
    st = load_state(str(tmp_path / "ckpt.npz"))
    assert np.allclose(st["u"], np.arange(10.0))
    assert int(st["step"]) == 7


def test_vtk_1d_and_3d_cells(tmp_path):
    """VTK output for line (1D) and hexahedral (3D) samplings."""
    p = 2
    cm1 = ExplicitBSplineControlMesh([p], [uniform_knots(p, 0.0, 1.0, 4)])
    sp1 = EqualOrderSpline(1, cm1)
    spl1 = ExtractedSpline(sp1, quad_degree=2 * p)
    U1 = jnp.asarray(np.linspace(0, 1, spl1.ndof))
    import jax.numpy as jnp_
    fn1 = str(tmp_path / "u1.vtk")
    write_vtk(fn1, spl1, fields={"u": U1}, resolution=2)
    txt = open(fn1).read()
    assert "CELL_TYPES" in txt and "\n3\n" in txt  # VTK_LINE

    cm3 = ExplicitBSplineControlMesh(
        [p, p, p], [uniform_knots(p, 0.0, 1.0, 2)] * 3)
    sp3 = EqualOrderSpline(1, cm3)
    spl3 = ExtractedSpline(sp3, quad_degree=2 * p)
    U3 = jnp.zeros(spl3.ndof)
    fn3 = str(tmp_path / "u3.vtk")
    write_vtk(fn3, spl3, fields={"u": U3}, resolution=1)
    txt = open(fn3).read()
    assert "12\n" in txt  # VTK_HEXAHEDRON


def test_extraction_roundtrip_merged_multipatch(tmp_path):
    """Merged multipatch bases survive the extraction round trip."""
    from tigar_tpu.models.bspline import TensorBSplineBasis
    from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                             merge_coincident_dofs,
                                             MergedControlMesh)
    p = 2
    patches = [TensorBSplineBasis([p, p],
                                  [uniform_knots(p, 0.0, 1.0, 2)] * 2)
               for _ in range(2)]
    mp = MultiPatchBSplineBasis(patches)
    # patch nets side by side, sharing the x=1 edge
    nets = []
    for k in range(2):
        gp = patches[k].greville_points()
        B = np.zeros((gp.shape[0], 3))
        B[:, 0] = gp[:, 0] + k
        B[:, 1] = gp[:, 1]
        B[:, 2] = 1.0
        nets.append(B)
    merged, bnet = merge_coincident_dofs(mp, nets)
    assert merged.ncp < mp.ncp
    cm = MergedControlMesh(merged, bnet)
    sp = EqualOrderSpline(1, cm)
    write_extraction(sp, str(tmp_path / "m"))
    sp2 = read_extraction(str(tmp_path / "m"))
    assert sp2.ndof == sp.ndof
    spl1 = ExtractedSpline(sp, quad_degree=4)
    spl2 = ExtractedSpline(sp2, quad_degree=4)
    a1 = float(spl1.assemble_functional(lambda ctx: 1.0))
    a2 = float(spl2.assemble_functional(lambda ctx: 1.0))
    assert np.isclose(a1, 2.0, atol=1e-12) and np.isclose(a2, a1)
