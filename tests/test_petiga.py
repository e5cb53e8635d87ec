"""PetIGA .dat geometry files (petiga_io.py): binary round trip and a NURBS
Poisson solve driven from a file, at the optimal convergence rate --
the reference's igakit/PetIGA input path (tIGAr/NURBS.py:23-36).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tigar_tpu.petiga_io import read_petiga, write_petiga
from tigar_tpu.models.nurbs import NURBSControlMesh, quarter_annulus_control
from tigar_tpu.ops.refine import uniform_refine
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def test_round_trip(tmp_path):
    degrees, kvecs, ctrl = quarter_annulus_control()
    fn = os.path.join(tmp_path, "annulus.dat")
    write_petiga(fn, degrees, kvecs, ctrl)
    d2, k2, c2 = read_petiga(fn)
    assert d2 == degrees
    for a, b in zip(kvecs, k2):
        np.testing.assert_allclose(a, b, atol=0)
    np.testing.assert_allclose(ctrl, c2, atol=0)


def test_round_trip_3d_nonrational(tmp_path):
    # 3D polynomial (weights 1) geometry: descr rational bit must be clear
    from tigar_tpu.ops.knots import uniform_knots
    degrees = [2, 1, 1]
    kvecs = [uniform_knots(p, 0.0, 1.0, 2) for p in degrees]
    sizes = [len(k) - p - 1 for p, k in zip(degrees, kvecs)]
    rng = np.random.default_rng(3)
    ctrl = np.ones(tuple(sizes) + (4,))
    ctrl[..., :3] = rng.normal(size=tuple(sizes) + (3,))
    fn = os.path.join(tmp_path, "b3.dat")
    write_petiga(fn, degrees, kvecs, ctrl)
    with open(fn, "rb") as f:
        header = np.fromfile(f, np.dtype(">i4"), 2)
    assert header[1] == 0x1  # geometry, not rational
    _, _, c2 = read_petiga(fn)
    np.testing.assert_allclose(ctrl, c2, atol=0)


def test_knots_only_and_errors(tmp_path):
    degrees, kvecs, _ = quarter_annulus_control()
    fn = os.path.join(tmp_path, "knots.dat")
    write_petiga(fn, degrees, kvecs, None)
    d2, k2, c2 = read_petiga(fn)
    assert c2 is None and d2 == degrees
    with pytest.raises(ValueError, match="no geometry"):
        NURBSControlMesh(fn)
    bad = os.path.join(tmp_path, "bad.dat")
    with open(bad, "wb") as f:
        f.write(np.asarray([12345], ">i4").tobytes())
    with pytest.raises(ValueError, match="not a PetIGA"):
        read_petiga(bad)


def test_nurbs_poisson_from_dat_file(tmp_path):
    """Write the quarter annulus to .dat, read it back through
    NURBSControlMesh(filename), and verify optimal-rate Poisson
    (reference demo: poisson-nurbs.py with an igakit geometry)."""
    errs = []
    for levels in (2, 3):
        degrees, kvecs, ctrl = quarter_annulus_control()
        kvecs, ctrl = uniform_refine(degrees, kvecs, ctrl, levels=levels)
        fn = os.path.join(tmp_path, f"annulus_l{levels}.dat")
        write_petiga(fn, degrees, kvecs, ctrl)

        cm = NURBSControlMesh(fn)
        sp = EqualOrderSpline(1, cm)
        basis = cm.scalar_basis()
        for d in (0, 1):
            for s in (0, 1):
                sp.add_zero_dofs(0, basis.side_dofs(d, s))
        spline = ExtractedSpline(sp, quad_degree=6)

        def exact(x):
            return (x[0] ** 2 + x[1] ** 2 - 1.0) * \
                   (x[0] ** 2 + x[1] ** 2 - 4.0) * x[0] * x[1]

        def f_rhs(x):
            import jax
            H = jax.hessian(exact)(x)
            return -(H[0, 0] + H[1, 1])

        def res(ctx, u, v):
            uu, vv = ctx.rationalize(u), ctx.rationalize(v)
            return jnp.dot(ctx.grad(uu), ctx.grad(vv)) - f_rhs(ctx.x) * vv.val

        U = spline.solve_linear_variational_problem(res)
        errs.append(float(spline.errornorm(U, lambda ctx: exact(ctx.x))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 2.7, f"suboptimal rate {rate} (errors {errs})"
