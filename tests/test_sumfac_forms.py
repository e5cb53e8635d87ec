"""Sum-factorized assembly for arbitrary forms (ops/sumfac_forms.py) must
match the generic tabulated assembler to machine precision across every
space family it claims: rational geometry, vector/multi-field spaces with
per-field degrees (RT), second-derivative forms (shells), reduced
continuity (strided windows), periodic knots (gather windows), and 3D.

Reference scope: this replaces FFC/DOLFIN assembly (tIGAr/common.py:
1162-1234) for tensor-product spaces at scales where dense tabulation
cannot exist (SURVEY.md section 7; VERDICT round-1 item 3).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import (ExplicitBSplineControlMesh,
                                      TensorBSplineBasis)
from tigar_tpu.models.nurbs import NURBSControlMesh
from tigar_tpu.models.space import EqualOrderSpline, FieldListSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.ops.sumfac_forms import make_sumfac_assembler
from tigar_tpu.models.shell import svk_psi_surface
from tigar_tpu.forms import deriv

RNG = np.random.default_rng(7)


def poisson(ctx, u, v):
    uu, vv = ctx.rationalize(u), ctx.rationalize(v)
    return jnp.dot(ctx.grad(uu), ctx.grad(vv)) - 1.0 * vv.val


def assert_match(spline, dens, U, tol=1e-12):
    r1 = spline._assembler("dx").residual_vector(dens, U)
    r2 = make_sumfac_assembler(spline).residual_vector(dens, U)
    scale = float(jnp.max(jnp.abs(r1)))
    assert float(jnp.max(jnp.abs(r1 - r2))) <= tol * max(scale, 1e-30)
    return r1


def _distorted_nurbs(p=2, nel=5):
    kv = uniform_knots(p, 0.0, 1.0, nel)
    basis = TensorBSplineBasis([p, p], [kv, kv])
    n0, n1 = basis.ncp_per_dir
    gp = basis.greville_points()
    w = 1.0 + 0.3 * gp[:, 0] * gp[:, 1]
    Bf = np.zeros((basis.ncp, 3))
    Bf[:, 0] = (gp[:, 0] + 0.1 * gp[:, 1] ** 2) * w
    Bf[:, 1] = (gp[:, 1] + 0.05 * np.sin(3 * gp[:, 0])) * w
    Bf[:, 2] = w
    grid = Bf.reshape(n1, n0, 3).transpose(1, 0, 2)
    return NURBSControlMesh([p, p], [kv, kv], grid)


def test_nurbs_poisson_residual_matches():
    sp = ExtractedSpline(EqualOrderSpline(1, _distorted_nurbs()),
                         quad_degree=4)
    U = jnp.asarray(RNG.normal(size=sp.ndof))
    assert_match(sp, poisson, U)


def test_svk_shell_residual_and_tangent_match():
    p = 2
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, -1.0, 1.0, 5)] * 2, extra_dim=1)
    sp = ExtractedSpline(EqualOrderSpline(3, cm), quad_degree=2 * p, nders=2)
    U = jnp.asarray(RNG.normal(size=sp.ndof) * 1e-3)

    def shell(ctx, u, v):
        return deriv(lambda y: svk_psi_surface(ctx, y, 1e7, 0.3, 0.03),
                     u, v) - 1e-2 * v.val[2]

    assert_match(sp, shell, U)
    asm_sf = make_sumfac_assembler(sp)
    W = jnp.asarray(RNG.normal(size=sp.ndof))
    t1 = jax.jvp(lambda a: sp._assembler("dx").residual_vector(shell, a),
                 (U,), (W,))[1]
    t2 = asm_sf.tangent_action(shell, U, W)
    assert float(jnp.max(jnp.abs(t1 - t2))) <= \
        1e-12 * float(jnp.max(jnp.abs(t1)))


def test_rt_multifield_matches():
    from tigar_tpu.models.compatible import generate_fields_compat
    cm = ExplicitBSplineControlMesh([1, 1], [uniform_knots(1, 0., 1., 4)] * 2)
    fields = generate_fields_compat(cm, "RT", [1, 1])
    sp = ExtractedSpline(FieldListSpline(cm, fields), quad_degree=4,
                         nders=1, geom_nders=2)
    U = jnp.asarray(RNG.normal(size=sp.ndof))

    def rtform(ctx, u, v):
        up, vp = ctx.pushforward_RT(u), ctx.pushforward_RT(v)
        return ctx.div(up) * ctx.div(vp) + jnp.dot(up.val, vp.val)

    assert_match(sp, rtform, U)


def test_reduced_continuity_strided_windows():
    kvr = uniform_knots(2, 0.0, 1.0, 5, continuity_drop=1)
    cm = ExplicitBSplineControlMesh([2, 2], [kvr, kvr])
    sp = ExtractedSpline(EqualOrderSpline(1, cm), quad_degree=4)
    # strided (not gather) windows must be selected
    asm = make_sumfac_assembler(sp)
    assert all(m[0] == "slide" and m[2] == 2 for m in asm.metas[0])
    U = jnp.asarray(RNG.normal(size=sp.ndof))
    assert_match(sp, poisson, U)


def test_periodic_gather_windows():
    kvp = uniform_knots(2, 0.0, 1.0, 6, periodic=True)
    bp = TensorBSplineBasis([2, 2], [kvp, uniform_knots(2, 0.0, 1.0, 4)])
    gp = bp.greville_points()
    B = np.zeros((bp.ncp, 3))
    B[:, 0] = gp[:, 0]
    B[:, 1] = gp[:, 1]
    B[:, 2] = 1.0

    class PCM:
        nsd = 2

        def scalar_basis(self):
            return bp

        def homogeneous_points(self):
            return B

    sp = ExtractedSpline(EqualOrderSpline(1, PCM()), quad_degree=4)
    asm = make_sumfac_assembler(sp)
    assert asm.metas[0][0][0] == "gather"  # periodic direction
    U = jnp.asarray(RNG.normal(size=sp.ndof))
    assert_match(sp, poisson, U)


def test_3d_scalar_matches():
    cm = ExplicitBSplineControlMesh([2, 2, 2],
                                    [uniform_knots(2, 0., 1., 3)] * 3)
    sp = ExtractedSpline(EqualOrderSpline(1, cm), quad_degree=4)
    U = jnp.asarray(RNG.normal(size=sp.ndof))
    assert_match(sp, poisson, U)


def test_functional_and_linear_match():
    sp = ExtractedSpline(EqualOrderSpline(1, _distorted_nurbs()),
                         quad_degree=4)
    U = jnp.asarray(RNG.normal(size=sp.ndof))
    a_gen = sp._assembler("dx")
    a_sf = make_sumfac_assembler(sp)

    def energy(ctx, u):
        return jnp.sum(ctx.rationalize(u).val ** 2)

    f1 = a_gen.functional(energy, U)
    f2 = a_sf.functional(energy, U)
    assert abs(float(f1 - f2)) <= 1e-12 * abs(float(f1))

    def load(ctx, v):
        return ctx.x[0] * ctx.rationalize(v).val

    b1 = a_gen.linear_vector(load)
    b2 = a_sf.linear_vector(load)
    assert float(jnp.max(jnp.abs(b1 - b2))) <= \
        1e-12 * float(jnp.max(jnp.abs(b1)))
