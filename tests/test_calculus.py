"""Curvilinear tensor calculus tests: metric compatibility (covariant
derivative of the metric vanishes -- validates Christoffel symbols +
covariant machinery), index gymnastics, and cross-validation of the
curvilinear divergence against the Piola-identity formula.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tigar_tpu.calculus import (CurvilinearTensor, curvilinear_inner,
                                covariant_derivative, spline_GRAD, spline_DIV)
from tigar_tpu.forms import Jet
from tigar_tpu.models.nurbs import NURBSControlMesh, quarter_annulus_control
from tigar_tpu.ops.refine import uniform_refine
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def annulus_ctx():
    degrees, kvecs, ctrl = quarter_annulus_control()
    kvecs, ctrl = uniform_refine(degrees, kvecs, ctrl, levels=1)
    cm = NURBSControlMesh(degrees, kvecs, ctrl)
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    return spline.geometry


def test_metric_compatibility():
    """nabla g = 0 at every quadrature point of a curved geometry."""
    geom = annulus_ctx()

    def check(ctx):
        T = CurvilinearTensor(ctx.g, ctx.g, ginv=ctx.ginv)
        D = covariant_derivative(T, ctx.dmetric(), ctx.christoffel())
        return jnp.max(jnp.abs(D.T))

    m = jax.vmap(jax.vmap(check))(geom)
    assert float(jnp.max(m)) < 1e-11


def test_index_gymnastics():
    geom = annulus_ctx()
    ctx = jax.tree_util.tree_map(lambda x: x[3, 2], geom)
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.normal(size=(2, 2)))
    ct = CurvilinearTensor(T, ctx.g, ginv=ctx.ginv)
    # sharp then flat is the identity
    rt = ct.sharp().flat()
    assert np.allclose(np.asarray(rt.T), np.asarray(T), atol=1e-12)
    # inner product equals the explicit metric contraction
    S = CurvilinearTensor(jnp.asarray(rng.normal(size=(2, 2))), ctx.g,
                          ginv=ctx.ginv)
    expect = jnp.einsum("ab,cd,ac,bd->", T, S.T, ctx.ginv, ctx.ginv)
    got = curvilinear_inner(ct, S)
    assert np.isclose(float(got), float(expect), atol=1e-12)


def test_div_matches_piola_identity():
    """Curvilinear divergence of a raised-index vector equals
    tr(du) + u^a Gamma^b_{ba} and the Piola formula
    (1/sqrtJ) * [tr(d(u sqrtJ))] evaluated via QP helpers."""
    geom = annulus_ctx()
    rng = np.random.default_rng(1)
    nel, nq = geom.sqrtJ.shape
    uval = jnp.asarray(rng.normal(size=(nel, nq, 2)))
    ug = jnp.asarray(rng.normal(size=(nel, nq, 2, 2)))

    def check(ctx, val, g):
        u = Jet(val, g, None)
        div_curv = spline_DIV(ctx, u).T
        # DIV treats plain components as lowered and sharps them
        # (common.py:1082-1093): contravariant w^a = ginv^{ab} u_b
        dg = ctx.dmetric()
        dginv = -jnp.einsum("ac,cbe,bd->ade", ctx.ginv, dg, ctx.ginv)
        w = ctx.ginv @ val
        dw = jnp.einsum("abe,b->ae", dginv, val) + ctx.ginv @ g
        dJ = ctx._dsqrtJ()
        div_piola = jnp.trace(dw) + jnp.dot(w, dJ) / ctx.sqrtJ
        return div_curv - div_piola

    d = jax.vmap(jax.vmap(check))(geom, uval, ug)
    assert float(jnp.max(jnp.abs(d))) < 1e-10


def test_grad_flat_geometry():
    """On an identity map, GRAD reduces to the plain parametric Jacobian."""
    from tigar_tpu.ops.knots import uniform_knots
    from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
    cm = ExplicitBSplineControlMesh([2, 2],
                                    [uniform_knots(2, 0.0, 1.0, 2)] * 2)
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    geom = spline.geometry
    ctx = jax.tree_util.tree_map(lambda x: x[0, 0], geom)
    rng = np.random.default_rng(2)
    u = Jet(jnp.asarray(rng.normal(size=2)),
            jnp.asarray(rng.normal(size=(2, 2))), None)
    G = spline_GRAD(ctx, u)
    assert np.allclose(np.asarray(G.T), np.asarray(u.g), atol=1e-12)
    assert G.lowered == [True, False]


def extruded_annulus_ctx():
    """Curved trivariate rational geometry for 3D pushforward checks."""
    from tigar_tpu.models.nurbs import quarter_annulus_control
    degrees2, kvecs2, ctrl2 = quarter_annulus_control()
    degrees = degrees2 + [1]
    kvecs = kvecs2 + [np.asarray([0.0, 0.0, 1.0, 1.0])]
    ctrl = np.zeros((3, 3, 2, 4))
    for k, z in enumerate([0.0, 1.0]):
        ctrl[:, :, k, 0] = ctrl2[:, :, 0]
        ctrl[:, :, k, 1] = ctrl2[:, :, 1]
        ctrl[:, :, k, 2] = z * ctrl2[:, :, 2]
        ctrl[:, :, k, 3] = ctrl2[:, :, 2]
    cm = NURBSControlMesh(degrees, kvecs, ctrl)
    sp = EqualOrderSpline(1, cm)
    spline = ExtractedSpline(sp, quad_degree=4, nders=2)
    return spline.geometry


def test_pushforward_N_gradient_curl_free():
    """The covariant (N-type) pushforward maps parametric gradients to
    physical gradients, so pushing forward the jet of a parametric gradient
    field must give a curl-free physical field -- this validates the
    pushforward's gradient formula (incl. the d(DF^{-T}) term) on curved
    rational geometry."""
    geom = extruded_annulus_ctx()
    rng = np.random.default_rng(3)
    nel, nq = geom.sqrtJ.shape
    # jets of grad(phi) for a synthetic scalar phi: value = random gradient,
    # parametric derivative = SYMMETRIC random Hessian
    gval = jnp.asarray(rng.normal(size=(nel, nq, 3)))
    H = rng.normal(size=(nel, nq, 3, 3))
    gjac = jnp.asarray(0.5 * (H + np.swapaxes(H, -1, -2)))

    def check(ctx, v, J):
        u = Jet(v, J, None)
        pf = ctx.pushforward_N(u)
        G = pf.grad
        curl = jnp.stack([G[2, 1] - G[1, 2],
                          G[0, 2] - G[2, 0],
                          G[1, 0] - G[0, 1]])
        return jnp.max(jnp.abs(curl)) / (1.0 + jnp.max(jnp.abs(G)))

    import jax
    m = jax.vmap(jax.vmap(check))(geom, gval, gjac)
    assert float(jnp.max(m)) < 1e-11


def test_pushforward_RT_divergence_consistency():
    """Piola-exact divergence (trace(u.g)/sqrtJ) equals the trace of the
    pushforward's full gradient formula on curved codim-0 geometry -- two
    independent code paths."""
    geom = extruded_annulus_ctx()
    rng = np.random.default_rng(4)
    nel, nq = geom.sqrtJ.shape
    uval = jnp.asarray(rng.normal(size=(nel, nq, 3)))
    ug = jnp.asarray(rng.normal(size=(nel, nq, 3, 3)))

    def check(ctx, v, g):
        u = Jet(v, g, None)
        pf = ctx.pushforward_RT(u)
        return (jnp.trace(pf.grad) - pf.div_exact) / (1.0 + jnp.abs(pf.div_exact))

    import jax
    m = jax.vmap(jax.vmap(check))(geom, uval, ug)
    assert float(jnp.max(jnp.abs(m))) < 1e-11
