"""Integration tests: div-conforming compatible B-splines and the 2D
Taylor-Green vortex -- mirrors demos/taylor-green/taylor-green-2d.py
(RT-type splines on distorted NURBS geometry, iterated-penalty Navier-Stokes
on a solenoidal subspace, generalized-alpha in time) at reduced resolution.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.ops.refine import uniform_refine
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.nurbs import NURBSControlMesh
from tigar_tpu.models.compatible import (BSplineCompat, generate_fields_compat,
                                         IteratedPenaltySolver,
                                         div_free_project, piola_div)
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.timeint import GeneralizedAlphaIntegrator


def test_compat_field_structure():
    """RT/N field spaces from the control mesh's unique knots
    (compatibleSplines.py:42-64): RT raises degree along the field
    direction, N perpendicular."""
    degs = [1, 1]
    cm = ExplicitBSplineControlMesh(
        [2, 2], [uniform_knots(2, 0.0, 1.0, 4)] * 2)
    rt = generate_fields_compat(cm, "RT", degs)
    assert rt[0].degrees == [2, 1] and rt[1].degrees == [1, 2]
    assert rt[0].ncp_per_dir == [6, 5] and rt[1].ncp_per_dir == [5, 6]
    nt = generate_fields_compat(cm, "N", degs)
    assert nt[0].degrees == [1, 2] and nt[1].degrees == [2, 1]
    # periodic variant keeps unclamped knot vectors
    rt_p = generate_fields_compat(cm, "RT", degs, periodicities=[True, True])
    assert rt_p[0].kvs[0].is_periodic
    assert rt_p[0].ncp_per_dir == [4, 4]


def _distorted_tg_spline(levels):
    """pi-scaled distorted quadratic geometry of taylor-green-2d.py:31-54
    with RT deg [1,1] fields."""
    degrees = [2, 2]
    kvecs = [np.asarray([-1.0, -1, -1, 1, 1, 1])] * 2
    pts = np.asarray([[[-1.0, -1.0], [0.0, -1.0], [1.0, -1.0]],
                      [[-1.0, 0.0], [0.7, 0.3], [1.0, 0.0]],
                      [[-1.0, 1.0], [0.0, 1.0], [1.0, 1.0]]])
    ctrl = np.zeros((3, 3, 3))
    ctrl[:, :, :2] = math.pi * pts
    ctrl[:, :, 2] = 1.0
    kv, c = uniform_refine(degrees, kvecs, ctrl, levels=levels)
    cm = NURBSControlMesh(degrees, kv, c)
    sp = BSplineCompat(cm, "RT", [1, 1])
    # strong normal-velocity BCs (taylor-green-2d.py:83-87)
    for field in range(2):
        basis = sp.get_field_spline(field)
        for side in (0, 1):
            sp.add_zero_dofs(field, basis.side_dofs(field, side))
    spline = ExtractedSpline(sp, quad_degree=4, nders=1, geom_nders=2)
    return spline


def exact_tg(x, t, visc=0.1, dens=1.0):
    decay = jnp.exp(-2.0 * visc * t / dens)
    return decay * jnp.stack([jnp.sin(x[0]) * jnp.cos(x[1]),
                              -jnp.cos(x[0]) * jnp.sin(x[1])])


def test_div_free_projection():
    spline = _distorted_tg_spline(levels=2)
    U = div_free_project(spline, lambda ctx: exact_tg(ctx.x, 0.0))

    # pointwise divergence of the projected field must vanish
    def div_density(ctx, u):
        return piola_div(ctx, u) ** 2
    div_err = float(spline.assemble_functional(div_density, U=U))
    assert div_err < 1e-13

    # and the projection approximates the target in L2
    def err_density(ctx, u):
        e = ctx.pushforward_RT(u).val - exact_tg(ctx.x, 0.0)
        return jnp.sum(e * e)
    l2 = math.sqrt(float(spline.assemble_functional(err_density, U=U)))
    assert l2 < 1.0  # ~20% of ||u||=pi on a 4x4 distorted mesh


def tg_final_error(levels, visc=0.1, dens=1.0, penalty=1e6):
    spline = _distorted_tg_spline(levels)
    n_steps = 2 ** levels
    dt = 1.0 / n_steps

    U = div_free_project(spline, lambda ctx: exact_tg(ctx.x, 0.0))
    Udot = div_free_project(
        spline, lambda ctx: -2.0 * visc / dens * exact_tg(ctx.x, 0.0))
    timeInt = GeneralizedAlphaIntegrator(0.5, dt, U, (U, Udot))

    def res(ctx, s, v_hat):
        u_hat_alpha = timeInt.x_alpha_of(s)
        udot_hat_alpha = timeInt.xdot_alpha_of(s)
        u = ctx.pushforward_RT(u_hat_alpha)
        udot = ctx.pushforward_RT(udot_hat_alpha)
        v = ctx.pushforward_RT(v_hat)
        Du_Dt = udot.val + u.grad @ u.val
        eps_u = 0.5 * (u.grad + u.grad.T)
        eps_v = 0.5 * (v.grad + v.grad.T)
        return (dens * jnp.sum(Du_Dt * v.val)
                + 2.0 * visc * jnp.sum(eps_u * eps_v))

    solver = IteratedPenaltySolver(spline, res)
    w = jnp.zeros_like(U)
    for step in range(n_steps):
        aux = {"x_old": timeInt.x_old, "xdot_old": timeInt.xdot_old}
        timeInt.x, w = solver.solve(timeInt.x, w=w, penalty=penalty, aux=aux)
        timeInt.advance()

    t_final = n_steps * dt

    def err_density(ctx, u):
        e = ctx.pushforward_RT(u).val - exact_tg(ctx.x, t_final, visc, dens)
        return jnp.sum(e * e)
    err = math.sqrt(float(spline.assemble_functional(
        err_density, U=timeInt.x_old)))

    def div_density(ctx, u):
        return piola_div(ctx, u) ** 2
    div_err = float(spline.assemble_functional(div_density, U=timeInt.x_old))
    return err, div_err


def test_taylor_green_2d():
    e1, d1 = tg_final_error(levels=2)
    e2, d2 = tg_final_error(levels=3)
    # velocity stays (essentially) exactly solenoidal
    assert d1 < 1e-12 and d2 < 1e-12
    # combined space-time 2nd-order convergence (dt ~ h);
    # taylor-green-2d.py:222-229
    rate = math.log(e1 / e2) / math.log(2.0)
    assert rate > 1.5, (e1, e2, rate)
    assert e2 < 0.2
