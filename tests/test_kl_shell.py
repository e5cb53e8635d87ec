"""Kirchhoff-Love shell tests.

1. Quantitative verification: clamped square SVK plate under small uniform
   transverse pressure must reproduce the analytic Kirchhoff-plate center
   deflection w = alpha q a^4 / D (alpha = 0.00126 for a clamped square,
   D = E h^3 / 12(1-nu^2)).
2. Reduced version of demos/kl-shell-hyper/kl-hyper.py: quasi-static
   inflation of a clamped incompressible neo-Hookean membrane with exact
   plane-stress pressure multiplier, follower pressure load, load stepping.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.ops.quadrature import gauss_rule_interval
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (midsurface_geometry, svk_psi_surface,
                                    kl_strain_at, incompressible_psi)
from tigar_tpu.forms import deriv
from tigar_tpu.timeint import LoadStepper


def make_shell_spline(nel, p=2, n_layers=2):
    degs = [p, p]
    kvecs = [uniform_knots(p, -1.0, 1.0, nel)] * 2
    cm = ExplicitBSplineControlMesh(degs, kvecs, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    basis = cm.scalar_basis()
    for side in (0, 1):
        for direction in (0, 1):
            dofs = basis.side_dofs(direction, side, n_layers=n_layers)
            for i in range(3):
                sp.add_zero_dofs(i, dofs)
    return ExtractedSpline(sp, quad_degree=2 * p, nders=2)


def test_midsurface_geometry_flat():
    """Reference midsurface of a flat patch: identity metric, zero
    curvature, z normal."""
    spline = make_shell_spline(4)
    geom = spline.geometry
    import jax

    def check(ctx):
        g = midsurface_geometry(ctx)
        return g.a, g.b, g.a2
    a, b, n = jax.vmap(jax.vmap(check))(geom)
    assert np.allclose(np.asarray(a), np.eye(2), atol=1e-12)
    assert np.allclose(np.asarray(b), 0.0, atol=1e-12)
    assert np.allclose(np.asarray(n)[..., 2], 1.0, atol=1e-12)


def test_hand_residual_matches_ad():
    """svk_shell_residual (the hand-derived first variation used by
    bench.py and __graft_entry__.py) must match the AD-of-energy density
    to f64 roundoff -- residual AND tangent action -- at a large random
    displacement."""
    from tigar_tpu.models.shell import (svk_shell_residual,
                                        precompute_shell_reference)
    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 1.0e-2

    def res_ad(ctx, u, v):
        return deriv(lambda y: svk_psi_surface(ctx, y, E_mod, nu, h_th),
                     u, v) - q * v.val[2]

    def res_hand(ctx, u, v):
        return svk_shell_residual(ctx, u, v, E_mod, nu, h_th) - q * v.val[2]

    spline = precompute_shell_reference(make_shell_spline(6))
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 0.1)
    W = jnp.asarray(rng.normal(size=spline.ndof))
    r1 = spline.assemble_vector(res_ad, U=U)
    r2 = spline.assemble_vector(res_hand, U=U)
    m = float(jnp.max(jnp.abs(r1)))
    assert float(jnp.max(jnp.abs(r1 - r2))) < 1e-13 * m
    t1 = spline.tangent_action(res_ad, U, W)
    t2 = spline.tangent_action(res_hand, U, W)
    mt = float(jnp.max(jnp.abs(t1)))
    assert float(jnp.max(jnp.abs(t1 - t2))) < 1e-13 * mt


def test_svk_plate_center_deflection():
    """Small-deflection clamped plate: center deflection within a few
    percent of the Kirchhoff solution."""
    E_mod, nu, h_th = 1.0e7, 0.3, 0.03
    q = 1.0e-4
    a_len = 2.0
    D = E_mod * h_th ** 3 / (12.0 * (1.0 - nu ** 2))
    w_exact = 0.00126 * q * a_len ** 4 / D

    spline = make_shell_spline(12)

    def res(ctx, u, v):
        y = u  # explicit B-spline: weight = 1, homogeneous == physical
        dWint = deriv(lambda yy: svk_psi_surface(ctx, yy, E_mod, nu, h_th),
                      y, v)
        dWext = -q * v.val[2]
        return dWint + dWext

    U = spline.solve_nonlinear_variational_problem(res)
    w_center = spline.evaluate(U, np.asarray([[0.0, 0.0]]),
                               rationalize=False)[0, 2]
    # measured: 5.2% @ 8x8, 2.1% @ 12x12, 0.98% @ 16x16 -- converging to
    # the analytic Kirchhoff value from below (discrete stiffness)
    rel = abs(w_center - w_exact) / w_exact
    assert rel < 0.025, (w_center, w_exact, rel)


def test_hyperelastic_inflation():
    """Reduced kl-hyper demo: 5 load steps of follower-pressure inflation of
    an incompressible neo-Hookean membrane (kl-hyper.py:167-259)."""
    mu_nh = 1.0e4
    h_th = 0.03
    pressure = 1.0e2
    n_steps = 5
    stepper = LoadStepper(1.0 / 20.0)  # load up to t = 0.25

    spline = make_shell_spline(6)
    spline.set_solver_options(max_iters=100)

    xi2, w_th = gauss_rule_interval(4, h_th)

    def psi_el(E):
        C = 2.0 * E + jnp.eye(3, dtype=E.dtype)
        return 0.5 * mu_nh * (jnp.trace(C) - 3.0)

    def energy_density(ctx, y):
        total = 0.0
        for i in range(len(xi2)):
            E_2D = kl_strain_at(ctx, y, float(xi2[i]))
            total = total + float(w_th[i]) * incompressible_psi(E_2D, psi_el)
        return total

    def res(ctx, u, v, params):
        dWint = deriv(lambda y: energy_density(ctx, y), u, v)
        cur = midsurface_geometry(ctx, u)
        ref = midsurface_geometry(ctx)
        from tigar_tpu.ops.smallmat import det_small
        area_ratio = jnp.sqrt(det_small(cur.a) / det_small(ref.a))
        dWext = -params["load"] * area_ratio * jnp.dot(cur.a2, v.val)
        return dWint + dWext

    U = jnp.zeros(spline.ndof, dtype=spline.dtype)
    centers = []
    for step in range(n_steps):
        U = spline.solve_nonlinear_variational_problem(
            res, U0=U, params={"load": pressure * stepper.t})
        w_center = spline.evaluate(U, np.asarray([[0.0, 0.0]]),
                                   rationalize=False)[0, 2]
        centers.append(float(w_center))
        stepper.advance()

    # inflation: monotone increasing positive center deflection,
    # sublinear growth (stiffening membrane)
    assert all(c > 0 for c in centers), centers
    assert all(centers[i + 1] > centers[i] for i in range(len(centers) - 1))
    incr = np.diff([0.0] + centers)
    assert incr[-1] < incr[0], centers
    # the deflection should be a sizable fraction of the span at this load
    assert 0.05 < centers[-1] < 1.0, centers


def test_adjoint_matches_ad():
    """Adjoint-form (AD-free) assembly: the hand-derived adjoint jet
    (svk_shell_adjoint) and the generic pointwise-grad fallback
    (forms.adjoint_of) must assemble the SAME residual as the reverse-mode
    AD path, and the forward-mode tangent adjoint must match the tangent
    JVP -- all to f64 roundoff at a large random displacement."""
    import jax
    from tigar_tpu.models.shell import (svk_shell_residual,
                                        svk_shell_adjoint,
                                        svk_shell_tangent_adjoint,
                                        precompute_shell_reference)
    from tigar_tpu.forms import adjoint_of
    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 1.0e-2

    def res(ctx, u, v):
        return svk_shell_residual(ctx, u, v, E_mod, nu, h_th) - q * v.val[2]

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
        return F._replace(val=F.val.at[2].add(-q))

    def tan_adj(ctx, u):
        return svk_shell_tangent_adjoint(ctx, u["u"], u["w"],
                                         E_mod, nu, h_th)

    spline = precompute_shell_reference(make_shell_spline(6))
    asm = spline._assembler("dx")
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 0.1)
    W = jnp.asarray(rng.normal(size=spline.ndof))

    r_ad = asm.residual_vector(res, U)
    m = float(jnp.max(jnp.abs(r_ad)))
    r_hand = asm.residual_vector_adjoint(res_adj, U)
    assert float(jnp.max(jnp.abs(r_hand - r_ad))) < 1e-13 * m
    r_gen = asm.residual_vector_adjoint(adjoint_of(res), U)
    assert float(jnp.max(jnp.abs(r_gen - r_ad))) < 1e-13 * m

    t_ref = jax.jvp(lambda a: asm.residual_vector(res, a), (U,), (W,))[1]
    mt = float(jnp.max(jnp.abs(t_ref)))
    t_hand = asm.residual_vector_adjoint(tan_adj, {"u": U, "w": W})
    assert float(jnp.max(jnp.abs(t_hand - t_ref))) < 1e-13 * mt


def test_hessian_matches_jacfwd():
    """The hand-derived pointwise jet-Hessian (svk_shell_hessian) must
    assemble the SAME element tangent matrices as the 21-direction jacfwd
    sweep of the adjoint (element_matrices_adjoint) to f64 roundoff at a
    large random displacement."""
    from tigar_tpu.models.shell import (svk_shell_adjoint, svk_shell_hessian,
                                        precompute_shell_reference)
    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 1.0e-2

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
        return F._replace(val=F.val.at[2].add(-q))

    def hess(ctx, u):
        return svk_shell_hessian(ctx, u, E_mod, nu, h_th)

    spline = precompute_shell_reference(make_shell_spline(5))
    asm = spline._assembler("dx")
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 0.1)

    E_ad = np.asarray(asm.element_matrices_adjoint(res_adj, U))
    E_hand = np.asarray(asm.element_matrices_hessian(hess, U))
    m = np.max(np.abs(E_ad))
    assert np.max(np.abs(E_hand - E_ad)) < 1e-12 * m
    # the hand Hessian is symmetric by construction; so must the
    # jacfwd-built element matrices be (on the symmetric-h subspace)
    assert np.max(np.abs(E_hand - E_hand.transpose(0, 2, 1))) < 1e-12 * m
