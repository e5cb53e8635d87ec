"""Penalty coupling of non-matching multi-patch interfaces
(tigar_tpu.coupling): the capability the reference names but does not
implement (patch coupling "must come from user-provided merged numbering
or penalties", tIGAr/BSplines.py:656-659).

Two-patch Poisson on [0,2]x[0,1] split at x=1 with DIFFERENT element
counts across the interface; the penalty-coupled solution must converge
to the manufactured solution at the optimal rate, with the interface jump
at the penalty-consistency scale.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import TensorBSplineBasis
from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                         MultiPatchControlMesh)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.coupling import PenaltyInterfaceCoupling


def _two_patch_spline(p, nel_a, nel_b_y):
    """Patch 0 on [0,1]x[0,1] with nel_a^2 elements; patch 1 on [1,2]x[0,1]
    with nel_a x nel_b_y elements (non-matching across x=1 when
    nel_b_y != nel_a)."""
    pa = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel_a)] * 2)
    pb = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel_a),
                                     uniform_knots(p, 0.0, 1.0, nel_b_y)])
    basis = MultiPatchBSplineBasis([pa, pb])

    def bnet(patch, x_off):
        g = patch.greville_points()         # linear precision: x(xi)=xi
        B = np.ones((g.shape[0], 3))
        B[:, 0] = g[:, 0] + x_off
        B[:, 1] = g[:, 1]
        return B

    cm = MultiPatchControlMesh(basis, [bnet(basis.patches[0], 0.0),
                                       bnet(basis.patches[1], 1.0)])
    gen = EqualOrderSpline(1, cm)
    # outer Dirichlet boundary (interface x=1 NOT constrained)
    gen.add_zero_dofs(0, basis.patch_side_dofs(0, 0, 0))   # x = 0
    gen.add_zero_dofs(0, basis.patch_side_dofs(1, 0, 1))   # x = 2
    for patch in (0, 1):
        for s in (0, 1):
            gen.add_zero_dofs(0, basis.patch_side_dofs(patch, 1, s))
    return ExtractedSpline(gen, quad_degree=2 * p), basis


def _soln(x):
    return jnp.sin(0.5 * jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])


def _res(ctx, u, v):
    f = (0.25 + 1.0) * jnp.pi ** 2 * _soln(ctx.x)
    return jnp.sum(ctx.grad(u) * ctx.grad(v)) - f * v.val


def _solve_coupled(spline, coupling):
    """One exact Newton step (linear problem) with the penalty coupling
    folded into residual and tangent."""
    mask = spline.mask
    U0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
    r = spline.assemble_vector(_res, U=U0) + mask * coupling.residual(U0)
    A = spline.assemble_matrix(_res, U=U0)
    Kc = jax.jacfwd(lambda uu: mask * coupling.residual(uu))(U0)
    return U0 - jnp.linalg.solve(A + Kc, r)


def test_interface_area_and_geometry_check():
    spline, basis = _two_patch_spline(2, 4, 6)
    c = PenaltyInterfaceCoupling(spline, 0, (0, 1), 1, (0, 0), penalty=1.0)
    assert np.isclose(c.area, 1.0, rtol=1e-12)
    # wrong side pairing must be caught by the geometric-coincidence check
    try:
        PenaltyInterfaceCoupling(spline, 0, (0, 0), 1, (0, 0), penalty=1.0)
    except ValueError as e:
        assert "coincide" in str(e)
    else:
        raise AssertionError("geometric mismatch not detected")


def test_nonmatching_penalty_poisson_converges():
    p = 2
    errs = []
    for nel in (4, 8, 16):
        spline, basis = _two_patch_spline(p, nel, 3 * nel // 2)
        coupling = PenaltyInterfaceCoupling(
            spline, 0, (0, 1), 1, (0, 0), penalty=1e8)
        U = _solve_coupled(spline, coupling)
        err = float(spline.errornorm(U, lambda ctx: _soln(ctx.x),
                                     rationalize=False))
        errs.append(err)
        # interface jump at the penalty-consistency scale
        assert float(coupling.jump_norm(U)) < 1e-6
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    assert errs[-1] < 5e-5, errs
    assert min(rates) > p + 0.6, (errs, rates)


def test_nitsche_interface_optimal_rate():
    """Consistent (symmetric Nitsche) coupling at the stability-scale
    penalty beta ~ C p^2/h: optimal convergence with no consistency
    floor."""
    from tigar_tpu.coupling import NitscheInterfaceCoupling
    p = 2
    errs = []
    for nel in (4, 8, 16):
        spline, basis = _two_patch_spline(p, nel, 3 * nel // 2)
        beta = 20.0 * p * p * nel
        coupling = NitscheInterfaceCoupling(
            spline, 0, (0, 1), 1, (0, 0), beta=beta)
        U = _solve_coupled(spline, coupling)
        errs.append(float(spline.errornorm(U, lambda ctx: _soln(ctx.x),
                                           rationalize=False)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    assert errs[-1] < 5e-5, errs
    assert min(rates) > p + 0.6, (errs, rates)


def _soln_flux(x):
    """Manufactured solution with NONZERO normal flux at the x=1 interface
    (the symmetric sin(pi x/2) solution has du/dx(1) = 0, which hides the
    penalty method's consistency error): u = (-x^3+x^2+2x) sin(pi y)."""
    f = -x[0] ** 3 + x[0] ** 2 + 2.0 * x[0]
    return f * jnp.sin(jnp.pi * x[1])


def _res_flux(ctx, u, v):
    x = ctx.x
    f = -x[0] ** 3 + x[0] ** 2 + 2.0 * x[0]
    rhs = (6.0 * x[0] - 2.0 + jnp.pi ** 2 * f) * jnp.sin(jnp.pi * x[1])
    return jnp.sum(ctx.grad(u) * ctx.grad(v)) - rhs * v.val


def _solve_coupled_form(spline, coupling, form):
    mask = spline.mask
    U0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
    r = spline.assemble_vector(form, U=U0) + mask * coupling.residual(U0)
    A = spline.assemble_matrix(form, U=U0)
    Kc = jax.jacfwd(lambda uu: mask * coupling.residual(uu))(U0)
    return U0 - jnp.linalg.solve(A + Kc, r)


def test_nitsche_no_consistency_floor():
    """At the same moderate beta, the consistent Nitsche coupling must be
    far more accurate than pure penalty (whose error floor is
    O(flux/beta)); measured at beta=300, nel=16: penalty 6.6e-4 vs
    Nitsche 3.6e-5 -- and the Nitsche result even beats the penalty
    beta->inf limit (8.7e-5), which over-constrains the non-matching
    jump."""
    from tigar_tpu.coupling import NitscheInterfaceCoupling
    p, nel = 2, 16
    beta = 300.0

    spline_p, _ = _two_patch_spline(p, nel, 3 * nel // 2)
    c_pen = PenaltyInterfaceCoupling(
        spline_p, 0, (0, 1), 1, (0, 0), penalty=beta)
    e_pen = float(spline_p.errornorm(
        _solve_coupled_form(spline_p, c_pen, _res_flux),
        lambda ctx: _soln_flux(ctx.x), rationalize=False))

    spline_n, _ = _two_patch_spline(p, nel, 3 * nel // 2)
    c_nit = NitscheInterfaceCoupling(
        spline_n, 0, (0, 1), 1, (0, 0), beta=beta)
    e_nit = float(spline_n.errornorm(
        _solve_coupled_form(spline_n, c_nit, _res_flux),
        lambda ctx: _soln_flux(ctx.x), rationalize=False))

    assert e_nit < 0.2 * e_pen, (e_nit, e_pen)
    assert e_nit < 1e-4, e_nit


def test_flipped_interface_parameterization():
    """Reversing patch B's free direction and declaring flips=(True,)
    must give the identical coupled solution."""
    p, nel = 2, 6
    spline, basis = _two_patch_spline(p, nel, nel + 2)
    c_plain = PenaltyInterfaceCoupling(
        spline, 0, (0, 1), 1, (0, 0), penalty=1e8)
    U_ref = _solve_coupled(spline, c_plain)

    # rebuild patch B with its y-direction control net reversed (same
    # geometry, opposite parameterization)
    pa = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    pb = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel),
                                     uniform_knots(p, 0.0, 1.0, nel + 2)])
    basis2 = MultiPatchBSplineBasis([pa, pb])

    def bnet(patch, x_off, flip_y):
        g = patch.greville_points()
        B = np.ones((g.shape[0], 3))
        B[:, 0] = g[:, 0] + x_off
        B[:, 1] = 1.0 - g[:, 1] if flip_y else g[:, 1]
        return B

    cm2 = MultiPatchControlMesh(basis2, [bnet(basis2.patches[0], 0.0, False),
                                         bnet(basis2.patches[1], 1.0, True)])
    gen2 = EqualOrderSpline(1, cm2)
    gen2.add_zero_dofs(0, basis2.patch_side_dofs(0, 0, 0))
    gen2.add_zero_dofs(0, basis2.patch_side_dofs(1, 0, 1))
    for patch in (0, 1):
        for s in (0, 1):
            gen2.add_zero_dofs(0, basis2.patch_side_dofs(patch, 1, s))
    spline2 = ExtractedSpline(gen2, quad_degree=2 * p)
    c_flip = PenaltyInterfaceCoupling(
        spline2, 0, (0, 1), 1, (0, 0), penalty=1e8, flips=(True,))
    U_flip = _solve_coupled(spline2, c_flip)

    e_ref = float(spline.errornorm(U_ref, lambda ctx: _soln(ctx.x),
                                   rationalize=False))
    e_flip = float(spline2.errornorm(U_flip, lambda ctx: _soln(ctx.x),
                                     rationalize=False))
    # identical up to the conditioning of the penalty-1e8 direct solve
    assert abs(e_ref - e_flip) < 1e-6 * max(e_ref, 1e-16)


def test_nitsche_different_degrees_strongly_nonmatching():
    """Merged-breakpoint interface quadrature (round-3): coupling must
    converge at the optimal rate of the LOWER degree even with strongly
    non-matching sides -- different element counts (n vs 2n+1, mutually
    prime spacings) AND different degrees (p=2 vs p=3).  The A-side-only
    quadrature of round 2 underintegrates side B's basis here."""
    from tigar_tpu.coupling import NitscheInterfaceCoupling
    p_a, p_b = 2, 3
    errs = []
    for nel in (4, 8, 16):
        pa = TensorBSplineBasis(
            [p_a, p_a], [uniform_knots(p_a, 0.0, 1.0, nel)] * 2)
        pb = TensorBSplineBasis(
            [p_b, p_b], [uniform_knots(p_b, 0.0, 1.0, nel),
                         uniform_knots(p_b, 0.0, 1.0, 2 * nel + 1)])
        basis = MultiPatchBSplineBasis([pa, pb])

        def bnet(patch, x_off):
            g = patch.greville_points()
            B = np.ones((g.shape[0], 3))
            B[:, 0] = g[:, 0] + x_off
            B[:, 1] = g[:, 1]
            return B

        cm = MultiPatchControlMesh(basis, [bnet(basis.patches[0], 0.0),
                                           bnet(basis.patches[1], 1.0)])
        gen = EqualOrderSpline(1, cm)
        gen.add_zero_dofs(0, basis.patch_side_dofs(0, 0, 0))
        gen.add_zero_dofs(0, basis.patch_side_dofs(1, 0, 1))
        for patch in (0, 1):
            for s in (0, 1):
                gen.add_zero_dofs(0, basis.patch_side_dofs(patch, 1, s))
        spline = ExtractedSpline(gen, quad_degree=2 * p_b)
        beta = 20.0 * p_b * p_b * (2 * nel + 1)
        coupling = NitscheInterfaceCoupling(
            spline, 0, (0, 1), 1, (0, 0), beta=beta)
        U = _solve_coupled_form(spline, coupling, _res_flux)
        errs.append(float(spline.errornorm(
            U, lambda ctx: _soln_flux(ctx.x), rationalize=False)))
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    assert errs[-1] < 1e-4, errs
    assert min(rates) > p_a + 0.6, (errs, rates)


def _two_patch_shell(p, nel, load):
    """Two coplanar KL plate patches [0,1]x[0,1] and [1,2]x[0,1] with
    non-matching interface meshes (nel vs nel+2 along y), clamped at
    x=0, uniform transverse load."""
    pa = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    pb = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel),
                                     uniform_knots(p, 0.0, 1.0, nel + 2)])
    basis = MultiPatchBSplineBasis([pa, pb])

    def bnet(patch, x_off):
        g = patch.greville_points()
        B = np.zeros((g.shape[0], 4))
        B[:, 0] = g[:, 0] + x_off
        B[:, 1] = g[:, 1]
        B[:, 3] = 1.0
        return B

    cm = MultiPatchControlMesh(basis, [bnet(basis.patches[0], 0.0),
                                       bnet(basis.patches[1], 1.0)])
    gen = EqualOrderSpline(3, cm)
    clamp = np.concatenate([basis.patch_side_dofs(0, 0, 0, n_layers=2)])
    for i in range(3):
        gen.add_zero_dofs(i, clamp)
    from tigar_tpu.models.shell import precompute_shell_reference
    return (precompute_shell_reference(
        ExtractedSpline(gen, quad_degree=2 * p, nders=2)), basis)


def test_shell_interface_coupling():
    """Two-patch cantilever KL plate with a non-matching interface at
    x=1: displacement+rotation penalty coupling must reproduce the
    single-patch tip deflection to ~1%, while displacement-only coupling
    leaves a hinge (visibly larger tip deflection).  Reference has no
    shell patch coupling at all (BSplines.py:656-659 TODO)."""
    from tigar_tpu.coupling import ShellInterfaceCoupling
    from tigar_tpu.models.shell import (precompute_shell_reference,
                                        svk_shell_residual)
    from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
    p, nel = 2, 6
    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.05, 1.0e-3

    def res(ctx, u, v):
        return svk_shell_residual(ctx, u, v, E_mod, nu, h_th) - q * v.val[2]

    # single-patch reference on [0,2]x[0,1]
    cm1 = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 2.0, 2 * nel),
                 uniform_knots(p, 0.0, 1.0, nel)], extra_dim=1)
    gen1 = EqualOrderSpline(3, cm1)
    b1 = cm1.scalar_basis()
    for i in range(3):
        gen1.add_zero_dofs(i, b1.side_dofs(0, 0, n_layers=2))
    sp1 = precompute_shell_reference(
        ExtractedSpline(gen1, quad_degree=2 * p, nders=2))
    U1 = sp1.solve_nonlinear_variational_problem(res)
    w_ref = float(sp1.evaluate(U1, np.asarray([[2.0, 0.5]]))[0, 2])
    assert abs(w_ref) > 1e-6  # sanity: load actually bends the plate

    sp2, basis = _two_patch_shell(p, nel, q)
    h_el = 1.0 / nel
    pd = 1e2 * E_mod * h_th / h_el
    pr = 1e2 * E_mod * h_th ** 3 / h_el

    def solve_with(coupling):
        mask = sp2.mask
        U = jnp.zeros(sp2.ndof, dtype=sp2.dtype)
        for _ in range(8):
            r = sp2.assemble_vector(res, U=U) + mask * coupling.residual(U)
            if float(jnp.linalg.norm(r)) < 1e-9:
                break
            A = sp2.assemble_matrix(res, U=U)
            Kc = jax.jacfwd(lambda uu: mask * coupling.residual(uu))(U)
            U = U - jnp.linalg.solve(A + Kc, r)
        return U

    c_full = ShellInterfaceCoupling(sp2, 0, (0, 1), 1, (0, 0),
                                    penalty_disp=pd, penalty_rot=pr)
    U_full = solve_with(c_full)
    # evaluate on patch 1 at its local (1, 0.5) == physical (2, 0.5)
    w_full = float(sp2.evaluate(U_full, np.asarray([[1.0, 0.5]]),
                                patch=1)[0, 2])
    assert abs(w_full - w_ref) < 0.02 * abs(w_ref), (w_full, w_ref)
    assert float(c_full.rotation_jump_norm(U_full)) < 1e-5

    # displacement-only coupling: hinge at the interface
    c_hinge = ShellInterfaceCoupling(sp2, 0, (0, 1), 1, (0, 0),
                                     penalty_disp=pd, penalty_rot=0.0)
    U_hinge = solve_with(c_hinge)
    w_hinge = float(sp2.evaluate(U_hinge, np.asarray([[1.0, 0.5]]),
                                 patch=1)[0, 2])
    assert abs(w_hinge) > 1.5 * abs(w_ref), (w_hinge, w_ref)
