"""Per-term measure options (models/extracted.py FormTerm/term):
subdomain predicates (the reference's marked tIGArMeasure subdomains,
calculusUtils.py:397-404) and per-term quadrature degree
(calculusUtils.py:379-381).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline, term


def _poisson_neumann_spline(nel, p=3):
    cm = ExplicitBSplineControlMesh([p, p],
                                    [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = cm.scalar_basis()
    # Dirichlet on x=0, y=0, y=1; side x=1 is Neumann
    sp.add_zero_dofs(0, basis.side_dofs(0, 0))
    sp.add_zero_dofs(0, basis.side_dofs(1, 0))
    sp.add_zero_dofs(0, basis.side_dofs(1, 1))
    return ExtractedSpline(sp, quad_degree=2 * p)


def _exact(x):
    return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])


def _f_rhs(x):
    return 2.0 * jnp.pi ** 2 * _exact(x)


def _g_flux(x):
    # outward normal flux du/dn on side x=1
    return jnp.pi * jnp.cos(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])


def _vol(ctx, u, v):
    return jnp.dot(ctx.grad(u), ctx.grad(v)) - _f_rhs(ctx.x) * v.val


def _neu(ctx, u, v):
    return -_g_flux(ctx.x) * v.val


def test_half_side_neumann_masks_are_exact_partition():
    """Two complementary where-masks on one side must reproduce the
    full-side boundary vector exactly."""
    spline = _poisson_neumann_spline(8)
    U = jnp.zeros(spline.ndof)
    full = {("ds", 0, 1): _neu}
    lower = lambda ctx: ctx.x[1] < 0.5
    upper = lambda ctx: ctx.x[1] >= 0.5
    split = {("ds", 0, 1): term(_neu, where=lower),
             ("ds", 0, 1, "b"): term(_neu, where=upper)}
    # two terms on the same domain need distinct dict keys; any key that
    # is not "dx"/"ds" and starts with ("ds", dir, side) is passed through
    r_full = spline.assemble_vector({"dx": _vol, **full}, U=U)
    r_split = spline.assemble_vector(
        {"dx": _vol,
         ("ds", 0, 1): term(_neu, where=lower),
         ("ds", 0, 1, "b"): term(_neu, where=upper)}, U=U)
    assert float(jnp.max(jnp.abs(r_full - r_split))) < 1e-14 * \
        float(jnp.max(jnp.abs(r_full)))


def test_mixed_dirichlet_neumann_half_side_optimal_rate():
    """Poisson with Neumann data applied as two where-masked half-side
    terms; optimal L2 rate p+1 (VERDICT round-1 item 8 done-criterion)."""
    errs = []
    for nel in (8, 16):
        spline = _poisson_neumann_spline(nel)
        form = {
            "dx": _vol,
            ("ds", 0, 1): term(_neu, where=lambda ctx: ctx.x[1] < 0.5),
            ("ds", 0, 1, "hi"): term(_neu,
                                     where=lambda ctx: ctx.x[1] >= 0.5),
        }
        U = spline.solve_linear_variational_problem(form)
        errs.append(float(spline.errornorm(U, lambda ctx: _exact(ctx.x))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.7, f"suboptimal rate {rate} (errors {errs})"


def test_per_term_quadrature_degree():
    """A term with its own quadrature degree integrates with its own rule:
    x^6 over the unit square is exact at quad_degree>=6 and inexact with
    the spline's default 2-point rule."""
    p = 1
    cm = ExplicitBSplineControlMesh([p, p],
                                    [uniform_knots(p, 0.0, 1.0, 1)] * 2)
    spline = ExtractedSpline(EqualOrderSpline(1, cm), quad_degree=2)

    def x6(ctx, v):
        return ctx.x[0] ** 6 * jnp.sum(jnp.atleast_1d(v.val))

    exact = 1.0 / 7.0
    # partition of unity: sum of the load vector = integral of x^6
    b_default = spline.assemble_vector(x6, apply_bcs=False)
    b_hi = spline.assemble_vector({"dx": term(x6, quad_degree=7)},
                                  apply_bcs=False)
    v_default = float(jnp.sum(b_default))
    v_hi = float(jnp.sum(b_hi))
    assert abs(v_hi - exact) < 1e-14
    assert abs(v_default - exact) > 1e-4  # 2-pt Gauss cannot do degree 6
    # distinct assemblers (quadrature rules) must have been built
    npts = {a.nq for a in spline._assemblers.values()}
    assert len(npts) >= 2
