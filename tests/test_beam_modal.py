"""Integration test: cantilevered Euler-Bernoulli beam modal analysis on C^1
cubic splines -- mirrors demos/euler-bernoulli-beam/modal-analysis.py.
Natural frequencies must match the analytic beam spectrum
omega_n = (beta_n L)^2 sqrt(EI/(mu L^4)).
"""

import math

import jax.numpy as jnp
import numpy as np

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.solvers.eigen import smallest_modes

# roots of cos(bL)cosh(bL) = -1 (clamped-free beam)
BETA_L = [1.87510406871196, 4.69409113297417, 7.85475743823761,
          10.99554073487547, 14.13716839104647]


def test_beam_natural_frequencies():
    p, nel = 3, 100
    cm = ExplicitBSplineControlMesh([p], [uniform_knots(p, 0.0, 1.0, nel)])
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    # clamped: 2 layers of control points at the left end
    sp.add_zero_dofs(0, basis.side_dofs(0, 0, n_layers=2))
    spline = ExtractedSpline(sp, quad_degree=2 * p, nders=2)

    E = I = mu = 1.0

    def a(ctx, u, v):
        return E * I * ctx.lap(u) * ctx.lap(v)

    def b(ctx, u, v):
        return mu * u.val * v.val

    # BC diagonal shifted high so constrained modes land at the top of the
    # spectrum (reference: modal-analysis.py:66-69, diag=1/DOLFIN_EPS)
    A = spline.assemble_matrix(a, diag=1e14)
    B = spline.assemble_matrix(b, diag=1.0)
    lam, modes = smallest_modes(A, B, 5)
    omega = np.sqrt(np.asarray(lam))
    exact = np.asarray(BETA_L) ** 2
    rel_err = np.abs(omega - exact) / exact
    assert np.all(rel_err < 1e-6), rel_err

    # sanity: first mode is zero at the clamped end and has a free tip
    u0 = np.asarray(modes[:, 0])
    assert abs(u0[0]) < 1e-10 and abs(u0[1]) < 1e-10
