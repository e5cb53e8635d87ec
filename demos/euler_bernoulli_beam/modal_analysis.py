"""Modal analysis of a cantilevered Euler-Bernoulli beam with a pure
displacement (C^1 cubic spline) formulation; natural frequencies compared
with the analytic spectrum.  Mirror of
demos/euler-bernoulli-beam/modal-analysis.py.
"""

import math

import numpy as np

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.solvers.eigen import smallest_modes

p = 3
NEL = 100
L = 1.0

mesh = ExplicitBSplineControlMesh([p], [uniform_knots(p, 0.0, L, NEL)])
gen = EqualOrderSpline(1, mesh)
basis = gen.get_scalar_spline()
# clamped end: two layers of control points
gen.add_zero_dofs(0, basis.side_dofs(0, 0, n_layers=2))

spline = ExtractedSpline(gen, quad_degree=2 * p, nders=2)

E = I = mu = 1.0


def a(ctx, u, v):
    return E * I * ctx.lap(u) * ctx.lap(v)


def b(ctx, u, v):
    return mu * u.val * v.val


# BC diag shifted high so constrained modes go to the top of the spectrum
A = spline.assemble_matrix(a, diag=1e14)
B = spline.assemble_matrix(b, diag=1.0)

lam, modes = smallest_modes(A, B, 5)
beta_l = [1.87510406871196, 4.69409113297417, 7.85475743823761,
          10.99554073487547, 14.13716839104647]
for n in range(5):
    omega = math.sqrt(float(lam[n]))
    print(f"omega_{n} = {omega}   (analytic: {beta_l[n] ** 2})")
