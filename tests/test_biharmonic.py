"""Integration test: biharmonic problem on quartic C^3 B-splines -- mirrors
demos/biharmonic/biharmonic.py:29-139.  Uses second-derivative tabulation,
2-layer clamped Dirichlet DoFs, and the energy-norm convergence measure
(L2 is suboptimal for this problem; biharmonic.py:22-27).
"""

import math

import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline


def exact(x):
    return (jnp.cos(jnp.pi * x[0]) + 1.0) * (jnp.cos(jnp.pi * x[1]) + 1.0)


def lap_exact(x):
    return jnp.trace(jax.hessian(exact)(x))


def bilap_exact(x):
    return jnp.trace(jax.hessian(lap_exact)(x))


def biharmonic_energy_error(p, nel):
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, -1.0, 1.0, nel)] * 2)
    sp = EqualOrderSpline(1, cm)
    basis = sp.get_scalar_spline()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, basis.side_dofs(d, s, n_layers=2))
    spline = ExtractedSpline(sp, quad_degree=2 * p, nders=2)

    def a(ctx, u, v):
        return ctx.lap(u) * ctx.lap(v)

    def L(ctx, v):
        return bilap_exact(ctx.x) * v.val

    U = spline.solve_linear_variational_problem(a, rhs_form=L)

    def err_density(ctx, u):
        e = ctx.lap(u) - lap_exact(ctx.x)
        return e * e

    return float(jnp.sqrt(spline.assemble_functional(err_density, U=U)))


def test_biharmonic_energy_convergence():
    p = 4
    errs = [biharmonic_energy_error(p, n) for n in (4, 8, 16)]
    rates = [math.log(errs[i - 1] / errs[i]) / math.log(2.0)
             for i in range(1, len(errs))]
    # optimal energy (H^2) rate for degree p is p-1 = 3
    # (errors are absolute on the bi-unit domain; ||lap exact||_L2 ~ 30)
    assert errs[-1] < 2e-2
    for r in rates:
        assert r > (p - 1) - 0.3, f"suboptimal energy rate {r}"
