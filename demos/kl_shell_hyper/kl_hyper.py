"""Quasi-static inflation of a clamped incompressible neo-Hookean
Kirchhoff-Love membrane under follower pressure, with exact plane-stress
pressure Lagrange multiplier and 4-point through-thickness Gauss quadrature.
Mirror of demos/kl-shell-hyper/kl-hyper.py.
"""

import os

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.ops.quadrature import gauss_rule_interval
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (midsurface_geometry, kl_strain_at,
                                    incompressible_psi)
from tigar_tpu.ops.smallmat import det_small
from tigar_tpu.forms import deriv
from tigar_tpu.timeint import LoadStepper
from tigar_tpu.io import write_vtk, write_pvd

NEL = int(os.environ.get("NEL", "10"))
N_STEPS = int(os.environ.get("N_STEPS", "100"))
degs = [2, 2]

mesh = ExplicitBSplineControlMesh(
    degs, [uniform_knots(2, -1.0, 1.0, NEL)] * 2, extra_dim=1)
gen = EqualOrderSpline(3, mesh)
basis = mesh.scalar_basis()
for side in (0, 1):
    for direction in (0, 1):
        dofs = basis.side_dofs(direction, side, n_layers=2)  # clamped
        for i in range(3):
            gen.add_zero_dofs(i, dofs)

spline = ExtractedSpline(gen, quad_degree=4, nders=2)
spline.set_solver_options(max_iters=100)

mu_nh = 1.0e4          # neo-Hookean shear modulus
h_th = 0.03            # shell thickness
PRESSURE = 1.0e2
stepper = LoadStepper(1.0 / N_STEPS)

xi2, w_th = gauss_rule_interval(4, h_th)


def psi_el(E):
    """Neo-Hookean elastic potential (kl-hyper.py:167-173)."""
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
    area_ratio = jnp.sqrt(det_small(cur.a) / det_small(ref.a))
    dWext = -params["load"] * area_ratio * jnp.dot(cur.a2, v.val)
    return dWint + dWext


U = jnp.zeros(spline.ndof, dtype=spline.dtype)
series = []
for step in range(N_STEPS):
    print(f"------- Step: {step + 1} , t = {stepper.t} -------")
    U = spline.solve_nonlinear_variational_problem(
        res, U0=U, params={"load": PRESSURE * stepper.t}, log=True)
    stepper.advance()
    if step % 10 == 0 or step == N_STEPS - 1:
        fn = f"results_disp_{step:04d}.vtk"
        write_vtk(fn, spline, fields={"d": U})
        series.append((stepper.t, fn))

write_pvd("results_disp.pvd", series)
center = spline.evaluate(U, np.asarray([[0.0, 0.0]]), rationalize=False)
print("final center displacement:", center)
