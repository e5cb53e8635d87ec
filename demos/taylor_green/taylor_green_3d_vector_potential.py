"""3D Taylor-Green flow with the velocity represented as the curl of an
N-type (curl-conforming) vector potential: exactly solenoidal by
construction, viscous terms of 4th order in the potential.
Mirror of demos/taylor-green/taylor-green-3d-vector-potential.py.
"""

import math
import os

import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.compatible import BSplineCompat
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.timeint import GeneralizedAlphaIntegrator

NEL = int(os.environ.get("NEL", "16"))
degs = [1, 1, 1]
kvecs = [uniform_knots(1, 0.0, math.pi, NEL)] * 3
controlMesh = ExplicitBSplineControlMesh(degs, kvecs)
gen = BSplineCompat(controlMesh, "N", degs)
# velocity normal BCs via tangential potential constraints
for field in range(3):
    basis = gen.get_field_spline(field)
    for direction in range(3):
        if field != direction:
            for side in (0, 1):
                gen.add_zero_dofs(field, basis.side_dofs(direction, side))

spline = ExtractedSpline(gen, quad_degree=2, nders=2)
spline.set_solver_options(linear_solver="bicgstab", linear_tol=1e-4,
                          relative_tolerance=1e-3)

TIME_INTERVAL = 16.0
N_STEPS = 8 * NEL
DELTA_T = TIME_INTERVAL / N_STEPS
DENS = 1.0
VISC = DENS / 100.0


def exact_ic(x):
    return jnp.stack([jnp.sin(x[0]) * jnp.cos(x[1]) * jnp.cos(x[2]),
                      -jnp.cos(x[0]) * jnp.sin(x[1]) * jnp.cos(x[2]),
                      0.0 * x[0]])


def curl_field(A):
    """u = curl A and grad(u) from the potential's jet (explicit geometry)."""
    g, h = A.g, A.h
    u = jnp.stack([g[2, 1] - g[1, 2], g[0, 2] - g[2, 0], g[1, 0] - g[0, 1]])
    gu = jnp.stack([h[2, 1, :] - h[1, 2, :],
                    h[0, 2, :] - h[2, 0, :],
                    h[1, 0, :] - h[0, 1, :]])
    return u, gu


print("Projecting velocity IC (projectCurl)...")


def proj_res(ctx, a, b):
    ua, _ = curl_field(a)
    vb, _ = curl_field(b)
    return jnp.sum((ua - exact_ic(ctx.x)) * vb)


A0 = spline.solve_linear_variational_problem(proj_res)
Adot0 = jnp.zeros_like(A0)
timeInt = GeneralizedAlphaIntegrator(1.0, DELTA_T, A0, (A0, Adot0))


def res(ctx, s, b_hat):
    u, gu = curl_field(timeInt.x_alpha_of(s))
    udot, _ = curl_field(timeInt.xdot_alpha_of(s))
    v, gv = curl_field(b_hat)
    eps_u = 0.5 * (gu + gu.T)
    eps_v = 0.5 * (gv + gv.T)
    Du_Dt = udot + gu @ u
    return DENS * jnp.sum(Du_Dt * v) + 2.0 * VISC * jnp.sum(eps_u * eps_v)


def dissipation(A_arr):
    def density(ctx, a):
        _, gu = curl_field(a)
        e = 0.5 * (gu + gu.T)
        return (2.0 * VISC / DENS / math.pi ** 3) * jnp.sum(e * e)
    return float(spline.assemble_functional(density, U=A_arr))


with open("dissipationRate.dat", "w"):
    pass
for step in range(N_STEPS):
    print(f"------- Time step {step + 1} , t = {timeInt.t} -------")
    state = {"u": timeInt.x, "x_old": timeInt.x_old,
             "xdot_old": timeInt.xdot_old}
    timeInt.x = spline.solve_nonlinear_variational_problem(res, U0=state,
                                                           log=True)
    with open("dissipationRate.dat", "a") as f:
        f.write(f"{timeInt.t} {dissipation(timeInt.x)}\n")
    timeInt.advance()
