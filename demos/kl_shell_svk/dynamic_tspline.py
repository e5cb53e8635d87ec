"""Dynamic St. Venant-Kirchhoff Kirchhoff-Love shell from Rhino T-spline
extraction data, with generalized-alpha time integration and penalty contact
against the z=0 plane.  Mirror of demos/kl-shell-svk/dynamic-tspline.py.

Input: a Rhino T-spline extraction file (e.g. "sphere.iga" from the Rhino
T-splines plugin).  If absent, a bi-cubic B-spline plate is generated and
exported to the same format so the demo is self-contained.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

from tigar_tpu.models.tsplines import (RhinoTSplineControlMesh,
                                       bspline_to_rhino_extraction)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import svk_psi_surface
from tigar_tpu.forms import deriv
from tigar_tpu.timeint import GeneralizedAlphaIntegrator
from tigar_tpu.io import write_vtk, write_pvd

FNAME = sys.argv[1] if len(sys.argv) > 1 else "sphere.iga"
if not os.path.isfile(FNAME):
    print(f"'{FNAME}' not found; generating a falling-plate input instead.")
    from tigar_tpu.ops.knots import uniform_knots
    from tigar_tpu.models.bspline import TensorBSplineBasis
    basis = TensorBSplineBasis([3, 3], [uniform_knots(3, 0.0, 1.0, 6)] * 2)
    gp = basis.greville_points()
    bnet = np.zeros((basis.ncp, 4))
    bnet[:, :2] = gp
    bnet[:, 2] = 0.05
    bnet[:, 3] = 1.0
    FNAME = "plate.iga"
    bspline_to_rhino_extraction(basis, bnet, FNAME)

print("Generating extraction data...")
controlMesh = RhinoTSplineControlMesh(FNAME)
gen = EqualOrderSpline(3, controlMesh)

# zero BCs by control-point location: constrain everything at z < eps
# (the plate region in the sphere demo; the edges for the generated plate)
eps = 1e-9
if os.path.basename(FNAME) == "plate.iga":
    where = lambda x: (x[0] < eps or x[0] > 1 - eps
                       or x[1] < eps or x[1] > 1 - eps)
else:
    where = lambda x: x[2] < eps
for i in range(3):
    gen.add_zero_dofs_by_location(where, i)

print("Forming extracted spline...")
spline = ExtractedSpline(gen, quad_degree=6, nders=2)
spline.set_solver_options(max_iters=100, relative_tolerance=1e-3)

E_mod, nu, h_th = 3.0e4, 0.3, 0.03
DENS = 10.0
PENALTY = 1.0e8
DELTA_T = 1.0e-3
N_STEPS = int(os.environ.get("N_STEPS", "50"))

U0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
Udot0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
Udot0 = Udot0.at[spline.space.field_slice(2)].set(-10.0)  # falling
Uddot0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
timeInt = GeneralizedAlphaIntegrator(0.5, DELTA_T, U0, (U0, Udot0, Uddot0))


def res(ctx, s, z):
    y_alpha = ctx.rationalize(timeInt.x_alpha_of(s))
    yddot_alpha = ctx.rationalize(timeInt.xddot_alpha_of(s))
    zz = ctx.rationalize(z)
    dWint = deriv(lambda y: svk_psi_surface(ctx, y, E_mod, nu, h_th),
                  y_alpha, zz)
    dWmass = DENS * h_th * jnp.sum(yddot_alpha.val * zz.val)
    xz = ctx.x[2] + y_alpha.val[2]
    gap = jnp.where(xz < 0.0, -xz, 0.0)
    dWext = -PENALTY * gap * zz.val[2]
    return dWmass + dWint + dWext


series = []
for step in range(N_STEPS):
    print(f"------- Time step {step + 1} , t = {timeInt.t} -------")
    state = {"u": timeInt.x, "x_old": timeInt.x_old,
             "xdot_old": timeInt.xdot_old, "xddot_old": timeInt.xddot_old}
    timeInt.x = spline.solve_nonlinear_variational_problem(res, U0=state,
                                                           log=True)
    timeInt.advance()
    fn = f"results_disp_{step:04d}.vtk"
    write_vtk(fn, spline, fields={"d": timeInt.x_old})
    series.append((timeInt.t, fn))
write_pvd("results_disp.pvd", series)
