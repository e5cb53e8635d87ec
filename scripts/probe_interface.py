"""Probe: EnergyNitscheCoupling auto-derived flux vs hand Nitsche-Laplace,
plus a two-patch KL plate with the consistent shell coupling."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import TensorBSplineBasis
from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                         MultiPatchControlMesh)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.coupling import NitscheInterfaceCoupling
from tigar_tpu.interface import EnergyNitscheCoupling


def two_patch_spline(p, nel_a, nel_b_y, nders=1):
    pa = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel_a)] * 2)
    pb = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel_a),
                                     uniform_knots(p, 0.0, 1.0, nel_b_y)])
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
    return ExtractedSpline(gen, quad_degree=2 * p, nders=nders), basis


def soln_flux(x):
    f = -x[0] ** 3 + x[0] ** 2 + 2.0 * x[0]
    return f * jnp.sin(jnp.pi * x[1])


def res_flux(ctx, u, v):
    x = ctx.x
    f = -x[0] ** 3 + x[0] ** 2 + 2.0 * x[0]
    rhs = (6.0 * x[0] - 2.0 + jnp.pi ** 2 * f) * jnp.sin(jnp.pi * x[1])
    return jnp.sum(ctx.grad(u) * ctx.grad(v)) - rhs * v.val


def solve_coupled(spline, coupling, form):
    mask = spline.mask
    U0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
    r = spline.assemble_vector(form, U=U0) + mask * coupling.residual(U0)
    A = spline.assemble_matrix(form, U=U0)
    Kc = jax.jacfwd(lambda uu: mask * coupling.residual(uu))(U0)
    return U0 - jnp.linalg.solve(A + Kc, r)


def poisson_energy(ctx, u, params):
    g = u.g @ ctx.pinv
    return 0.5 * jnp.sum(g * g)


if __name__ == "__main__":
    p, nel = 2, 8
    beta = 300.0

    sp_h, _ = two_patch_spline(p, nel, 3 * nel // 2)
    c_hand = NitscheInterfaceCoupling(sp_h, 0, (0, 1), 1, (0, 0), beta=beta)
    U_hand = solve_coupled(sp_h, c_hand, res_flux)
    e_hand = float(sp_h.errornorm(U_hand, lambda ctx: soln_flux(ctx.x),
                                  rationalize=False))

    sp_a, _ = two_patch_spline(p, nel, 3 * nel // 2)
    c_auto = EnergyNitscheCoupling(sp_a, 0, (0, 1), 1, (0, 0),
                                   poisson_energy, beta_d=beta, w_order=1)
    U_auto = solve_coupled(sp_a, c_auto, res_flux)
    e_auto = float(sp_a.errornorm(U_auto, lambda ctx: soln_flux(ctx.x),
                                  rationalize=False))

    dU = float(jnp.linalg.norm(U_hand - U_auto)
               / jnp.linalg.norm(U_hand))
    print(f"hand Nitsche err={e_hand:.6e}  auto err={e_auto:.6e}  "
          f"rel dU={dU:.3e}")
