"""Probe: consistent KL-shell coupling (EnergyNitscheCoupling on
svk_psi_surface) vs displacement+rotation penalty on a two-patch
cantilever plate with a non-matching interface."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import (TensorBSplineBasis,
                                      ExplicitBSplineControlMesh)
from tigar_tpu.models.multipatch import (MultiPatchBSplineBasis,
                                         MultiPatchControlMesh)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (precompute_shell_reference,
                                    svk_shell_residual, svk_psi_surface)
from tigar_tpu.coupling import ShellInterfaceCoupling
from tigar_tpu.interface import EnergyNitscheCoupling

P = 3
NEL = int(__import__("os").environ.get("NEL", "6"))
E_MOD, NU, H_TH, Q = 1.0e7, 0.3, 0.05, 1.0e-3


def res(ctx, u, v):
    return svk_shell_residual(ctx, u, v, E_MOD, NU, H_TH) - Q * v.val[2]


def shell_energy(ctx, u, params):
    return svk_psi_surface(ctx, u, params["E"], params["nu"], params["h"])


def two_patch_shell(p, nel):
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
    clamp = basis.patch_side_dofs(0, 0, 0, n_layers=2)
    for i in range(3):
        gen.add_zero_dofs(i, clamp)
    return (precompute_shell_reference(
        ExtractedSpline(gen, quad_degree=2 * p, nders=2)), basis)


def single_patch_ref(p, nel_x, nel_y):
    cm1 = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 2.0, nel_x),
                 uniform_knots(p, 0.0, 1.0, nel_y)], extra_dim=1)
    gen1 = EqualOrderSpline(3, cm1)
    b1 = cm1.scalar_basis()
    for i in range(3):
        gen1.add_zero_dofs(i, b1.side_dofs(0, 0, n_layers=2))
    sp1 = precompute_shell_reference(
        ExtractedSpline(gen1, quad_degree=2 * p, nders=2))
    U1 = sp1.solve_nonlinear_variational_problem(res)
    return sp1, U1


def solve_with(sp2, coupling):
    mask = sp2.mask
    U = jnp.zeros(sp2.ndof, dtype=sp2.dtype)
    for it in range(12):
        r = sp2.assemble_vector(res, U=U) + mask * coupling.residual(U)
        rn = float(jnp.linalg.norm(r))
        if rn < 1e-9:
            break
        A = sp2.assemble_matrix(res, U=U)
        Kc = jax.jacfwd(lambda uu: mask * coupling.residual(uu))(U)
        U = U - jnp.linalg.solve(A + Kc, r)
    return U, rn, it


def err_vs_ref(sp2, U, sp1, U1):
    """RMS displacement difference at a physical sample grid."""
    xs = np.linspace(0.05, 0.95, 9)
    ys = np.linspace(0.05, 0.95, 7)
    tot, n = 0.0, 0
    scale = 0.0
    for patch, xoff in ((0, 0.0), (1, 1.0)):
        pts = np.array([[x, y] for x in xs for y in ys])
        u2 = np.asarray(sp2.evaluate(U, pts, patch=patch))
        pts1 = pts.copy()
        pts1[:, 0] = pts[:, 0] + xoff
        u1 = np.asarray(sp1.evaluate(U1, pts1))
        tot += np.sum((u2 - u1) ** 2)
        scale += np.sum(u1 ** 2)
        n += pts.shape[0]
    return np.sqrt(tot / scale)


if __name__ == "__main__":
    t0 = time.time()
    sp1, U1 = single_patch_ref(P, 4 * NEL, 2 * NEL)   # fine reference
    print(f"fine single-patch reference solved [{time.time()-t0:.1f}s]")

    sp2, basis = two_patch_shell(P, NEL)
    h_el = 1.0 / NEL
    D = E_MOD * H_TH ** 3 / 12.0 / (1 - NU ** 2)
    beta_scale = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0

    pd = beta_scale * (D / h_el ** 3 + E_MOD * H_TH / h_el)
    pr = beta_scale * D / h_el

    for name, make in [
        ("penalty (same beta)", lambda: ShellInterfaceCoupling(
            sp2, 0, (0, 1), 1, (0, 0), penalty_disp=pd, penalty_rot=pr)),
        ("penalty (beta x 1e5)", lambda: ShellInterfaceCoupling(
            sp2, 0, (0, 1), 1, (0, 0), penalty_disp=pd * 1e5,
            penalty_rot=pr * 1e5)),
        ("nitsche-from-energy", lambda: EnergyNitscheCoupling(
            sp2, 0, (0, 1), 1, (0, 0), shell_energy, beta_d=pd, beta_r=pr,
            w_order=2, params={"E": E_MOD, "nu": NU, "h": H_TH})),
    ]:
        t0 = time.time()
        c = make()
        U, rn, it = solve_with(sp2, c)
        e = err_vs_ref(sp2, U, sp1, U1)
        w_tip = float(sp2.evaluate(U, np.asarray([[1.0, 0.5]]),
                                   patch=1)[0, 2])
        print(f"{name:24s} err={e:.4e} tip={w_tip:+.6e} "
              f"|r|={rn:.2e} it={it} [{time.time()-t0:.1f}s]")
