"""Space-agnostic mixed-precision Newton (solvers/newton_sa.SANewton):
the production solver tier for spaces with no tensor-product structure
(round-4 VERDICT weak #1 closure) -- coo tangents + multilevel-SA
V-cycle preconditioning under the SAME f32-production/f64-polish driver
as StencilNewton.

Three space families: (1) a single-patch shell cross-checked against the
structured-flagship StencilNewton solution, (2) a genuinely unstructured
star T-spline (valence-3 extraordinary point) nonlinear problem
cross-checked against the dense-direct Newton reference, (3) a periodic
(wrapped-connectivity) space."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import (ExplicitBSplineControlMesh,
                                      TensorBSplineBasis)
from tigar_tpu.models.space import EqualOrderSpline, FieldListSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (precompute_shell_reference,
                                    svk_shell_residual, svk_shell_adjoint)
from tigar_tpu.solvers.newton_sa import SANewton
from tigar_tpu.solvers.newton_stencil import StencilNewton
from tigar_tpu.forms import adjoint_of

E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 10.0


def _build_patch(nel, p=2):
    kvecs = [uniform_knots(p, -1.0, 1.0, nel)] * 2
    cm = ExplicitBSplineControlMesh([p, p], kvecs, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    basis = cm.scalar_basis()
    for side in (0, 1):
        for direction in (0, 1):
            dofs = basis.side_dofs(direction, side, n_layers=2)
            for i in range(3):
                sp.add_zero_dofs(i, dofs)
    return precompute_shell_reference(
        ExtractedSpline(sp, quad_degree=2 * p, nders=2))


def _res(ctx, u, v):
    return svk_shell_residual(ctx, u, v, E_mod, nu, h_th) - q * v.val[2]


def _res_adj(ctx, u):
    F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
    return F._replace(val=F.val.at[2].add(-q))


def test_sa_newton_matches_stencil_flagship():
    """On a structured space (where both solvers apply) SANewton must
    reach the same f64 floor and the same solution as the structured
    flagship -- same driver, different tangent/preconditioner tier."""
    spline = _build_patch(8)
    ns_ref = StencilNewton(spline, _res_adj, mg_splines=[_build_patch(4)],
                           cg_iters=40)
    U_ref, rel_ref, _, _ = ns_ref.solve(rtol=1e-9)
    assert rel_ref < 1e-9

    ns = SANewton(spline, _res_adj, cg_iters=60, polish_cg_iters=80,
                  sa_kwargs={"coarse_size": 100})
    U, rel, nit, dU_rel = ns.solve(rtol=1e-9)
    assert rel < 1e-9, (rel, nit)
    err = float(jnp.max(jnp.abs(U - U_ref)) / jnp.max(jnp.abs(U_ref)))
    assert err < 1e-7, err
    assert ns._sa.n_levels >= 2


def _nl_poisson(ctx, u, v):
    """Quasilinear diffusion -div((1 + u^2) grad u) = 10: genuinely
    nonlinear AND NONSYMMETRIC tangent (the 2 u du grad u . grad v term
    -- this residual is not the gradient of any energy), so the solver
    must run krylov="bicgstab"; CG produces garbage steps near
    convergence (measured on the chip -- see SANewton's docstring)."""
    k = 1.0 + u.val ** 2
    return k * jnp.sum(ctx.grad(u) * ctx.grad(v)) - 10.0 * v.val


def test_sa_newton_star_tspline():
    """The title capability: a floor-level nonlinear solve on a space NO
    structured solver serves -- a ragged T-spline with a valence-3
    extraordinary point -- cross-checked against dense-direct Newton."""
    from tigar_tpu.models.tsplines import (make_star_extraction,
                                           write_rhino_extraction,
                                           RhinoTSplineControlMesh)

    bnet, nodes_list, ops_list = make_star_extraction(3, 6)
    fpath = os.path.join(tempfile.mkdtemp(), "star.iga")
    write_rhino_extraction(fpath, bnet, nodes_list, ops_list)
    cm = RhinoTSplineControlMesh(fpath)
    gen = EqualOrderSpline(1, cm)
    bd = cm.scalar_basis().boundary_dofs(1)
    gen.add_zero_dofs(0, bd)
    spline = ExtractedSpline(gen, quad_degree=6, nders=1)

    ns = SANewton(spline, adjoint_of(_nl_poisson), cg_iters=60,
                  polish_cg_iters=80, sa_kwargs={"coarse_size": 50},
                  krylov="bicgstab")
    U, rel, nit, dU_rel = ns.solve(rtol=1e-9)
    assert rel < 1e-9, (rel, nit)

    U_ref = spline.solve_nonlinear_variational_problem(_nl_poisson)
    err = float(jnp.max(jnp.abs(U - U_ref))
                / max(float(jnp.max(jnp.abs(U_ref))), 1e-30))
    assert err < 1e-6, err
    r_ours = float(jnp.linalg.norm(
        spline.assemble_vector(_nl_poisson, U=U)))
    r_ref = float(jnp.linalg.norm(
        spline.assemble_vector(_nl_poisson, U=U_ref)))
    assert r_ours <= max(r_ref, 1e-12), (r_ours, r_ref)


def test_sa_newton_periodic():
    """Periodic-space coverage: wrapped connectivity scatters through the
    same coo path and the Greville-point fallback places the DoFs for
    aggregation (the wrapped field ncp differs from the open control
    net).  Nonlinear reaction-diffusion -div((1+u^2) grad u) + u = f,
    no BCs (the reaction term keeps it nonsingular)."""
    p, nel = 2, 16
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
    field = TensorBSplineBasis(
        [p, p], [uniform_knots(p, 0.0, 1.0, nel, periodic=True)] * 2)
    assert field.ncp == nel * nel
    gen = FieldListSpline(cm, [field])
    spline = ExtractedSpline(gen, quad_degree=2 * p)

    def res_periodic(ctx, u, v):
        k = 1.0 + u.val ** 2
        f = jnp.sin(2.0 * jnp.pi * ctx.x[0]) * jnp.cos(
            2.0 * jnp.pi * ctx.x[1])
        return (k * jnp.sum(ctx.grad(u) * ctx.grad(v))
                + u.val * v.val - f * v.val)

    ns = SANewton(spline, adjoint_of(res_periodic), cg_iters=60,
                  polish_cg_iters=80, sa_kwargs={"coarse_size": 60},
                  krylov="bicgstab")
    U, rel, nit, _ = ns.solve(rtol=1e-9)
    assert rel < 1e-9, (rel, nit)

    U_ref = spline.solve_nonlinear_variational_problem(res_periodic)
    err = float(jnp.max(jnp.abs(U - U_ref))
                / max(float(jnp.max(jnp.abs(U_ref))), 1e-30))
    assert err < 1e-6, err
