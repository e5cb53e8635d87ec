"""Diagnose: which programs recompile in the polish_residual_device='cpu'
solve at 128^2 (every fresh process pays ~59 s at polish its 2-3 even
with a warm persistent cache; the cpu_aot_loader machine-feature errors
suggest XLA:CPU AOT cache entries fail to LOAD on this host)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_log_compiles", True)
    import jax.numpy as jnp

    from tigar_tpu.ops.knots import uniform_knots
    from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
    from tigar_tpu.models.space import EqualOrderSpline
    from tigar_tpu.models.extracted import ExtractedSpline
    from tigar_tpu.models.shell import (precompute_shell_reference,
                                        svk_shell_adjoint)
    from tigar_tpu.solvers.newton_stencil import StencilNewton

    nel = 128
    p = 2

    def build(n):
        kvecs = [uniform_knots(p, -1.0, 1.0, n)] * 2
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

    spline = build(nel)
    mg = [build(n) for n in (64, 32, 16, 8)]
    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 100.0

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
        return F._replace(val=F.val.at[2].add(-q))

    ccache = os.path.join(".tigar_cache",
                          f"bench_coarse_{nel}_p{p}_{E_mod:g}_{nu:g}_"
                          f"{h_th:g}.npz")
    ns = StencilNewton(spline, res_adj, mg_splines=mg, cg_iters=15,
                       coarse_cache=ccache, polish_tangent="cast",
                       polish_residual_device="cpu",
                       build_quad_degree=2, rebuild_rel=0.1)
    t0 = time.time()
    U, rel, nit, dU_rel = ns.solve(rtol=1e-10,
                                   log=lambda s: log(f"{time.time()-t0:7.1f}s {s}"))
    log(f"solve: {time.time() - t0:.1f}s rel={rel:.2e} steps={nit}")


if __name__ == "__main__":
    main()
