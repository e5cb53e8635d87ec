"""Attribute the one-time cost of the first polish_residual_device='cpu'
polish steps at 128^2: CPU-assembler transfer, first CPU residual
execution, transfer back, TPU stencil build, mixed CG."""

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
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-3)

    def phase(label, fn):
        t0 = time.time()
        out = fn()
        if out is not None:
            jax.block_until_ready(out)
            # force a real fetch (block_until_ready lies via the tunnel)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.asarray(leaf).ravel()[0])
        log(f"{label}: {time.time() - t0:.2f}s")
        return out

    phase("cpu assembler setup (transfer)", lambda: ns._cpu_res()[1])
    rc, asm_cpu, mask_cpu = ns._cpu_res()
    U_cpu = phase("U -> cpu", lambda: jax.device_put(U, cpu))
    r_cpu = phase("first CPU residual exec", lambda: rc(asm_cpu, mask_cpu,
                                                        U_cpu))
    r_cpu2 = phase("second CPU residual exec", lambda: rc(asm_cpu, mask_cpu,
                                                          U_cpu))
    dev = list(U.devices())[0]
    phase("r -> tpu", lambda: jax.device_put(r_cpu, dev))
    U32 = U.astype(jnp.float32)
    st32 = phase("first TPU build", lambda: ns._build(ns.asm_b32, U32))
    st64 = st32.astype(U.dtype)
    r64 = jax.device_put(r_cpu, dev)
    phase("first mixed CG", lambda: ns._mixed_solve(st64, st32, r64))
    phase("second mixed CG", lambda: ns._mixed_solve(st64, st32, r64))
    phase("full polish_step (fresh state)", lambda: ns.polish_step(
        U, rebuild=True)[0])
    phase("second polish_step", lambda: ns.polish_step(U, rebuild=True)[0])


if __name__ == "__main__":
    main()
