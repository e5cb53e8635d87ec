"""Probe: f64 tangent element-matrix build, hand jet-Hessian vs jacfwd
adjoint sweep, on the real TPU (honest fetch-forced timing).  Sizes the
hand-Hessian payoff for the f64 polish builds of the production Newton
step (the f32 fine build measured SLOWER with the hand path: 27 vs 17 ms
at 64^2 qd=2 -- small per-point factor stacks vs batched jacfwd)."""

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
                                        svk_shell_adjoint, svk_shell_hessian,
                                        precompute_shell_reference as _)
    from tigar_tpu.solvers.newton_stencil import (StencilNewton,
                                                  stencil_from_element_matrices)

    nel = int(os.environ.get("BENCH_NEL", "32"))
    p = 2
    kvecs = [uniform_knots(p, -1.0, 1.0, nel)] * 2
    cm = ExplicitBSplineControlMesh([p, p], kvecs, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    basis = cm.scalar_basis()
    for side in (0, 1):
        for direction in (0, 1):
            dofs = basis.side_dofs(direction, side, n_layers=2)
            for i in range(3):
                sp.add_zero_dofs(i, dofs)
    qd = int(os.environ.get("BENCH_QD", "2"))
    spline = precompute_shell_reference(
        ExtractedSpline(sp, quad_degree=qd, nders=2))
    log(f"nel={nel} ndof={spline.ndof} quad_degree={qd}")

    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 100.0

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
        return F._replace(val=F.val.at[2].add(-q))

    def hess(ctx, u):
        return svk_shell_hessian(ctx, u, E_mod, nu, h_th)

    asm = spline._assembler("dx")
    rng = np.random.default_rng(0)

    for dtype in (jnp.float32, jnp.float64):
        U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-4, dtype=dtype)
        asm_d = asm.astype(dtype) if hasattr(asm, "astype") else asm
        import jax.tree_util as jtu
        asm_d = jtu.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating) else x, asm)

        builds = {
            "jacfwd": jax.jit(lambda a, u: a.element_matrices_adjoint(
                res_adj, u)),
            "hand  ": jax.jit(lambda a, u: a.element_matrices_hessian(
                hess, u)),
        }
        for name, fn in builds.items():
            t0 = time.time()
            out = fn(asm_d, U)
            np.asarray(out[:1, :1, :1])
            tc = time.time() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                o = fn(asm_d, U)
                o = fn(asm_d, U + o[0, 0, 0] * 1e-30)
                float(o[0, 0, 0])
                best = min(best, (time.time() - t0) / 2)
            log(f"{np.dtype(dtype).name} {name}: {best * 1e3:8.2f} ms  "
                f"(compile+first {tc:.1f}s)")


if __name__ == "__main__":
    main()
