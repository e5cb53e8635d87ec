"""Probe: f64 tangent-stencil build (jacfwd jet-Hessian, qd=2) and f64
residual, TPU emulated f64 vs host CPU native f64, at BENCH_NEL.
Companion to probe_cpu_f64_residual.py; sizes a residual_device='cpu'
polish option in StencilNewton."""

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

    nel = int(os.environ.get("BENCH_NEL", "128"))
    p = 2

    def build_sp(n, qd):
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
            ExtractedSpline(sp, quad_degree=qd, nders=2))

    spline = build_sp(nel, 2 * p)
    spline_b = build_sp(nel, 2)      # reduced-quadrature build space
    log(f"nel={nel} ndof={spline.ndof}")

    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 100.0

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
        return F._replace(val=F.val.at[2].add(-q))

    from tigar_tpu.solvers.newton_stencil import (
        stencil_from_element_matrices, _equal_order_basis)
    basis = _equal_order_basis(spline)
    asm = spline._assembler("dx")
    asm_b = spline_b._assembler("dx")
    mask = spline.mask
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-4)

    @jax.jit
    def res(a, m, u):
        return m * a.residual_vector_adjoint(res_adj, u)

    @jax.jit
    def bld(a, u):
        return stencil_from_element_matrices(
            basis, a.element_matrices_adjoint(res_adj, u), nf=3).S

    def bench(fn, args, dev, label, rep=3, fetch=lambda o: o.ravel()[0]):
        args_d = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev), args)
        t0 = time.time()
        out = fn(*args_d)
        float(fetch(out))
        log(f"{label} compile+first: {time.time() - t0:.1f}s")
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            for i in range(rep):
                out = fn(*args_d)
            float(fetch(out))
            best = min(best, (time.time() - t0) / rep)
        log(f"{label}: {best * 1e3:.1f} ms")
        return best

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    bench(bld, (asm_b, U), tpu, f"TPU f64 build qd2 {nel}^2", rep=2)
    bench(bld, (asm_b, U), cpu, f"CPU f64 build qd2 {nel}^2", rep=2)
    bench(res, (asm, mask, U), tpu, f"TPU f64 residual {nel}^2")
    bench(res, (asm, mask, U), cpu, f"CPU f64 residual {nel}^2")


if __name__ == "__main__":
    main()
