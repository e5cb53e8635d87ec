"""Probe: f64 KL-shell residual assembly, TPU (emulated f64) vs host CPU
(native IEEE f64, XLA CPU backend, 1 core) at BENCH_NEL.  If the CPU eval
is materially faster, the polish phase could evaluate residuals on the
host (50k-DoF f64 vector transfers are ~ms through the tunnel)."""

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

    nel = int(os.environ.get("BENCH_NEL", "128"))
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
    spline = precompute_shell_reference(
        ExtractedSpline(sp, quad_degree=2 * p, nders=2))
    log(f"nel={nel} ndof={spline.ndof}")

    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 100.0

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
        return F._replace(val=F.val.at[2].add(-q))

    asm = spline._assembler("dx")
    mask = spline.mask
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-4)

    @jax.jit
    def res(a, m, u):
        return m * a.residual_vector_adjoint(res_adj, u)

    def bench(dev, label, rep=3):
        a_d = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), asm)
        m_d = jax.device_put(mask, dev)
        u_d = jax.device_put(U, dev)
        t0 = time.time()
        r = res(a_d, m_d, u_d)
        s = float(jnp.vdot(r, r))
        log(f"{label} compile+first: {time.time() - t0:.1f}s")
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            u_i = u_d
            for i in range(rep):
                r = res(a_d, m_d, u_i)
                u_i = u_d + r * 1e-30
            float(jnp.vdot(r, r))
            best = min(best, (time.time() - t0) / rep)
        log(f"{label}: {best * 1e3:.1f} ms  ({spline.ndof / best:.3e} "
            f"DoF/s)")
        return best

    bench(jax.devices()[0], "TPU emulated f64")
    bench(jax.devices("cpu")[0], "CPU native f64 ")


if __name__ == "__main__":
    main()
