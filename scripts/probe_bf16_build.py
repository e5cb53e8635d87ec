"""Probe: tangent-stencil build in bf16 vs f32 at BENCH_NEL (qd=2, TPU).
The build is ~50% of the production Newton step at 128^2; bf16 runs the
MXU at 2x f32 rate IF the build is matmul-bound.  Also checks stencil
accuracy (bf16-built S vs f32-built S) to judge whether the f32 Newton
phase could run on it."""

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
    from tigar_tpu.solvers.newton_stencil import (
        stencil_from_element_matrices, _equal_order_basis)

    nel = int(os.environ.get("BENCH_NEL", "128"))
    p = 2
    kvecs = [uniform_knots(p, -1.0, 1.0, nel)] * 2
    cm = ExplicitBSplineControlMesh([p, p], kvecs, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    basis0 = cm.scalar_basis()
    for side in (0, 1):
        for direction in (0, 1):
            dofs = basis0.side_dofs(direction, side, n_layers=2)
            for i in range(3):
                sp.add_zero_dofs(i, dofs)
    spline = precompute_shell_reference(
        ExtractedSpline(sp, quad_degree=2 * p, nders=2))
    log(f"nel={nel} ndof={spline.ndof}")

    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 100.0

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
        return F._replace(val=F.val.at[2].add(-q))

    basis = _equal_order_basis(spline)
    asm_b = spline._assembler("dx", quad_degree=2)
    asm32 = asm_b.astype(jnp.float32).with_chunk(None)
    asm16 = asm_b.astype(jnp.bfloat16).with_chunk(None)
    rng = np.random.default_rng(0)
    U32 = jnp.asarray(rng.normal(size=spline.ndof) * 1e-4, jnp.float32)
    U16 = U32.astype(jnp.bfloat16)

    @jax.jit
    def bld(a, u):
        S = stencil_from_element_matrices(
            basis, a.element_matrices_adjoint(res_adj, u), nf=3).S
        return S.astype(jnp.float32)

    def timed(label, a, u, rep=5):
        t0 = time.time()
        S = bld(a, u)
        float(S.ravel()[0])
        log(f"{label} compile+first: {time.time() - t0:.1f}s")
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            for i in range(rep):
                S = bld(a, u + jnp.asarray(i * 1e-9, u.dtype))
            float(S.ravel()[0])
            best = min(best, (time.time() - t0) / rep)
        log(f"{label}: {best * 1e3:.1f} ms")
        return S

    S32 = timed("build f32 ", asm32, U32)
    S16 = timed("build bf16", asm16, U16)
    a32, a16 = np.asarray(S32, np.float64), np.asarray(S16, np.float64)
    m = np.max(np.abs(a32))
    log(f"max |S16 - S32| / max|S32| = {np.max(np.abs(a16 - a32)) / m:.2e}")


if __name__ == "__main__":
    main()
