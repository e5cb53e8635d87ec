"""Measure adjoint-form (AD-free) SVK shell assembly vs the reverse-mode
AD path on the real TPU, f32 and f64, plus tangent-action costs.

Timing: python-level chain of DEPENDENT jitted calls ending in a scalar
value fetch.  Each call's input depends on the previous call's output, so
device execution is strictly sequential; the final ``float()`` cannot
return before the whole chain ran (the tunnel's block_until_ready lies,
value fetches do not).  Unlike the round-2 chained-``lax.scan`` harness
this compiles ONE single-assembly program (the rep-20 scan compiled to a
~200 MB executable, 427 s through the tunnel -- the BENCH_r02 mystery).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import jax.tree_util as jtu
from functools import partial

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (precompute_shell_reference,
                                    svk_shell_residual, svk_shell_adjoint,
                                    svk_shell_tangent_adjoint)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
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
    asm64 = spline._assembler("dx")
    asm32 = asm64.astype(jnp.float32)
    ndof = spline.ndof
    log(f"ndof={ndof} nel={asm64.nel} devices={jax.devices()}")

    E, nu, h, q = 1.0e7, 0.3, 0.03, 1e-2

    def res(ctx, u, v):
        return svk_shell_residual(ctx, u, v, E, nu, h) - q * v.val[2]

    def res_adj(ctx, u):
        F = svk_shell_adjoint(ctx, u, E, nu, h)
        return F._replace(val=F.val.at[2].add(-q))

    def tan_adj(ctx, u):
        return svk_shell_tangent_adjoint(ctx, u["u"], u["w"], E, nu, h)

    @jax.jit
    def step_ad(asm_, U, c):
        r = asm_.residual_vector(res, U + jnp.asarray(1e-9, U.dtype) * c)
        return (jnp.vdot(r, r) * 1e-30).astype(c.dtype)

    @jax.jit
    def step_adj(asm_, U, c):
        r = asm_.residual_vector_adjoint(
            res_adj, U + jnp.asarray(1e-9, U.dtype) * c)
        return (jnp.vdot(r, r) * 1e-30).astype(c.dtype)

    @jax.jit
    def step_tan_ad(asm_, U, W, c):
        out = jax.jvp(lambda a: asm_.residual_vector(res, a),
                      (U,), (W + jnp.asarray(1e-9, U.dtype) * c,))[1]
        return (jnp.vdot(out, out) * 1e-30).astype(c.dtype)

    @jax.jit
    def step_tan_adj(asm_, U, W, c):
        out = asm_.residual_vector_adjoint(
            tan_adj, {"u": U, "w": W + jnp.asarray(1e-9, U.dtype) * c})
        return (jnp.vdot(out, out) * 1e-30).astype(c.dtype)

    rng = np.random.default_rng(0)
    U64 = jnp.asarray(rng.normal(size=ndof) * 1e-4)
    W64 = jnp.asarray(rng.normal(size=ndof) * 1e-4)

    def timeit(name, fn, dtype, rep):
        args = [a.astype(dtype) for a in ([U64, W64] if "tan" in name
                                          else [U64])]
        asm_ = asm32 if dtype == jnp.float32 else asm64
        c = jnp.zeros((), dtype)
        t0 = time.time()
        c = fn(asm_, *args, c)
        v = float(c)
        log(f"{name}: compile+first {time.time() - t0:.1f}s (v={v:.3e})")
        best = np.inf
        for trial in range(2):
            c = jnp.asarray(float(trial), dtype)
            t0 = time.time()
            for _ in range(rep):
                c = fn(asm_, *args, c)
            float(c)
            best = min(best, (time.time() - t0) / rep)
        log(f"{name}: {best * 1e3:.3f} ms  ({ndof / best:.3e} DoF/s)")
        return best

    which = os.environ.get("WHICH", "all")
    rep32 = int(os.environ.get("REP32", "20"))
    rep64 = int(os.environ.get("REP64", "5"))
    if which in ("all", "adj"):
        timeit("adj  res f32", step_adj, jnp.float32, rep32)
        timeit("adj  res f64", step_adj, jnp.float64, rep64)
        timeit("adj  tan f32", step_tan_adj, jnp.float32, rep32)
        timeit("adj  tan f64", step_tan_adj, jnp.float64, rep64)
    if which in ("all", "ad"):
        timeit("AD   res f32", step_ad, jnp.float32, rep32)
        timeit("AD   res f64", step_ad, jnp.float64, rep64)
        timeit("AD   tan f32", step_tan_ad, jnp.float32, rep32)
        timeit("AD   tan f64", step_tan_ad, jnp.float64, rep64)


if __name__ == "__main__":
    main()
