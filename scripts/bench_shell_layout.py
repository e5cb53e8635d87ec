"""Layout experiment: evaluate the shell-residual density with the
quadrature-point batch axis LAST (in the 128-wide vector lanes) instead of
first.

Hypothesis: the pointwise AD chain's intermediates are small-trailing-dim
tensors ([NQ, 3, 2], [NQ, 2, 2], ...) whose minor dims pad to (8, 128)
tiles, wasting ~95% of the VPU lanes; putting the big batch axis minor
([3, 2, NQ]) should recover them.  Jets are produced flat [NQ, ...] by the
sum-factorized evaluation (any evaluator works; the einsum stage is
MXU-bound either way), transposed once per evaluation, and the density is
vmapped with in_axes=-1/out_axes=-1 so the batch tracer keeps the batch
dim minor through the pointwise chain.

MEASURED (one v5e, 128^2, f32, 2026-08-16): REFUTED.
  sumfac_standard 29.3 ms, sumfac_lastaxis 30.1 ms, outputs bitwise
  identical -- XLA assigns physical TPU layouts independently of the
  logical dimension order, so a logical transpose changes nothing.
  Together with scripts/bench_shell_variants.py (remat/chunking: no
  effect), the generic tabulated path's 22 ms at 128^2 is the compiled
  ceiling for this AD-of-energy density; further speedups require a
  mathematically cheaper density (hand-derived shell variations), not
  scheduling or layout knobs.
"""

import os
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from tigar_tpu.ops.knots import uniform_knots
    from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
    from tigar_tpu.models.space import EqualOrderSpline
    from tigar_tpu.models.extracted import ExtractedSpline
    from tigar_tpu.models.shell import (svk_psi_surface,
                                        precompute_shell_reference,
                                        shell_reference)
    from tigar_tpu.forms import deriv
    from tigar_tpu.ops.sumfac_forms import make_sumfac_assembler

    nel = int(os.environ.get("BENCH_NEL", "128"))
    rep = int(os.environ.get("BENCH_REPS", "20"))
    p = 2
    cm = ExplicitBSplineControlMesh(
        [p, p], [uniform_knots(p, -1.0, 1.0, nel)] * 2, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    basis = cm.scalar_basis()
    for side in (0, 1):
        for direction in (0, 1):
            dofs = basis.side_dofs(direction, side, n_layers=2)
            for i in range(3):
                sp.add_zero_dofs(i, dofs)
    spline = precompute_shell_reference(
        ExtractedSpline(sp, quad_degree=2 * p, nders=2))
    log(f"nel={nel}^2 ndof={spline.ndof}")

    E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 1.0e-2

    def res(ctx, u, v):
        dW = deriv(lambda y: svk_psi_surface(ctx, y, E_mod, nu, h_th), u, v)
        return dW - q * v.val[2]

    asm_sf = make_sumfac_assembler(spline)
    ref = jax.jit(jax.vmap(shell_reference))(asm_sf.ctx)
    aux = dict(asm_sf.ctx.aux or {})
    aux["shell_ref"] = ref
    asm_sf.ctx = asm_sf.ctx._replace(aux=aux)
    asm_sf = jtu.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, asm_sf)

    def T(tree):
        return jtu.tree_map(lambda x: jnp.moveaxis(x, 0, -1), tree)

    def Tinv(tree):
        return jtu.tree_map(lambda x: jnp.moveaxis(x, -1, 0), tree)

    def residual_lastaxis(asm_, U):
        uj = asm_.jets_tree(U)
        ctxT = T(asm_.ctx)
        ujT = T(uj)

        def total(vjets_T):
            dens = jax.vmap(res, in_axes=(-1, -1, -1),
                            out_axes=-1)(ctxT, ujT, vjets_T)
            return jnp.sum(dens * asm_.scale)

        zeroT = T(asm_._zero_jets())
        cot = Tinv(jax.grad(total)(zeroT))
        return asm_.scatter_jets(cot)

    # correctness vs the standard sumfac residual
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-4, dtype=jnp.float32)

    @jax.jit
    def xcheck(asm_, U):
        return (residual_lastaxis(asm_, U),
                asm_.residual_vector(res, U))

    t0 = time.time()
    r1, r2 = xcheck(asm_sf, U)
    dmax = float(jnp.max(jnp.abs(r1 - r2)))
    mag = float(jnp.max(jnp.abs(r2)))
    log(f"xcheck {time.time() - t0:.1f}s: |last-axis - standard| = "
        f"{dmax:.3e} (rel {dmax / mag:.3e})")
    assert dmax < 1e-5 * mag

    @partial(jax.jit, static_argnames=("rep", "last"))
    def chained(asm_, U, c, rep, last):
        def body(carry, _):
            Up = U + jnp.asarray(1e-9, U.dtype) * carry
            r = residual_lastaxis(asm_, Up) if last \
                else asm_.residual_vector(res, Up)
            return (jnp.vdot(r, r) * 1e-30).astype(carry.dtype), None
        return jax.lax.scan(body, c, None, length=rep)[0]

    for name, last in (("sumfac_standard", False), ("sumfac_lastaxis", True)):
        c0 = jnp.zeros((), jnp.float32)
        t0 = time.time()
        float(chained(asm_sf, U, c0, rep=rep, last=last))
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        best = np.inf
        for i in range(2):
            t0 = time.time()
            float(chained(asm_sf, U, c0 + i, rep=rep, last=last))
            best = min(best, (time.time() - t0) / rep)
        log(f"{name}: {best * 1e3:.3f} ms ({spline.ndof / best:.3e} DoF/s)")


if __name__ == "__main__":
    main()
