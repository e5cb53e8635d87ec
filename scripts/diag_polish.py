"""Diagnose the 128^2 polish stall (round 3): per-step rebuilds, more
refinement sweeps, direct linear-solve quality, and timing of the f64
stencil build/apply.  Run on the TPU with a warm .jax_cache."""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (precompute_shell_reference,
                                    svk_shell_adjoint)
from tigar_tpu.solvers.newton_stencil import StencilNewton, _masked_apply


def log(*a):
    print(*a, file=sys.stderr, flush=True)


nel = int(os.environ.get("NEL", "128"))
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


t0 = time.time()
spline = build(nel)
mg_sizes = []
n = nel // 2
while n >= 8:
    mg_sizes.append(n)
    n //= 2
mg_splines = [build(s) for s in mg_sizes]
log(f"preprocess {time.time() - t0:.1f}s")

E_mod, nu, h_th, q = 1.0e7, 0.3, 0.03, 1.0e-2


def res_adj(ctx, u):
    F = svk_shell_adjoint(ctx, u, E_mod, nu, h_th)
    return F._replace(val=F.val.at[2].add(-q))


t0 = time.time()
ns = StencilNewton(spline, res_adj, mg_splines=mg_splines, cg_iters=15)
log(f"setup {time.time() - t0:.1f}s")

U = jnp.zeros(spline.ndof, dtype=spline.dtype)
r0 = ns.true_rel_residual(U)
log(f"|r0| = {r0:.4e}")

# one f32 production step
U, _, _dU = ns.step(U)
log(f"after f32 step: true rel = {ns.true_rel_residual(U, r0):.4e}")

# f64 stencil build timing
t0 = time.time()
st64 = ns._build(ns.asm_b64, U)
st64.S.block_until_ready()
_ = float(st64.S[0, 0, 0, 0, 0, 0])
log(f"f64 stencil build (incl. possible compile): {time.time() - t0:.2f}s")
t0 = time.time()
st64 = ns._build(ns.asm_b64, U)
_ = float(st64.S[0, 0, 0, 0, 0, 0])
log(f"f64 stencil build (warm): {time.time() - t0:.2f}s")

# f64 stencil apply timing (chained)
W = U + 1e-3
t0 = time.time()
for _ in range(10):
    W = _masked_apply(st64, ns.mask64, W) * 1e-8
_ = float(jnp.vdot(W, W))
log(f"f64 masked stencil apply: {(time.time() - t0) / 10 * 1e3:.2f} ms")

st32 = ns._build(ns.asm_b32, U.astype(jnp.float32))

# polish steps: rebuild EVERY step, 8 refinement sweeps, measure the
# linear-solve quality of each refined solve
for it in range(6):
    r64 = ns._res(ns.asm64, ns.mask64, U)
    st32 = ns._build(ns.asm_b32, U.astype(jnp.float32))
    st64 = ns._build(ns.asm_b64, U)
    t0 = time.time()
    dU = ns._refined_solve(st64, st32, r64, sweeps=8)
    lin = float(jnp.linalg.norm(r64 - _masked_apply(st64, ns.mask64, dU))
                / jnp.linalg.norm(r64))
    U = U - dU
    rel = ns.true_rel_residual(U, r0)
    log(f"polish it {it}: rel = {rel:.4e}  (linear solve rel resid "
        f"{lin:.2e}, {time.time() - t0:.2f}s)")
