"""Round-3 diagnosis #2 at 128^2 shells (run on TPU, warm cache):

  A. f64/f32 stencil apply speed after the elementwise rewrite
  B. drive to the polish floor (1 f32 step + 3 rebuilt polish steps)
  C. cross-check the floor residual on the CPU backend (TRUE IEEE f64)
     -- decides whether the ~1e-6 relative floor is the TPU f64
     emulation's amplification or something structural
  D. f32 residual noise vs f64 at the floor state
  E. inner-solve quality vs cg_iters/n_smooth (fused MGCG contraction)
"""

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
from tigar_tpu.solvers.newton_stencil import (StencilNewton, _masked_apply,
                                              make_stencil_mgcg)


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


def dinv_of(st):
    d = st.diagonal()
    d = ns.mask32 * d + (1.0 - ns.mask32)
    return jnp.where(d != 0.0, 1.0 / d, jnp.ones_like(d))


t0 = time.time()
ns = StencilNewton(spline, res_adj, mg_splines=mg_splines, cg_iters=15)
log(f"setup {time.time() - t0:.1f}s")

U = jnp.zeros(spline.ndof, dtype=spline.dtype)
r0 = ns.true_rel_residual(U)
log(f"|r0| = {r0:.4e}")

# ---- A: apply timing after the elementwise rewrite --------------------------
U32 = U.astype(jnp.float32)
st32 = ns._build(ns.asm_b32, U32)
st64 = ns._build(ns.asm_b64, U)
for name, st, mask, W in (("f32", st32, ns.mask32, U32 + 1.0),
                          ("f64", st64, ns.mask64, U + 1.0)):
    W0 = W
    _ = float(jnp.vdot(_masked_apply(st, mask, W0), W0))  # compile
    t0 = time.time()
    for _i in range(10):
        W0 = _masked_apply(st, mask, W0) * 1e-6
    _ = float(jnp.vdot(W0, W0))
    log(f"A: {name} masked apply {(time.time() - t0) / 10 * 1e3:.2f} ms")

# ---- B: to the floor --------------------------------------------------------
U, _, _dU = ns.step(U)
log(f"B: after f32 step: rel = {ns.true_rel_residual(U, r0):.4e}")
for it in range(3):
    t0 = time.time()
    U, rn = ns.polish_step(U, rebuild=True)
    log(f"B: polish it {it}: rel = {float(rn) / r0:.4e}"
        f"  ({time.time() - t0:.1f}s)")
rel_floor = ns.true_rel_residual(U, r0)
log(f"B: floor rel = {rel_floor:.4e}")

# ---- C: CPU (true f64) residual at the same state --------------------------
cpu = jax.devices("cpu")[0]
to_cpu = lambda t: jax.tree_util.tree_map(
    lambda x: jax.device_put(x, cpu), t)
asm_cpu = to_cpu(ns.asm64)
mask_cpu = jax.device_put(ns.mask64, cpu)
U_cpu = jax.device_put(U, cpu)
t0 = time.time()
r_cpu = jax.jit(lambda a, m, u: m * a.residual_vector_adjoint(res_adj, u))(
    asm_cpu, mask_cpu, U_cpu)
rel_cpu = float(jnp.linalg.norm(r_cpu)) / r0
log(f"C: CPU true-f64 rel at floor state = {rel_cpu:.4e} "
    f"({time.time() - t0:.1f}s)")
r_tpu = ns._res(ns.asm64, ns.mask64, U)
diff = float(jnp.linalg.norm(jax.device_put(r_tpu, cpu) - r_cpu))
log(f"C: |r_tpu64 - r_cpu64| / |r_cpu64| = "
    f"{diff / float(jnp.linalg.norm(r_cpu)):.3e}")

# ---- D: f32 residual noise at the floor state ------------------------------
r32 = ns._res(ns.asm32, ns.mask32, U.astype(jnp.float32))
dn = float(jnp.linalg.norm(r32.astype(jnp.float64) - r_tpu))
log(f"D: |r32 - r64|/|r64| at floor = "
    f"{dn / float(jnp.linalg.norm(r_tpu)):.3e}; "
    f"|r32-r64|/|r0| = {dn / r0:.3e}")

# ---- E: inner-solve contraction vs config ----------------------------------
rng = np.random.default_rng(0)
b32 = (ns.mask32 * jnp.asarray(rng.normal(size=spline.ndof),
                               dtype=jnp.float32))
bases = [spline] + mg_splines
grid_shapes = [tuple(kv.ncp for kv in reversed(
    s.space.fields[0].kvs)) for s in bases]
for iters, smooth, omega in ((15, 2, 0.7), (40, 2, 0.7), (15, 4, 0.7),
                             (30, 3, 0.6)):
    mgcg = make_stencil_mgcg(len(bases), n_smooth=smooth, omega=omega,
                             n_iters=iters)
    t0 = time.time()
    x = mgcg((st32,) + ns._coarse_sts, (ns.mask32,) + ns._coarse_masks,
             (dinv_of(st32),) + ns._coarse_dinvs, ns._Ps,
             ns._coarse_inv, b32)
    lin = float(jnp.linalg.norm(b32 - _masked_apply(st32, ns.mask32, x))
                / jnp.linalg.norm(b32))
    t1 = time.time() - t0
    t0 = time.time()
    x = mgcg((st32,) + ns._coarse_sts, (ns.mask32,) + ns._coarse_masks,
             (dinv_of(st32),) + ns._coarse_dinvs, ns._Ps,
             ns._coarse_inv, b32)
    _ = float(jnp.vdot(x, x))
    log(f"E: iters={iters} smooth={smooth} omega={omega}: linear rel "
        f"{lin:.2e}; compile+1st {t1:.1f}s, warm {time.time() - t0:.3f}s")
