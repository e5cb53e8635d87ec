"""Round-4 verify: drive the new interface-form coupling on the REAL TPU
through the package boundary -- two-patch Poisson with the auto-derived
EnergyNitscheCoupling, exact-Newton solve via cg_device_iters, printed
physics: L2 error vs manufactured solution + interface jump norm."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import tigar_tpu as tg
from tigar_tpu import (EqualOrderSpline, ExtractedSpline, InterfaceForm,
                       EnergyNitscheCoupling, MultiPatchBSplineBasis,
                       MultiPatchControlMesh, TensorBSplineBasis,
                       uniform_knots)

print("devices:", jax.devices())
p, nel = 2, 8
pa = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel)] * 2)
pb = TensorBSplineBasis([p, p], [uniform_knots(p, 0.0, 1.0, nel),
                                 uniform_knots(p, 0.0, 1.0, 3 * nel // 2)])
basis = MultiPatchBSplineBasis([pa, pb])


def bnet(patch, x_off):
    g = patch.greville_points()
    B = np.ones((g.shape[0], 3))
    B[:, 0] = g[:, 0] + x_off
    B[:, 1] = g[:, 1]
    return B


cm = MultiPatchControlMesh(basis, [bnet(basis.patches[0], 0.0),
                                   bnet(basis.patches[1], 1.0)])
gen = EqualOrderSpline(1, cm)
gen.add_zero_dofs(0, basis.patch_side_dofs(0, 0, 0))
gen.add_zero_dofs(0, basis.patch_side_dofs(1, 0, 1))
for patch in (0, 1):
    for s in (0, 1):
        gen.add_zero_dofs(0, basis.patch_side_dofs(patch, 1, s))
spline = ExtractedSpline(gen, quad_degree=2 * p)


def soln(x):
    f = -x[0] ** 3 + x[0] ** 2 + 2.0 * x[0]
    return f * jnp.sin(jnp.pi * x[1])


def res(ctx, u, v):
    x = ctx.x
    f = -x[0] ** 3 + x[0] ** 2 + 2.0 * x[0]
    rhs = (6.0 * x[0] - 2.0 + jnp.pi ** 2 * f) * jnp.sin(jnp.pi * x[1])
    return jnp.sum(ctx.grad(u) * ctx.grad(v)) - rhs * v.val


def poisson_energy(ctx, u, params):
    g = u.g @ ctx.pinv
    return 0.5 * jnp.sum(g * g)


t0 = time.time()
c = EnergyNitscheCoupling(spline, 0, (0, 1), 1, (0, 0), poisson_energy,
                          beta_d=300.0, w_order=1)
print(f"coupling built [{time.time()-t0:.1f}s]; area={c.area:.12f}")

from tigar_tpu.solvers.linear import cg_device_iters

mask = spline.mask
U = jnp.zeros(spline.ndof, dtype=spline.dtype)
t0 = time.time()
r = spline.assemble_vector(res, U=U) + mask * c.residual(U)
idx, K = c.tangent_block(U)
idxj = jnp.asarray(idx)


def action(W):
    aw = spline.tangent_action(res, U, mask * W, apply_bcs=False)
    cw = jnp.zeros_like(W).at[idxj].add(K @ (mask * W)[idxj])
    return mask * (aw + cw) + (1.0 - mask) * W


dU, rres = cg_device_iters(action, r, 400, tol=1e-12)
U = U - dU
r1 = spline.assemble_vector(res, U=U) + mask * c.residual(U)
err = float(spline.errornorm(U, lambda ctx: soln(ctx.x),
                             rationalize=False))
print(f"solve [{time.time()-t0:.1f}s]: |r0|={float(jnp.linalg.norm(r)):.3e}"
      f" -> |r1|={float(jnp.linalg.norm(r1)):.3e}")
print(f"L2 error vs manufactured = {err:.6e} (expect ~3e-4 at p=2, nel=8)")
print(f"interface jump norm = {float(c.jump_norm(U)):.3e}")
assert err < 5e-4
print("verify_interface_tpu OK")
