"""Debug harness for the N-patch (L-shell) MultiPatchStencilNewton.

Checks, at the zero state:
  1. operator exactness: MultiPatchStencilOperator @ w vs the dense
     direct tangent (assemble_matrix + per-coupling tangent_block)
  2. inner f32 MG-CG solve quality vs the dense solve
  3. a few logged Newton steps
"""

import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

from tests.test_newton_mp import (_l_shell, _l_couplings, _res_adj_factory,
                                  E_MOD, NU, H_TH, Q)
from tigar_tpu.models.shell import svk_shell_residual
from tigar_tpu.solvers.newton_stencil_mp import (MultiPatchStencilNewton,
                                                 mp_stencil_to_dense)

nel = 4
h_el = 1.0 / (2 * nel)
pd = 1e2 * E_MOD * H_TH / h_el
pr = 1e2 * E_MOD * H_TH ** 3 / h_el

levels = [((2 * nel, 3 * nel), (2 * nel + 2, 3 * nel + 2),
           (3 * nel, 2 * nel)),
          ((nel, 3 * nel // 2), (nel + 1, 3 * nel // 2 + 1),
           (3 * nel // 2, nel))]
splines, couplings = [], []
for nels in levels:
    sp, _ = _l_shell(nels)
    splines.append(sp)
    couplings.append(_l_couplings(sp, pd, pr))
spline, cpls = splines[0], couplings[0]
print("ndof:", spline.ndof, flush=True)

ns = MultiPatchStencilNewton(
    spline, _res_adj_factory(), cpls,
    mg_splines=splines[1:], mg_couplings=couplings[1:],
    cg_iters=30, polish_cg_iters=50, setup_log=print)

mask = spline.mask


def res(ctx, u, v):
    return svk_shell_residual(ctx, u, v, E_MOD, NU, H_TH) - Q * v.val[2]


U0 = jnp.zeros(spline.ndof, dtype=spline.dtype)

# dense tangent at zero
A = spline.assemble_matrix(res, U=U0)
for c in cpls:
    idx, K = c.tangent_block(U0)
    idxj = jnp.asarray(idx)
    A = A.at[idxj[:, None], idxj[None, :]].add(
        K * mask[idxj][:, None] * mask[idxj][None, :])

# 1. operator exactness (f64 build, no Sinv)
op64 = ns._build(ns.asm_b64, U0)
rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=spline.ndof))
wm = mask * w
y_op = mask * op64(wm)
y_dense = jnp.asarray(A) @ wm
y_dense = mask * y_dense
err = float(jnp.linalg.norm(y_op - y_dense) / jnp.linalg.norm(y_dense))
print("operator vs dense rel err:", err, flush=True)

Ad = mp_stencil_to_dense(op64)
Ad = mask[:, None] * Ad * mask[None, :]
Araw = mask[:, None] * np.asarray(A) * mask[None, :]
print("dense(mp op) vs dense(direct) max abs:",
      float(np.max(np.abs(Ad - Araw))),
      "scale:", float(np.max(np.abs(Araw))), flush=True)

# 2. inner f32 MG-CG quality at zero state
r0 = ns._res(ns.asm32, ns.mask32, U0.astype(jnp.float32))
st32 = ns._build(ns.asm_b32, U0.astype(jnp.float32))
dU = ns._inner_solve(st32, r0)
# linear residual of the f32 solve against the f32 operator
lin_r = r0 - ns.mask32 * st32(ns.mask32 * dU)
print("inner f32 MG-CG rel linear residual:",
      float(jnp.linalg.norm(lin_r) / jnp.linalg.norm(r0)), flush=True)

# against dense f64 solve
bc = np.asarray(Araw) + np.diag(1.0 - np.asarray(mask))
dU_dense = np.linalg.solve(bc, np.asarray(ns._res(ns.asm64, ns.mask64,
                                                  U0)))
print("f32 dU vs dense dU rel:",
      float(np.linalg.norm(np.asarray(dU, dtype=np.float64) - dU_dense)
            / np.linalg.norm(dU_dense)), flush=True)

# 3. a few Newton steps with log
U, rel, steps, dU_rel = ns.solve(rtol=1e-10, max_iters=8, log=print)
print("solve:", rel, steps, dU_rel, flush=True)
