import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")
from test_newton_mp import (_two_patch_shell, _coupling, E_MOD, NU, H_TH,
                            Q, P)
from tigar_tpu.models.shell import svk_shell_adjoint, svk_shell_residual
from tigar_tpu.solvers.newton_stencil_mp import (MultiPatchStencilNewton,
                                                 mp_stencil_to_dense)

nel = 4
h_el = 1.0 / nel
pd = 1e2 * E_MOD * H_TH / h_el
pr = 1e2 * E_MOD * H_TH ** 3 / h_el

levels = [(2 * nel, 2 * nel, 2 * nel + 4), (nel, nel, nel + 2)]
splines, couplings = [], []
for lx, lay, lby in levels:
    sp, _ = _two_patch_shell(lx, lay, lby)
    splines.append(sp)
    couplings.append(_coupling(sp, pd, pr))
spline, coupling = splines[0], couplings[0]


def res_adj(ctx, u):
    F = svk_shell_adjoint(ctx, u, E_MOD, NU, H_TH)
    return F._replace(val=F.val.at[2].add(-Q))


def res(ctx, u, v):
    return svk_shell_residual(ctx, u, v, E_MOD, NU, H_TH) - Q * v.val[2]


ns = MultiPatchStencilNewton(spline, res_adj, coupling,
                             mg_splines=splines[1:],
                             mg_couplings=couplings[1:],
                             cg_iters=25, polish_cg_iters=40)

rng = np.random.default_rng(0)
U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-3)
mask = spline.mask

# 1. residual: mp _res vs direct
r_mp = ns._res(ns.asm64, ns.mask64, U)
r_direct = mask * (spline.assemble_vector(res, U=U, apply_bcs=False)
                   if "apply_bcs" in
                   spline.assemble_vector.__code__.co_varnames
                   else spline.assemble_vector(res, U=U)) \
    + mask * coupling.residual(U)
print("residual diff:", float(jnp.linalg.norm(r_mp - r_direct)
                              / jnp.linalg.norm(r_direct)))

# 2. operator action vs dense tangent
st = ns._build(ns.asm_b64, U)
A = spline.assemble_matrix(res, U=U)          # BC'd dense
idx, K = coupling.tangent_block(U)
idxj = jnp.asarray(idx)
A = A.at[idxj[:, None], idxj[None, :]].add(
    K * mask[idxj][:, None] * mask[idxj][None, :])
W = jnp.asarray(rng.normal(size=spline.ndof))
y_st = mask * st(mask * W) + (1.0 - mask) * W
y_dn = A @ W
print("tangent action diff:", float(jnp.linalg.norm(y_st - y_dn)
                                    / jnp.linalg.norm(y_dn)))

# 3. dense of coarse op vs dense tangent at zero on the coarse spline
spc, cplc = splines[1], couplings[1]
opc = ns._coarse_sts[0]
Ac = mp_stencil_to_dense(opc)
Ad = spc.assemble_matrix(res, U=jnp.zeros(spc.ndof), apply_bcs=False) \
    if False else None
print("coarse dense built:", Ac.shape)

# 4. prolong adjointness: <P ec, rf> == <ec, P^T rf>
Pr = ns._Ps[0]
ec = jnp.asarray(rng.normal(size=spc.ndof))
rf = jnp.asarray(rng.normal(size=spline.ndof))
lhs = float(jnp.vdot(Pr.up(ec.astype(jnp.float32)),
                     rf.astype(jnp.float32)))
rhs = float(jnp.vdot(ec.astype(jnp.float32),
                     Pr.down(rf.astype(jnp.float32))))
print("prolong adjoint:", lhs, rhs)

# 5. inner-solve contraction on the fine stencil at zero state
U0 = jnp.zeros(spline.ndof)
st32 = ns._build(ns.asm_b32, U0.astype(jnp.float32))
b32 = (ns.mask32 * jnp.asarray(rng.normal(size=spline.ndof),
                               dtype=jnp.float32))
x = ns._inner_solve(st32, b32)
from tigar_tpu.solvers.newton_stencil import _masked_apply
lin = float(jnp.linalg.norm(b32 - _masked_apply(st32, ns.mask32, x))
            / jnp.linalg.norm(b32))
print("inner MG-CG linear rel:", lin)

# 6. a few solve iterations with logging
Usol, rel, steps, dU = ns.solve(rtol=1e-10, max_iters=8, log=print)
print("solve:", rel, steps)
