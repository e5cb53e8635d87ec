"""Validation probe for the multipatch spectrum-safe Jacobi omega
(newton_stencil_mp._OMEGA_FAC): dense two-grid error-propagation spectral
radii on the 3-patch L-shell at nel=2/4/6.

MEASURED (round 5, this probe + the deleted debug_npatch2-8 ancestry):
- production omega=0.7 DIVERGES the V-cycle at nel>=4: rho(two-grid)
  2.67-3.29 with/without Schwarz.  lam_max(D^-1 A) = 4.5-5.5 >> 2/0.7:
  penalty-interface rows reach 5.1, and even the pure-stencil complement
  reaches 3.28 on anisotropic-element patches (the divergent mode is a
  patch-2 interior bending mode, so Schwarz-on-support cannot save it).
- Galerkin (P^T A P) vs rediscretized coarse operator: IDENTICAL rho
  (2.669 both) -- the coarse correction was never the problem.
- EXACT-submatrix Schwarz blocks (S_k = A[idx,idx]) vs the production
  diagonal-approximate ones: no measurable difference (0.884 vs 0.886)
  once omega is safe; rho(exact Schwarz alone) = 1.0 exactly.
- omega_eff = 1.8/lam_max (power-iteration estimate): rho(two-grid)
  0.81-0.91 across nel=2/4/6, 2 or 3 sweeps, full or complement Jacobi
  -- nearly h-independent.  THE WHOLE FIX IS THE DAMPING."""

import sys
import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg as sla

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

from tests.test_newton_mp import (_l_shell, _l_couplings, _res_adj_factory,
                                  E_MOD, NU, H_TH)
from tigar_tpu.solvers.newton_stencil_mp import (MultiPatchStencilNewton,
                                                 mp_stencil_to_dense)


def setup(nel):
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
    ns = MultiPatchStencilNewton(
        splines[0], _res_adj_factory(), couplings[0],
        mg_splines=splines[1:], mg_couplings=couplings[1:],
        cg_iters=30, polish_cg_iters=50)
    return ns, splines[0]


def analyze(nel):
    ns, spline = setup(nel)
    st32 = ns._build(ns.asm_b32, jnp.zeros(spline.ndof, dtype=jnp.float32))
    mask = np.asarray(ns.mask64)
    n = spline.ndof
    A = mp_stencil_to_dense(st32).astype(np.float64)
    Abc = mask[:, None] * A * mask[None, :] + np.diag(1.0 - mask)
    Abc = 0.5 * (Abc + Abc.T)
    d = np.diag(Abc).copy()
    I = np.eye(n)
    sup = np.zeros(n, bool)
    for blk in st32.ifaces:
        sup[np.asarray(blk.idx)] = True
    comp = ~sup

    # power iteration on D^-1 A (as production would run it)
    rng = np.random.default_rng(1)
    x = rng.normal(size=n)
    for _ in range(30):
        x = (Abc @ x) / d
        x /= np.linalg.norm(x)
    lam_full = float(x @ (Abc @ x) / (x @ (d * x)))

    C = None
    for blk in st32.ifaces:
        idx = np.asarray(blk.idx)
        Sk = Abc[np.ix_(idx, idx)]
        Ck = np.zeros((n, n))
        Ck[np.ix_(idx, idx)] = np.linalg.inv(Sk)
        C = Ck if C is None else C + Ck @ (I - Abc @ C)
    Sch = I - C @ Abc

    nc = ns._coarse_sts[0].ndof
    P = np.zeros((n, nc))
    for i in range(nc):
        e = np.zeros(nc, np.float32)
        e[i] = 1.0
        P[:, i] = np.asarray(ns._Ps[0].up(jnp.asarray(e)))
    mc = np.asarray(ns._coarse_masks[0], dtype=np.float64)
    P = mask[:, None] * P * mc[None, :]
    Ac = mp_stencil_to_dense(ns._coarse_sts[0]).astype(np.float64)
    Ac = mc[:, None] * Ac * mc[None, :] + np.diag(1.0 - mc)
    CGC = I - P @ np.linalg.solve(Ac, P.T @ Abc)

    print(f"nel={nel}: n={n} lam_full(power)={lam_full:.3f}", flush=True)
    for fac in (1.5, 1.8):
        om = fac / lam_full
        for nsw in (2, 3):
            Jc = I - np.diag(om / d * comp) @ Abc
            Jf = I - np.diag(om / d) @ Abc
            for tag, J in (("comp", Jc), ("full", Jf)):
                E = Sch @ np.linalg.matrix_power(J, nsw)
                E2 = E @ CGC @ E
                rho = np.max(np.abs(np.linalg.eigvals(E2)))
                print(f"  fac={fac} sweeps={nsw} {tag}-J: "
                      f"rho(two-grid)={rho:.3f}", flush=True)


for nel in (2, 4, 6):
    analyze(nel)
