"""Probe (round 5, VERDICT item #3): SANewton on the REAL CHIP -- the
star-T-spline KL shell production point.

The space-agnostic third tier (coo tangent + multilevel-SA V-cycle) had
only CPU evidence through round 4.  This drives the valence-3
extraordinary-point T-spline shell (the bench_mlsa_shell.py operator
class) through the full mixed-precision solve on the TPU and measures:
  - SA hierarchy setup (host) + V-cycle compile/dispatch cost through
    the tunnel (the fused-recursion program, aggregation.MultilevelSA),
  - warm production f32 step and warm polish step,
  - the cross-backend floor certificate.

Usage: python scripts/probe_sa_tpu.py [nel] [cpu|tpu]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

NEL = int(sys.argv[1]) if len(sys.argv) > 1 else 48
DEV = sys.argv[2] if len(sys.argv) > 2 else "tpu"

if DEV == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp

from tigar_tpu.models.tsplines import (make_star_extraction,
                                       write_rhino_extraction,
                                       RhinoTSplineControlMesh)
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (precompute_shell_reference,
                                    svk_shell_adjoint)
from tigar_tpu.solvers.newton_sa import SANewton

E_MOD, NU, H_TH = 3.0e4, 0.3, 0.03
# clamped-plate scale: w_center ~ q R^4 / (64 D), D = 0.0742 -> q=0.4
# deflects ~2.7x thickness (genuinely nonlinear, same class as the
# single-patch headline at q=100)
Q = float(os.environ.get("SA_Q", "0.4"))


def star_shell(nel):
    bnet, nodes_list, ops_list = make_star_extraction(3, nel)
    f = os.path.join(tempfile.mkdtemp(), "s.iga")
    write_rhino_extraction(f, bnet, nodes_list, ops_list)
    cm = RhinoTSplineControlMesh(f)
    gen = EqualOrderSpline(3, cm)
    bd = cm.scalar_basis().boundary_dofs(1)
    for i in range(3):
        gen.add_zero_dofs(i, bd)
    return precompute_shell_reference(
        ExtractedSpline(gen, quad_degree=6, nders=2))


def res_adj(ctx, u):
    F = svk_shell_adjoint(ctx, u, E_MOD, NU, H_TH)
    return F._replace(val=F.val.at[2].add(-Q))


def main():
    t0 = time.time()
    spline = star_shell(NEL)
    print(f"star shell nel={NEL}: ndof={spline.ndof} "
          f"({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    ns = SANewton(spline, res_adj,
                  cg_iters=int(os.environ.get("SA_CG_ITERS", "120")),
                  polish_cg_iters=int(os.environ.get("SA_PCG_ITERS",
                                                     "160")),
                  setup_log=print, polish_tangent="f64",
                  polish_residual_device="cpu" if DEV == "tpu"
                  else "accel",
                  build_quad_degree=4, rebuild_rel=0.1,
                  sa_kwargs={"near_kernel": "linear"})
    print(f"setup {time.time() - t0:.1f}s", flush=True)

    # production f32 step (compile + warm)
    U0 = jnp.zeros(spline.ndof, dtype=spline.dtype)
    t0 = time.time()
    U1, rn, _ = ns.step(U0)
    _ = (float(rn), float(jnp.vdot(U1, U1)))
    print(f"f32 step compile+first: {time.time() - t0:.1f}s "
          f"(SA levels {ns._sa.n_levels if ns._sa else '?'}"
          f"{' sizes ' + str(ns._sa.level_sizes) if hasattr(ns._sa, 'level_sizes') else ''})",
          flush=True)
    best32 = np.inf
    Ui = U1
    for _ in range(2):
        t0 = time.time()
        Ui, rn, _ = ns.step(Ui)
        _ = float(jnp.vdot(Ui, Ui))
        best32 = min(best32, time.time() - t0)
    print(f"warm f32 step {best32 * 1e3:.1f} ms "
          f"({spline.ndof / best32:.3e} DoF/s)", flush=True)

    # full solve
    t0 = time.time()
    Usol, rel, steps, dU_rel = ns.solve(rtol=1e-10, log=print)
    t_solve = time.time() - t0
    r0 = float(jnp.linalg.norm(ns._res(ns.asm64, ns.mask64,
                                       jnp.zeros_like(Usol))))
    if DEV == "tpu":
        cross = ns.true_rel_residual(Usol, r0)
    else:
        cross = rel
    print(f"SOLVE: {t_solve:.1f}s {steps} steps rel={rel:.3e} "
          f"dU_rel={dU_rel:.2e} cross={cross:.3e}", flush=True)

    # warm polish step
    _, rn_p, _ = ns.polish_step(Usol, rebuild=False)
    _ = float(rn_p)
    best = np.inf
    for _ in range(2):
        t0 = time.time()
        _, rn_p, _ = ns.polish_step(Usol, rebuild=False)
        _ = float(rn_p)
        best = min(best, time.time() - t0)
    print(f"warm polish step {best * 1e3:.1f} ms "
          f"({spline.ndof / best:.3e} DoF/s)")
    # star-vertex deflection: the shared central control point's z
    # coefficient (the star DoF is the last merged node; use max |w|
    # as a robust proxy instead)
    w = np.asarray(Usol).reshape(3, -1)[2]
    print(f"max |w| coefficient ~ {np.max(np.abs(w)):.4f} (h={H_TH})")


if __name__ == "__main__":
    main()
