"""Linear solvers: dense direct + matrix-free Krylov (CG/GMRES/BiCGStab).

Replaces the reference's PETSc KSP path (dolfin.solve /
PETScKrylovSolver, tIGAr/common.py:1236-1263; GMRES+Jacobi configuration in
taylor-green-3d.py:89-91).  Matrix-free operators come straight from
JVPs of the assembled residual (ops/assembly.py), so no IGA matrix is ever
materialized on the Krylov path; the dense path exists for small systems,
eigenproblems, and as the default direct solve (the reference's default is
an LU factorization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.sparse.linalg as jsla


def solve_dense(A, b):
    """Dense direct solve.  Emulated-f64 LU does not lower on TPU ("Only
    F32 and C64 types are implemented in LuDecomposition"), so f64 systems
    living on an accelerator are factored on the host -- the dense path is
    for small systems anyway (ExtractedSpline.dense_threshold)."""
    if (jnp.issubdtype(jnp.asarray(A).dtype, jnp.float64)
            and not isinstance(A, jax.core.Tracer)
            and any(d.platform != "cpu" for d in A.devices())):
        import numpy as np
        return jnp.asarray(np.linalg.solve(np.asarray(A), np.asarray(b)))
    return jnp.linalg.solve(A, b)


def jacobi_preconditioner(diag):
    dinv = jnp.where(diag != 0.0, 1.0 / diag, 1.0)
    return lambda r: dinv * r


def cg_fixed_iters(action, b, n_iters, M=None, x0=None):
    """Preconditioned CG with a static iteration count (lax.fori_loop).

    No data-dependent exit condition, so the whole solve compiles to one
    on-device loop -- required for fast execution on TPU backends where a
    while_loop condition forces host round-trips.  Returns (x, r) with r the
    final residual vector.
    """
    if M is None:
        M = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    r0 = b - action(x0)
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def body(_, state):
        x, r, p, rz = state
        Ap = action(p)
        pAp = jnp.vdot(p, Ap)
        alpha = jnp.where(pAp != 0.0, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz != 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, r, _, _ = jax.lax.fori_loop(0, n_iters, body,
                                   (x0, r0, p0, rz0))
    return x, r


def cg_device_iters(action, b, n_iters, M=None, x0=None, tol=None,
                    check_every=20):
    """Fixed-iteration preconditioned CG as a PYTHON-level loop with device
    scalars: every operation dispatches asynchronously and nothing syncs
    the host until the caller fetches a value, but no single fused program
    is ever built.

    Use instead of ``cg_fixed_iters`` when the one-program compile is
    prohibitive -- e.g. a deep V-cycle preconditioner plus a chunked
    contact tangent inside the loop body, through this machine's
    remote-compile tunnel.  Runtime is dispatch-bound but asynchronous;
    each constituent jitted action compiles once, separately.

    ``tol``: optional relative-residual early exit, checked on the host
    every ``check_every`` iterations (each check costs one ~30 ms
    value-fetch round trip through the tunnel -- keep check_every large
    enough that checks amortize).  Returns (x, r)."""
    if M is None:
        M = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x = x0
    r = b - action(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = float(jnp.linalg.norm(b)) if tol is not None else None
    for it in range(int(n_iters)):
        Ap = action(p)
        pAp = jnp.vdot(p, Ap)
        alpha = jnp.where(pAp != 0.0, rz / pAp, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz != 0.0, rz_new / rz, 0.0)
        p = z + beta * p
        rz = rz_new
        if (tol is not None and (it + 1) % int(check_every) == 0
                and float(jnp.linalg.norm(r)) <= tol * bnorm):
            break
    return x, r


def fcg_device_iters(action, b, n_iters, M=None, x0=None, tol=None,
                     check_every=20):
    """FLEXIBLE preconditioned CG (Polak-Ribiere beta) as a python-level
    device loop (the cg_device_iters dispatch discipline).

    Required when ``M`` is a NOISY or slightly varying preconditioner --
    an f32 multigrid/SA V-cycle inside an f64 recurrence: Fletcher-Reeves
    PCG loses conjugacy under a varying M and STALLS at the
    preconditioner's noise level (measured round 3 at 256^2 shells: 90 FR
    iterations contract no better than 30), while the PR beta
    re-orthogonalizes against the previous residual and restores
    convergence.  Returns (x, r)."""
    if M is None:
        M = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x = x0
    r = b - action(x)
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = float(jnp.linalg.norm(b)) if tol is not None else None
    for it in range(int(n_iters)):
        Ap = action(p)
        pAp = jnp.vdot(p, Ap)
        alpha = jnp.where(pAp != 0.0, rz / pAp, 0.0)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z = M(r_new)
        rz_new = jnp.vdot(r_new, z)
        beta = jnp.where(rz != 0.0, jnp.vdot(r_new - r, z) / rz, 0.0)
        beta = jnp.maximum(beta, 0.0)
        p = z + beta * p
        r = r_new
        rz = rz_new
        if (tol is not None and (it + 1) % int(check_every) == 0
                and float(jnp.linalg.norm(r)) <= tol * bnorm):
            break
    return x, r


def cg_state_init(action, M, b, x0):
    """Initial PCG state pytree for cg_step (shared by the fused
    fixed-iteration, python-level, and BLOCKED drivers)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - action(x)
    z = M(r)
    return (x, r, z, jnp.vdot(r, z))


def cg_step(action, M, st):
    """One preconditioned-CG iteration on the state pytree
    (x, r, p, rz) -- pure, safe inside lax.fori_loop."""
    x, r, p, rz = st
    Ap = action(p)
    pAp = jnp.vdot(p, Ap)
    alpha = jnp.where(pAp != 0.0, rz / pAp, 0.0)
    x = x + alpha * p
    r = r - alpha * Ap
    z = M(r)
    rz_new = jnp.vdot(r, z)
    beta = jnp.where(rz != 0.0, rz_new / rz, 0.0)
    return (x, r, z + beta * p, rz_new)


def bicgstab_state_init(action, M, b, x0):
    """Initial BiCGStab state pytree for bicgstab_step."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - action(x)
    one = jnp.ones((), dtype=b.dtype)
    z = jnp.zeros_like(b)
    return (x, r, r, one, one, one, z, z)


def bicgstab_step(action, M, st):
    """One preconditioned-BiCGStab iteration on the state pytree
    (x, r, rhat, rho, alpha, omega, v, p) -- pure, fori_loop-safe."""
    x, r, rhat, rho, alpha, omega, v, p = st
    rho_new = jnp.vdot(rhat, r)
    beta = jnp.where(rho * omega != 0.0,
                     (rho_new / rho) * (alpha / omega), 0.0)
    p = r + beta * (p - omega * v)
    phat = M(p)
    v = action(phat)
    denom = jnp.vdot(rhat, v)
    alpha = jnp.where(denom != 0.0, rho_new / denom, 0.0)
    s = r - alpha * v
    shat = M(s)
    t = action(shat)
    tt = jnp.vdot(t, t)
    omega = jnp.where(tt != 0.0, jnp.vdot(t, s) / tt, 0.0)
    x = x + alpha * phat + omega * shat
    r = s - omega * t
    return (x, r, rhat, rho_new, alpha, omega, v, p)


KRYLOV_STEPS = {"cg": (cg_state_init, cg_step),
                "bicgstab": (bicgstab_state_init, bicgstab_step)}


def bicgstab_device_iters(action, b, n_iters, M=None, x0=None, tol=None,
                          check_every=20):
    """Preconditioned BiCGStab as a PYTHON-level loop over jitted device
    actions (the nonsymmetric analog of ``cg_device_iters``), with an
    optional host-checked relative-residual exit every ``check_every``
    iterations.

    This is the production Krylov path for NONSYMMETRIC tangents
    (NS convection) on accelerator backends: jax.scipy's
    ``bicgstab``/``cg`` lower to a data-dependent ``lax.while_loop``,
    and through this machine's remote-compile tunnel that program class
    is catastrophically slow, and its first execution on the TG-3D RT
    space reproducibly CRASHED the TPU worker (round 3,
    models/extracted._solve_linearized routes around it).
    Returns (x, r)."""
    if M is None:
        M = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
    one = jnp.ones((), dtype=b.dtype)
    x = x0
    r = b - action(x)
    rhat = r
    rho = alpha = omega = one
    v = jnp.zeros_like(b)
    p = jnp.zeros_like(b)
    bnorm = float(jnp.linalg.norm(b)) if tol is not None else None
    for it in range(int(n_iters)):
        rho_new = jnp.vdot(rhat, r)
        beta = jnp.where(rho * omega != 0.0,
                         (rho_new / rho) * (alpha / omega), 0.0)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = action(phat)
        denom = jnp.vdot(rhat, v)
        alpha = jnp.where(denom != 0.0, rho_new / denom, 0.0)
        s = r - alpha * v
        shat = M(s)
        t = action(shat)
        tt = jnp.vdot(t, t)
        omega = jnp.where(tt != 0.0, jnp.vdot(t, s) / tt, 0.0)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        rho = rho_new
        if (tol is not None and (it + 1) % int(check_every) == 0
                and float(jnp.linalg.norm(r)) <= tol * bnorm):
            break
    return x, r


def solve_krylov(action, b, x0=None, method="cg", tol=1e-12, atol=0.0,
                 maxiter=None, M=None):
    """Solve action(x) = b matrix-free.

    method: 'cg' (SPD), 'bicgstab', or 'gmres'.
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if method == "cg":
        x, _ = jsla.cg(action, b, x0=x0, tol=tol, atol=atol, maxiter=maxiter,
                       M=M)
    elif method == "bicgstab":
        x, _ = jsla.bicgstab(action, b, x0=x0, tol=tol, atol=atol,
                             maxiter=maxiter, M=M)
    elif method == "gmres":
        x, _ = jsla.gmres(action, b, x0=x0, tol=tol, atol=atol,
                          maxiter=maxiter, M=M, solve_method="batched")
    else:
        raise ValueError(f"unknown Krylov method {method!r}")
    return x
