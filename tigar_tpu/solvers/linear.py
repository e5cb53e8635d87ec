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
    return jnp.linalg.solve(A, b)


def jacobi_preconditioner(diag):
    dinv = jnp.where(diag != 0.0, 1.0 / diag, 1.0)
    return lambda r: dinv * r


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
