"""Generalized symmetric eigensolvers.

Replaces the reference's SLEPcEigenSolver usage (smallest-magnitude
generalized modes of (A, B) with BC modes shifted high via a large diagonal;
demos/euler-bernoulli-beam/modal-analysis.py:66-85).  Dense reduction via
Cholesky of B; LOBPCG hooks for large problems.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl


def generalized_eigh(A, B):
    """All eigenpairs of A x = lambda B x with A symmetric, B SPD.

    Returns (lam ascending, X) with X columns B-orthonormal eigenvectors.
    """
    L = jnp.linalg.cholesky(B)
    n = A.shape[0]
    Linv = jsl.solve_triangular(L, jnp.eye(n, dtype=A.dtype), lower=True)
    C = Linv @ A @ Linv.T
    C = 0.5 * (C + C.T)
    lam, Y = jnp.linalg.eigh(C)
    X = Linv.T @ Y
    return lam, X


def smallest_modes(A, B, n_modes):
    """First ``n_modes`` smallest-magnitude generalized eigenpairs."""
    lam, X = generalized_eigh(A, B)
    order = jnp.argsort(jnp.abs(lam))
    idx = order[:n_modes]
    return lam[idx], X[:, idx]


def lobpcg_smallest(solve_A, B_diag, n_modes, ndof, maxiter=100,
                    key=None, dtype=None):
    """Matrix-free smallest generalized eigenpairs of A x = lam B x with
    lumped (diagonal) B, via shift-invert LOBPCG: the largest modes of
    C^{-1} with C = B^{-1/2} A B^{-1/2}.

    solve_A : W -> A^{-1} @ W (any solver: CG on the tangent action, the
              mixed-precision refinement solver, or a dense factorization)
    B_diag  : [ndof] lumped mass diagonal (positive)

    Returns (lam ascending, X) with columns B-orthonormal up to LOBPCG
    tolerance.  Intended for modal problems too large to assemble densely
    (the dense path is generalized_eigh/smallest_modes).
    """
    import jax
    from jax.experimental.sparse.linalg import lobpcg_standard

    dtype = jnp.float64 if dtype is None else dtype
    s = jnp.sqrt(jnp.asarray(B_diag, dtype=dtype))

    def Cinv(X):
        # C^{-1} = B^{1/2} A^{-1} B^{1/2}
        return s[:, None] * jax.vmap(
            lambda col: solve_A(s * col), in_axes=1, out_axes=1)(X)

    if key is None:
        key = jax.random.PRNGKey(0)
    X0 = jax.random.normal(key, (ndof, n_modes), dtype=dtype)
    theta, Y, _ = lobpcg_standard(Cinv, X0, m=maxiter)
    lam = 1.0 / theta
    X = Y / s[:, None]
    order = jnp.argsort(lam)
    return lam[order], X[:, order]
