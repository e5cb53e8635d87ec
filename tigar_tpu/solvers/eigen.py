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


def subspace_smallest_general(A_action, solve_A, B_action, n_modes, ndof,
                              n_iter=30, n_extra=None, tol=1e-10,
                              key=None, dtype=None):
    """Matrix-free smallest generalized eigenpairs of A x = lam B x with a
    CONSISTENT (non-lumped) B: block inverse subspace iteration with
    B-orthonormalization and Rayleigh-Ritz acceleration.

    Each sweep maps the block X <- A^{-1} B X (any solver for A),
    B-orthonormalizes via the Gram Cholesky, and rotates by the small
    [m, m] Ritz problem X^T A X -- everything matrix-free in A, A^{-1},
    and B.  Covers the SLEPc generality gap beyond ``lobpcg_smallest``'s
    lumped-B shift-invert (reference: SLEPcEigenSolver spectral
    transforms, demos/euler-bernoulli-beam/modal-analysis.py:74-76);
    symmetric-definite pencils only.

    Returns (lam ascending [n_modes], X [ndof, n_modes] B-orthonormal).
    """
    import jax

    dtype = jnp.float64 if dtype is None else dtype
    m = n_modes + (max(2, n_modes // 2) if n_extra is None else n_extra)
    if key is None:
        key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (ndof, m), dtype=dtype)

    def cols(op, M):
        return jnp.stack([op(M[:, j]) for j in range(M.shape[1])], axis=1)

    lam_prev = None
    for _ in range(int(n_iter)):
        import numpy as _np
        Y = cols(solve_A, cols(B_action, X))
        # B-orthonormalize: G = Y^T B Y = L L^T, Y <- Y L^{-T}.  The tiny
        # [m, m] factorizations run on the host: f64 Cholesky/eigh have no
        # TPU lowering, and at block size m they are microseconds anyway.
        BY = cols(B_action, Y)
        G = _np.asarray(Y.T @ BY)
        G = 0.5 * (G + G.T)
        Linv = _np.linalg.inv(_np.linalg.cholesky(G))
        Y = Y @ jnp.asarray(Linv.T, dtype=dtype)
        # Rayleigh-Ritz in the B-orthonormal basis
        AY = cols(A_action, Y)
        Ah = _np.asarray(Y.T @ AY)
        Ah = 0.5 * (Ah + Ah.T)
        lam, Q = _np.linalg.eigh(Ah)
        lam = jnp.asarray(lam, dtype=dtype)
        X = Y @ jnp.asarray(Q, dtype=dtype)
        if lam_prev is not None:
            drift = float(jnp.max(jnp.abs(lam[:n_modes]
                                          - lam_prev[:n_modes])
                                  / jnp.maximum(jnp.abs(lam[:n_modes]),
                                                1e-300)))
            if drift < tol:
                break
        lam_prev = lam
    return lam[:n_modes], X[:, :n_modes]


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
