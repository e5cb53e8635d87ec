"""Generalized eigensolvers: symmetric (dense, subspace, LOBPCG) and
nonsymmetric (restarted Arnoldi, shift-invert).

Replaces the reference's SLEPcEigenSolver usage (smallest-magnitude
generalized modes of (A, B) with BC modes shifted high via a large diagonal;
demos/euler-bernoulli-beam/modal-analysis.py:66-85).  Dense reduction via
Cholesky of B; LOBPCG hooks for large problems; arnoldi_eigs /
shift_invert_eigs cover the nonsymmetric pencils (convection tangents)
SLEPc's generic problem types would handle in the reference stack.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl


def generalized_eigh(A, B):
    """All eigenpairs of A x = lambda B x with A symmetric, B SPD.

    Returns (lam ascending, X) with X columns B-orthonormal eigenvectors.

    f64 pencils living on an accelerator are reduced on the HOST in true
    IEEE f64 (same routing rule as solvers.linear.solve_dense): the TPU
    has no f64 cholesky/eigh lowering and the demoted computation is
    silently WRONG -- with the BC modes shifted to diag=1e14 (the
    reference's modal-analysis.py:66-69 pattern), eps32 * 1e14 ~ 6e6
    noise wipes out the entire physical spectrum (measured: the beam
    demo printed omega_0 = 577 instead of 3.52 on the TPU backend)."""
    import jax
    A = jnp.asarray(A)
    if (jnp.issubdtype(A.dtype, jnp.float64)
            and not isinstance(A, jax.core.Tracer)
            and any(d.platform != "cpu" for d in A.devices())):
        import numpy as np
        An, Bn = np.asarray(A), np.asarray(B)
        L = np.linalg.cholesky(Bn)
        Linv = np.linalg.solve(L, np.eye(An.shape[0]))
        C = Linv @ An @ Linv.T
        lam, Y = np.linalg.eigh(0.5 * (C + C.T))
        return jnp.asarray(lam), jnp.asarray(Linv.T @ Y)
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


def arnoldi_eigs(op, n_modes, ndof, n_krylov=None, n_restarts=8,
                 tol=1e-10, key=None, dtype=None, which="LM"):
    """Matrix-free eigenpairs of a (generally NONSYMMETRIC) operator by
    explicitly restarted Arnoldi: the SLEPc-generality piece the
    symmetric solvers above do not cover (reference: SLEPcEigenSolver
    accepts arbitrary problem types / spectral transforms,
    demos/euler-bernoulli-beam/modal-analysis.py:74-76; nonsymmetric
    pencils arise here from convection tangents, where CG is already
    documented as wrong and bicgstab is the solver).

    op : x [ndof] -> A @ x, any jitted action (dispatched from a
         python-level loop -- the same async pattern as cg_device_iters;
         an inner lax.while_loop would pay a host round-trip per
         iteration through the remote tunnel).
    which : "LM" largest magnitude | "LR" largest real part | "SR"
         smallest real part -- selection among the Ritz values.

    Returns (lam [n_modes] complex128 numpy, X [ndof, n_modes] complex128
    numpy, res [n_modes] numpy): Ritz pairs with explicit residual norms
    |A x - lam x| / |lam x| (the honest convergence certificate; restarts
    stop early when all wanted residuals are below ``tol``).  The small
    Hessenberg eigenproblem and the complex recombination run on the host
    (no complex/f64 eig lowering on TPU)."""
    import jax
    import numpy as np

    dtype = jnp.float64 if dtype is None else dtype
    m = int(n_krylov or max(2 * n_modes + 8, 20))
    m = min(m, ndof)
    if key is None:
        key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (ndof,), dtype=dtype)

    def select(lam):
        if which == "LM":
            return np.argsort(-np.abs(lam))
        if which == "LR":
            return np.argsort(-lam.real)
        if which == "SR":
            return np.argsort(lam.real)
        raise ValueError(f"unknown which={which!r}")

    for _ in range(int(n_restarts)):
        V = [v0 / jnp.linalg.norm(v0)]
        H = np.zeros((m + 1, m), dtype=np.float64)
        for k in range(m):
            w = op(V[k])
            # modified Gram-Schmidt, one re-orthogonalization pass
            for _pass in range(2):
                for j in range(k + 1):
                    h = float(jnp.vdot(V[j], w))
                    H[j, k] += h
                    w = w - h * V[j]
            hk = float(jnp.linalg.norm(w))
            H[k + 1, k] = hk
            if hk < 1e-14 * max(1.0, abs(H[k, k])):
                m = k + 1
                H = H[:m + 1, :m]
                break
            V.append(w / hk)
        lam_all, Y = np.linalg.eig(H[:m, :m])
        order = select(lam_all)[:n_modes]
        lam = lam_all[order]
        Yw = Y[:, order]
        # Ritz residual: |A x - lam x| = |h_{m+1,m}| * |last component|
        res = np.abs(H[m, m - 1] * Yw[-1, :]) / np.maximum(
            np.abs(lam), 1e-300)
        Vh = np.stack([np.asarray(v) for v in V[:m]], axis=1)
        X = Vh @ Yw
        X = X / np.linalg.norm(X, axis=0, keepdims=True)
        if np.all(res <= tol):
            break
        # explicit restart: real combination of the wanted Ritz vectors
        comb = (X.real + X.imag) @ (1.0 + np.arange(len(lam)))
        nrm = np.linalg.norm(comb)
        if nrm < 1e-30:
            comb = X.real[:, 0]
            nrm = np.linalg.norm(comb)
        v0 = jnp.asarray(comb / nrm, dtype=dtype)
    return lam, X, res


def shift_invert_eigs(solve_shifted, n_modes, ndof, sigma=0.0,
                      B_action=None, **kwargs):
    """Eigenvalues of A x = lam (B) x nearest ``sigma`` via shift-invert
    Arnoldi: op = (A - sigma B)^{-1} B (B=I when B_action is None);
    Arnoldi's largest-magnitude theta map back as lam = sigma + 1/theta.
    ``solve_shifted`` is any solver for (A - sigma B) y = r (host LU,
    bicgstab on the tangent action, the MG solvers...); A may be
    nonsymmetric.  Returns (lam, X, res) as arnoldi_eigs."""
    if B_action is None:
        op = lambda x: solve_shifted(x)
    else:
        op = lambda x: solve_shifted(B_action(x))
    kwargs.setdefault("which", "LM")
    theta, X, res = arnoldi_eigs(op, n_modes, ndof, **kwargs)
    lam = sigma + 1.0 / theta
    return lam, X, res


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
