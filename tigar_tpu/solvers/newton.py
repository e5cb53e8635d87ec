"""Newton iteration with the reference's convergence bookkeeping
(tIGAr/common.py:1304-1348): relative residual norm against the initial
residual (or a caller-supplied reference error), rank-0-style logging, and a
hard failure on non-convergence.
"""

from __future__ import annotations

import jax.numpy as jnp


class NewtonError(RuntimeError):
    pass


def newton_solve(residual, solve_linearized, U0, max_iters=20, rtol=1e-5,
                 reference_error=None, log=False, update=None):
    """Solve residual(U) = 0.

    residual        : U -> r (BCs already applied)
    solve_linearized: (U, r) -> dU solving J(U) dU = r
    update          : optional (U, dU) -> U_new (default U - dU)

    Returns (U, n_iters).
    """
    U = U0
    initial_norm = None
    for it in range(max_iters):
        r = residual(U)
        norm = float(jnp.linalg.norm(r))
        if it == 0:
            initial_norm = norm if reference_error is None else float(reference_error)
        rel = norm / initial_norm if initial_norm > 0.0 else 0.0
        if log:
            print(f"Solver iteration: {it} , Relative norm: {rel}", flush=True)
        if rel < rtol:
            return U, it
        dU = solve_linearized(U, r)
        U = (U - dU) if update is None else update(U, dU)
    raise NewtonError(
        f"Newton nonlinear solve failed to converge in {max_iters} iterations")
