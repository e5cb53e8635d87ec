"""Geometric h-multigrid preconditioner via exact knot-insertion transfers.

The reference inherits PETSc's preconditioner zoo through the KSP options
database (tIGAr/common.py:11-12, 1236-1263); this framework's matrix-free
Krylov path previously offered Jacobi only.  This module adds the natural
IGA preconditioner: nested spline spaces under knot insertion give an EXACT
prolongation V_coarse -> V_fine (Boehm's algorithm, ops/refine.py), so a
geometric V-cycle with weighted-Jacobi smoothing and a precomputed dense
coarse inverse yields h-independent CG iteration counts.

TPU-native design notes:
  - transfers are separable: one small [ncp_f, ncp_c] matrix per parametric
    direction per field, applied as per-axis tensordots on the MXU (the
    Kronecker product is never materialized);
  - all level operators are the framework's jit-cached matrix-free tangent
    actions (ExtractedSpline.tangent_action) -- no sparse matrices;
  - the coarse solve is a precomputed dense inverse (host LU at setup),
    applied as a single matmul: TPU-friendly, and avoids jnp.linalg.solve,
    which does not lower for emulated f64 on TPU;
  - the V-cycle is a fixed linear operator (zero initial guess, symmetric
    pre/post smoothing), hence a valid SPD preconditioner for CG.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.knots import KnotVector
from ..ops.refine import insert_knot
from ..config import KNOT_NEAR_EPS


# -- knot-vector nesting ------------------------------------------------------------


def coarsen_knots(knots, p=None):
    """Remove every other interior unique knot (keeping multiplicities):
    the standard geometric coarsening, exact inverse of one dyadic
    refinement for uniform vectors.  Returns a plain knot array."""
    kv = knots if isinstance(knots, KnotVector) else KnotVector(p, knots)
    if kv.is_periodic:
        raise NotImplementedError("multigrid coarsening requires open knots")
    uniq, mult = kv.unique_knots, kv.multiplicities
    out = [uniq[0]] * int(mult[0])
    for i in range(1, len(uniq) - 1):
        if i % 2 == 0:
            out += [uniq[i]] * int(mult[i])
    out += [uniq[-1]] * int(mult[-1])
    return np.asarray(out, dtype=np.float64)


def insertion_matrix_1d(kv_coarse: KnotVector, kv_fine: KnotVector):
    """[ncp_f, ncp_c] refinement matrix: fine coefficients representing the
    same function as given coarse coefficients (exact for nested knots).
    Built by running Boehm knot insertion (ops/refine.py) on identity
    coefficient columns."""
    if kv_coarse.p != kv_fine.p:
        raise ValueError("multigrid levels must share the spline degree")
    if kv_coarse.is_periodic or kv_fine.is_periodic:
        raise NotImplementedError("periodic knot vectors are not supported")
    ck = list(kv_coarse.knots)
    fk = list(kv_fine.knots)
    # multiset difference fine \ coarse (with tolerance)
    missing = []
    i = 0
    for u in fk:
        if i < len(ck) and abs(ck[i] - u) <= KNOT_NEAR_EPS:
            i += 1
        else:
            missing.append(u)
    if i != len(ck):
        raise ValueError("coarse knot vector is not nested in the fine one")
    kv = np.asarray(ck, dtype=np.float64)
    M = np.eye(kv_coarse.ncp)
    for u in missing:
        kv, M = insert_knot(kv_coarse.p, kv, M, float(u))
    if len(kv) != len(fk) or np.max(np.abs(kv - np.asarray(fk))) \
            > 10 * KNOT_NEAR_EPS:
        raise ValueError("knot insertion did not reproduce the fine vector")
    assert M.shape == (kv_fine.ncp, kv_coarse.ncp)
    return M


def _tensor_apply(mats, vec, shape_in, shape_out):
    """Apply per-direction matrices to a flattened tensor-product
    coefficient vector (direction 0 fastest -> axis dim-1-d holds
    direction d after a C-order reshape)."""
    dim = len(mats)
    grid = vec.reshape(tuple(reversed(shape_in)))
    for d, P in enumerate(mats):
        axis = dim - 1 - d
        grid = jnp.moveaxis(jnp.tensordot(P, grid, axes=(1, axis)), 0, axis)
    return grid.reshape(int(np.prod(shape_out)))


class _FieldTransfer:
    """Separable prolongation/restriction for one tensor-product field."""

    def __init__(self, basis_coarse, basis_fine, dtype):
        if not (hasattr(basis_coarse, "kvs") and hasattr(basis_fine, "kvs")):
            raise NotImplementedError(
                "multigrid transfers require tensor-product fields "
                "(multipatch/T-spline hierarchies are not supported)")
        self.mats = [jnp.asarray(insertion_matrix_1d(kc, kf), dtype=dtype)
                     for kc, kf in zip(basis_coarse.kvs, basis_fine.kvs)]
        self.shape_c = tuple(kv.ncp for kv in basis_coarse.kvs)
        self.shape_f = tuple(kv.ncp for kv in basis_fine.kvs)

    def prolong(self, xc):
        return _tensor_apply(self.mats, xc, self.shape_c, self.shape_f)

    def restrict(self, xf):
        matsT = [P.T for P in self.mats]
        return _tensor_apply(matsT, xf, self.shape_f, self.shape_c)


class Multigrid:
    """V-cycle preconditioner over a list of ExtractedSplines
    [fine, ..., coarse] discretizing the same problem (same form, same BCs,
    nested knot vectors per field).

    Use as the ``M`` argument of solvers.linear.solve_krylov /
    cg_fixed_iters, or via ExtractedSpline.set_solver_options(
    linear_solver="mg_cg", mg_levels=[...coarser splines...]).

    The level operators are matrix-free tangent actions of ``form`` at the
    zero state (exact for linear problems; for Newton tangents the V-cycle
    still preconditions well as long as the zero-state bilinear structure
    dominates).  ``n_smooth`` weighted-Jacobi sweeps (omega) are applied
    before and after coarse correction; the coarsest level is inverted
    exactly with a dense inverse computed on the host at setup.
    """

    def __init__(self, splines, form, params=None, n_smooth=2, omega=0.7,
                 states=None):
        if len(splines) < 2:
            raise ValueError("need at least two levels")
        self.splines = list(splines)
        self.form = form
        self.params = params
        self.n_smooth = int(n_smooth)
        self.omega = float(omega)
        dtype = splines[0].dtype
        states = [None] * len(splines) if states is None else list(states)

        self.levels = []
        for spline, U in zip(self.splines, states):
            U_ = (jnp.zeros(spline.ndof, dtype=spline.dtype)
                  if U is None else U)
            diag = spline.assemble_diagonal(form, U=U_, params=params)
            self.levels.append({
                "spline": spline,
                "U": U_,
                "dinv": jnp.where(diag != 0.0, 1.0 / diag,
                                  jnp.ones_like(diag)),
                "mask": spline.mask,
            })

        # per-adjacent-pair field transfers (fine level l -> coarse l+1)
        self.transfers = []
        for lf, lc in zip(self.splines[:-1], self.splines[1:]):
            if lf.space.nfields != lc.space.nfields:
                raise ValueError("levels must have matching field counts")
            ts = [_FieldTransfer(bc, bf, dtype)
                  for bc, bf in zip(lc.space.fields, lf.space.fields)]
            self.transfers.append(ts)

        # coarse dense inverse (host LU; jnp.linalg.solve has no TPU-f64
        # lowering, and a stored inverse turns the coarse solve into one
        # MXU matmul per V-cycle)
        coarse = self.splines[-1]
        A_c = np.asarray(coarse.assemble_matrix(
            form, U=self.levels[-1]["U"], params=params))
        self._coarse_inv = jnp.asarray(np.linalg.inv(A_c), dtype=dtype)

    # -- level algebra ---------------------------------------------------------

    def _action(self, level, W):
        lev = self.levels[level]
        return lev["spline"].tangent_action(self.form, lev["U"], W,
                                            params=self.params)

    def _prolong(self, level, xc):
        """Coarse (level+1) -> fine (level)."""
        ts = self.transfers[level]
        sc = self.splines[level + 1].space
        parts = [t.prolong(xc[sc.field_slice(f)])
                 for f, t in enumerate(ts)]
        return jnp.concatenate(parts)

    def _restrict(self, level, xf):
        """Fine (level) -> coarse (level+1)."""
        ts = self.transfers[level]
        sf = self.splines[level].space
        parts = [t.restrict(xf[sf.field_slice(f)])
                 for f, t in enumerate(ts)]
        return jnp.concatenate(parts)

    def _vcycle(self, level, b):
        if level == len(self.levels) - 1:
            return self._coarse_inv @ b
        lev = self.levels[level]
        om_dinv = self.omega * lev["dinv"]
        x = om_dinv * b
        for _ in range(self.n_smooth - 1):
            x = x + om_dinv * (b - self._action(level, x))
        r = b - self._action(level, x)
        rc = self.levels[level + 1]["mask"] * self._restrict(level, r)
        ec = self._vcycle(level + 1, rc)
        x = x + lev["mask"] * self._prolong(level, ec)
        for _ in range(self.n_smooth):
            x = x + om_dinv * (b - self._action(level, x))
        return x

    def __call__(self, r):
        """One V-cycle from a zero initial guess: a fixed SPD linear
        operator, valid as a CG preconditioner."""
        return self._vcycle(0, r)
