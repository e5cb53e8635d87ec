"""Algebraic two-level smoothed-aggregation (SA) preconditioning for
NON-tensor-product spline spaces.

Geometric knot-insertion multigrid (solvers/multigrid.py) covers
tensor-product patches, multipatch unions, and periodic fields; what it
cannot serve are the genuinely unstructured families -- Bezier-extracted
T-splines with extraordinary points and C0-merged spaces with ragged
connectivity -- exactly where conditioning is worst (the reference gets
arbitrary PETSc preconditioners there through the options database,
tIGAr/common.py:11-12,1255-1258; this module is the TPU-native
replacement for that remaining slice of the PC zoo).

Method (classical smoothed aggregation, two-level):
  1. aggregate CONTROL POINTS geometrically -- every spline family here
     carries physical control-point positions (the dehomogenized control
     net), so aggregation is a host-side grid bucketing of those
     positions, O(ncp);
  2. tentative prolongation T: every free DoF joins the (field, aggregate)
     coarse DoF of its control point with weight 1 (constrained DoFs stay
     out: the BC'd operator has zeroRowsColumns/unit-diagonal structure
     and Jacobi alone is exact there);
  3. smoothed prolongation P = (I - omega_P D^{-1} A) T (one weighted-
     Jacobi smoothing pass applied to the coarse basis -- the standard SA
     step that turns blocky aggregate functions into overlapping smooth
     ones; omega_P=0 gives plain aggregation);
  4. Galerkin coarse operator A_c = P^T A P, dense-factored on the host
     (aggregates hold O(coarsen^dim) points, so A_c is ncp/coarsen^dim
     -- small);
  5. the preconditioner apply is a symmetric V(n,n) two-level cycle:
     weighted-Jacobi pre-smooth, coarse correction, Jacobi post-smooth --
     all f32 on device (coo matvec via scatter-add; dense P matvecs on
     the MXU), cast at the borders, so it slots into f64 outer CG the
     same way the f32 geometric V-cycle does (newton_stencil
     .make_stencil_mgcg_mixed rationale).

Setup costs one BCOO assembly of the operator plus host-side coo
products; it is meant for the demo-class unstructured problems (ncp up
to a few 10^4), not the 10^6-DoF tensor-product path, which has the
(faster) geometric hierarchy anyway.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def grid_aggregates(points, h):
    """Bucket points [n, d] into axis-aligned grid cells of size ``h``;
    returns integer labels [n] in [0, n_aggregates)."""
    pts = np.asarray(points, dtype=np.float64)
    cells = np.floor((pts - pts.min(axis=0, keepdims=True)) / float(h))
    cells = cells.astype(np.int64)
    _, labels = np.unique(cells, axis=0, return_inverse=True)
    return labels


def control_point_aggregates(spline, coarsen=3.0):
    """Aggregate a spline space's scalar control points by physical
    position: cell size = ``coarsen`` x the mean control-point spacing
    (d-th root of bounding-box volume per point).  Requires an
    equal-order space (every field shares the control basis's points --
    the T-spline / merged-multipatch situation this module targets)."""
    for f in spline.space.fields:
        if f is not spline.space.fields[0]:
            raise ValueError("control_point_aggregates requires an "
                             "equal-order space")
    bnet = np.asarray(spline.bnet, dtype=np.float64)
    pts = bnet[:, :-1] / bnet[:, -1:]
    ext = pts.max(axis=0) - pts.min(axis=0)
    ext = ext[ext > 0]
    h = float(coarsen) * float(np.prod(ext) / pts.shape[0]) ** (1.0 /
                                                                len(ext))
    return grid_aggregates(pts, h)


class TwoLevelSA:
    """Symmetric two-level smoothed-aggregation preconditioner (see module
    docstring).  Build with ``from_coo`` / ``from_spline``; the instance
    is callable as M(r) inside any Krylov loop (f32 internally, casts at
    the borders)."""

    def __init__(self, rows, cols, vals, dinv, P, Ac_inv, omega, n_smooth,
                 ndof):
        self._rows = rows
        self._cols = cols
        self._vals = vals
        self._dinv = dinv
        self._P = P
        self._Ac_inv = Ac_inv
        self._omega = float(omega)
        self._n_smooth = int(n_smooth)
        self._ndof = int(ndof)

        rows_, cols_, vals_ = rows, cols, vals
        om_dinv = (self._omega * dinv).astype(jnp.float32)
        Pd, Aci = P, Ac_inv
        ns = self._n_smooth

        def amv(x):
            out = jnp.zeros(ndof, dtype=x.dtype)
            return out.at[rows_].add(vals_ * x[cols_])

        def apply32(r):
            x = om_dinv * r
            for _ in range(ns - 1):
                x = x + om_dinv * (r - amv(x))
            d = r - amv(x)
            x = x + Pd @ (Aci @ (d @ Pd))
            for _ in range(ns):
                x = x + om_dinv * (r - amv(x))
            return x

        self._apply32 = jax.jit(apply32)

    @property
    def n_coarse(self):
        return self._Ac_inv.shape[0]

    def __call__(self, r):
        return self._apply32(r.astype(jnp.float32)).astype(r.dtype)

    # -- construction ----------------------------------------------------------

    @classmethod
    def from_coo(cls, rows, cols, vals, ndof, labels_dof, mask,
                 omega_P=0.66, jacobi_omega=0.7, n_smooth=2):
        """Build from host coo arrays of the BC'd operator.

        labels_dof : [ndof] aggregate id per DoF, -1 = constrained (no
                     coarse representation)
        mask       : [ndof] 1.0 free / 0.0 constrained
        omega_P    : prolongation-smoothing weight (0 = plain aggregation)
        """
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals, dtype=np.float64)
        # ragged (padded) connectivities use an out-of-range sentinel DoF
        # with masked-to-zero values; BCOO matvecs drop those silently,
        # host scatter must drop them explicitly
        ok = ((rows >= 0) & (rows < ndof) & (cols >= 0) & (cols < ndof))
        rows, cols, vals = rows[ok], cols[ok], vals[ok]
        labels = np.asarray(labels_dof)
        m_h = np.asarray(mask, dtype=np.float64)

        # diagonal (BC'd operator carries its unit diagonal already)
        D = np.zeros(ndof)
        on_diag = rows == cols
        np.add.at(D, rows[on_diag], vals[on_diag])
        D = np.where(D != 0.0, D, 1.0)

        # spectral radius of D^-1 A by power iteration (host, O(nnz) per
        # sweep).  IGA operators routinely have lam_max(Dinv A) ~ 3-4
        # (measured 3.33 on the cubic star-T-spline Laplacian), so FIXED
        # sweep weights like 0.7 make damped Jacobi DIVERGE on the high
        # modes (|1 - 0.7*3.33| = 1.33) -- both the smoother and the
        # prolongation smoothing must be normalized by lam_max.  The
        # ``omega_P``/``jacobi_omega`` parameters are therefore fractions
        # of the stability limit: effective weight = omega * 2 / lam_max
        # (so the 0.66 default reproduces the classical 4/(3 lam_max)).
        rng = np.random.default_rng(0)
        x = rng.normal(size=ndof)
        lam_max = 1.0
        for _ in range(50):
            y = np.zeros(ndof)
            np.add.at(y, rows, vals * x[cols])
            y /= D
            lam_max = float(np.linalg.norm(y))
            if lam_max == 0.0:
                lam_max = 1.0
                break
            x = y / lam_max
        om_eff = float(jacobi_omega) * 2.0 / lam_max
        omP_eff = float(omega_P) * 2.0 / lam_max

        used = np.unique(labels[labels >= 0])
        m = used.size
        if m == 0:
            raise ValueError("no free DoFs to aggregate")
        remap = -np.ones(int(labels.max()) + 1, dtype=np.int64)
        remap[used] = np.arange(m)
        lbl = np.where(labels >= 0, remap[np.maximum(labels, 0)], -1)

        # tentative + smoothed prolongation, built densely [ndof, m]
        # (the target problems have m ~ ncp/coarsen^dim; guard anyway)
        if ndof * m > 2.0e8:
            raise ValueError(
                f"SA coarse space too large to densify ({ndof} x {m}); "
                "raise `coarsen`")
        P = np.zeros((ndof, m))
        free = lbl >= 0
        P[np.nonzero(free)[0], lbl[free]] = 1.0
        if omega_P:
            # P <- P - omP_eff * Dinv A T   (coo rows scatter into P)
            keep = (lbl[cols] >= 0) & (m_h[rows] > 0)
            r_k, c_k, v_k = rows[keep], cols[keep], vals[keep]
            np.subtract.at(P, (r_k, lbl[c_k]), omP_eff * v_k / D[r_k])

        # Galerkin coarse operator A_c = P^T A P (host, chunked over nnz)
        AP = np.zeros((ndof, m))
        step = max(1, int(2e7 // max(m, 1)))
        for s in range(0, rows.size, step):
            sl = slice(s, s + step)
            np.add.at(AP, rows[sl], vals[sl, None] * P[cols[sl]])
        Ac = P.T @ AP
        # aggregates made of constrained-only points never get here (they
        # were dropped from `used`); still regularize exact zero rows
        dAc = np.diagonal(Ac).copy()
        bad = dAc <= 0.0
        if np.any(bad):
            Ac[bad, :] = 0.0
            Ac[:, bad] = 0.0
            Ac[bad, bad] = 1.0
        Ac_inv = np.linalg.inv(Ac)

        f32 = jnp.float32
        # dinv such that omega*dinv is the damped-Jacobi weight at free
        # DoFs and exactly 1 at constrained ones (unit-diagonal BC rows
        # then converge in one sweep)
        dinv = m_h / D + (1.0 - m_h) / om_eff
        return cls(jnp.asarray(rows), jnp.asarray(cols),
                   jnp.asarray(vals, dtype=f32),
                   jnp.asarray(dinv, dtype=f32),
                   jnp.asarray(P, dtype=f32),
                   jnp.asarray(Ac_inv, dtype=f32),
                   omega=om_eff, n_smooth=n_smooth, ndof=ndof)

    @classmethod
    def from_spline(cls, spline, form, U=None, params=None, coarsen=3.0,
                    omega_P=0.66, jacobi_omega=0.7, n_smooth=2,
                    labels=None, apply_bcs=True):
        """Assemble the BC'd BCOO tangent of ``form`` at state ``U`` and
        build the two-level SA preconditioner over control-point
        aggregates.  Returns (preconditioner, bcoo_matrix) so callers can
        reuse the assembled operator for the Krylov matvecs."""
        M_sp = spline.assemble_sparse(form, U=U, params=params,
                                      apply_bcs=apply_bcs)
        M_sp = M_sp.sum_duplicates(nse=M_sp.nse)
        idx = np.asarray(M_sp.indices)
        vals = np.asarray(M_sp.data, dtype=np.float64)
        if labels is None:
            labels = control_point_aggregates(spline, coarsen=coarsen)
        ncp = spline.space.fields[0].ncp
        nf = spline.space.nfields
        nagg = int(labels.max()) + 1
        lbl_dof = np.concatenate(
            [labels + f * nagg for f in range(nf)])
        assert lbl_dof.shape[0] == spline.ndof == nf * ncp
        m_h = (np.asarray(spline.mask) if apply_bcs
               else np.ones(spline.ndof))
        lbl_dof = np.where(m_h > 0, lbl_dof, -1)
        pre = cls.from_coo(idx[:, 0], idx[:, 1], vals, spline.ndof,
                           lbl_dof, m_h, omega_P=omega_P,
                           jacobi_omega=jacobi_omega, n_smooth=n_smooth)
        return pre, M_sp
