"""PetIGA ``.dat`` binary geometry files (igakit interop).

The reference's NURBSControlMesh accepts a PetIGA ``.dat`` filename and
reads it through igakit (tIGAr/NURBS.py:23-36); every geometry the IGA
community ships in this format should load here too.  igakit is not
available in this environment, so the format is implemented directly from
its documented layout (igakit ``io.PetIGA``, github.com/dalcinl/igakit;
also PetIGA's IGALoad/IGASave):

  all integers big-endian int32, reals big-endian float64
  int32   IGA_FILE_CLASSID = 1211299
  int32   descr            bit 0x1: geometry present, bit 0x2: rational
  int32   dim              parametric dimension
  per parametric direction:
    int32   p              polynomial degree
    int32   m              number of knots
    f64[m]  U              knot vector
  if geometry:
    int32   nsd            physical dimension (dim <= nsd <= 3)
    int32   VEC_FILE_CLASSID = 1211214
    int32   n              total scalar entries = (nsd+1) * prod(sizes)
    f64[n]  A              homogeneous control array, logical shape
                           (nsd+1, n0, n1[, n2]) raveled in Fortran order
                           (component index fastest -> interleaved
                           (w*x..., w) per control point, i0 next)

sizes[d] = m_d - p_d - 1 (open-knot control-point counts).
"""

from __future__ import annotations

import numpy as np

IGA_FILE_CLASSID = 1211299
VEC_FILE_CLASSID = 1211214

_I = np.dtype(">i4")
_R = np.dtype(">f8")


def read_petiga(filename):
    """Read a PetIGA .dat file.

    Returns (degrees, kvecs, ctrl_grid) where ctrl_grid has shape
    (n0[, n1[, n2]], nsd+1) with homogeneous entries (w*x, ..., w) --
    exactly the NURBSControlMesh constructor layout.  ctrl_grid is None
    for files written without geometry.
    """
    with open(filename, "rb") as fh:
        def ints(n):
            a = np.fromfile(fh, _I, n)
            if len(a) != n:
                raise ValueError(f"{filename}: truncated PetIGA file")
            return [int(x) for x in a]

        (classid,) = ints(1)
        if classid != IGA_FILE_CLASSID:
            raise ValueError(
                f"{filename}: not a PetIGA geometry file "
                f"(classid {classid}, expected {IGA_FILE_CLASSID})")
        (descr, dim) = ints(2)
        if not (1 <= dim <= 3):
            raise ValueError(f"{filename}: invalid parametric dim {dim}")
        degrees, kvecs, sizes = [], [], []
        for _ in range(dim):
            (p, m) = ints(2)
            U = np.fromfile(fh, _R, m)
            if len(U) != m:
                raise ValueError(f"{filename}: truncated knot vector")
            degrees.append(p)
            kvecs.append(U.astype(np.float64))
            sizes.append(m - p - 1)

        if not (abs(descr) & 0x1):
            return degrees, kvecs, None

        (nsd,) = ints(1)
        if not (dim <= nsd <= 3):
            raise ValueError(f"{filename}: invalid nsd {nsd} for dim {dim}")
        (vec_id, n) = ints(2)
        if vec_id != VEC_FILE_CLASSID:
            raise ValueError(f"{filename}: bad control-vector classid "
                             f"{vec_id}")
        expect = (nsd + 1) * int(np.prod(sizes))
        if n != expect:
            raise ValueError(f"{filename}: control array size {n} != "
                             f"(nsd+1)*prod(sizes) = {expect}")
        A = np.fromfile(fh, _R, n)
        if len(A) != n:
            raise ValueError(f"{filename}: truncated control array")
    A = A.astype(np.float64).reshape((nsd + 1,) + tuple(sizes), order="F")
    ctrl_grid = np.moveaxis(A, 0, -1)  # [n0, n1, ..., nsd+1]
    return degrees, kvecs, ctrl_grid


def write_petiga(filename, degrees, kvecs, ctrl_grid=None, nsd=None):
    """Write a PetIGA .dat file.  ``ctrl_grid`` as in read_petiga; pass
    None to write knots only (descr geometry bit cleared)."""
    degrees = [int(p) for p in np.atleast_1d(degrees)]
    dim = len(degrees)
    with open(filename, "wb") as fh:
        def w_ints(*vals):
            np.asarray(vals, dtype=_I).tofile(fh)

        descr = 0
        ctrl = None
        if ctrl_grid is not None:
            ctrl = np.asarray(ctrl_grid, dtype=np.float64)
            if ctrl.ndim != dim + 1:
                raise ValueError("ctrl_grid rank must be dim+1")
            if nsd is None:
                nsd = ctrl.shape[-1] - 1
            if not (dim <= nsd <= 3):
                raise ValueError(f"invalid nsd {nsd}")
            descr |= 0x1
            w = ctrl[..., -1]
            rational = not np.allclose(w, 1.0, rtol=0.0, atol=1e-14)
            if rational:
                descr |= 0x2
        w_ints(IGA_FILE_CLASSID, descr, dim)
        for p, U in zip(degrees, kvecs):
            U = np.asarray(U, dtype=np.float64)
            if len(U) - p - 1 <= 0:
                raise ValueError("knot vector too short")
            w_ints(p, len(U))
            U.astype(_R).tofile(fh)
        if ctrl is not None:
            sizes = ctrl.shape[:-1]
            for d in range(dim):
                expect = len(np.asarray(kvecs[d])) - degrees[d] - 1
                if sizes[d] != expect:
                    raise ValueError(
                        f"ctrl_grid size {sizes[d]} along dir {d} does not "
                        f"match knot vector (expected {expect})")
            A = np.moveaxis(ctrl[..., list(range(nsd)) + [-1]], -1, 0)
            w_ints(nsd, VEC_FILE_CLASSID, A.size)
            np.asarray(A, dtype=np.float64).ravel(order="F").astype(
                _R).tofile(fh)
