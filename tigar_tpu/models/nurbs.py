"""NURBS control meshes.

Counterpart of the reference's NURBSControlMesh (tIGAr/NURBS.py:13-77),
which wraps igakit/PetIGA input.  Here the control mesh is built directly
from (degrees, knot vectors, homogeneous control grid); geometry refinement
uses ops/refine.py knot insertion instead of igakit.
"""

from __future__ import annotations

import numpy as np

from .bspline import ControlMesh, TensorBSplineBasis


class NURBSControlMesh(ControlMesh):
    """Control mesh with rational (NURBS) geometry.

    Construct either from arrays or from a PetIGA ``.dat`` filename
    (``NURBSControlMesh("geometry.dat")``), matching the reference's
    igakit/PetIGA input path (tIGAr/NURBS.py:23-36; format in petiga_io.py).

    Parameters
    ----------
    degrees   : per-direction polynomial degrees, OR a ``.dat`` filename
    kvecs     : per-direction knot vectors
    ctrl_grid : homogeneous control net, shape (n0[, n1[, n2]], nsd+1) with
                entries (w*x_0, ..., w*x_{nsd-1}, w), indexed [i, j, k] in
                parametric directions (dir 0 = i, fastest in DoF order;
                matches the reference's bnet layout, NURBS.py:46-68).
    """

    def __init__(self, degrees, kvecs=None, ctrl_grid=None):
        if isinstance(degrees, str):
            from ..petiga_io import read_petiga
            degrees, kvecs, ctrl_grid = read_petiga(degrees)
            if ctrl_grid is None:
                raise ValueError("PetIGA file has no geometry (control "
                                 "net); cannot build a control mesh")
        self._basis = TensorBSplineBasis(degrees, kvecs)
        ctrl = np.asarray(ctrl_grid, dtype=np.float64)
        dim = self._basis.dim
        if ctrl.ndim != dim + 1:
            raise ValueError("control grid rank must be dim+1")
        expect = tuple(self._basis.ncp_per_dir)
        if ctrl.shape[:-1] != expect:
            raise ValueError(
                f"control grid shape {ctrl.shape[:-1]} does not match "
                f"knot vectors (expected {expect})")
        # flatten with direction-0 index fastest: reverse spatial axes, then
        # C-order flatten
        spatial = tuple(range(dim))[::-1]
        self._bnet = ctrl.transpose(spatial + (dim,)).reshape(-1, ctrl.shape[-1])
        self._nsd = ctrl.shape[-1] - 1

    def scalar_basis(self):
        return self._basis

    @property
    def nsd(self):
        return self._nsd

    def homogeneous_points(self):
        return self._bnet


def quarter_annulus_control(r_in=1.0, r_out=2.0):
    """Exact quarter-annulus NURBS (quadratic x quadratic): degrees, knot
    vectors, and homogeneous control grid.  A genuinely rational geometry
    for testing (circular arcs with weights 1/sqrt(2) at the corner points).
    """
    degrees = [2, 2]
    kvecs = [np.asarray([0.0, 0, 0, 1, 1, 1])] * 2
    s = 1.0 / np.sqrt(2.0)
    # angular direction: control directions for the 90-degree arc
    dirs = np.asarray([[1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    wang = np.asarray([1.0, s, 1.0])
    radii = np.asarray([r_in, 0.5 * (r_in + r_out), r_out])
    ctrl = np.zeros((3, 3, 3))
    for i in range(3):       # angular
        for j in range(3):   # radial
            w = wang[i]
            xy = radii[j] * dirs[i]
            ctrl[i, j, :2] = w * xy
            ctrl[i, j, 2] = w
    return degrees, kvecs, ctrl
