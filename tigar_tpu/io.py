"""Persistence and visualization I/O.

Extraction serialization is the counterpart of the reference's
``writeExtraction`` / ``ExtractedSpline(dirname, ...)`` round trip
(tIGAr/common.py:435-502, 748-894: HDF5 mesh + control functions, PETSc
binary extraction matrices, zero-DoF IS, text info file).  Here the
preprocessing artifact is one ``extraction.npz`` (arrays) plus
``extraction-info.json`` (structure): knot vectors / extraction operators
per field, homogeneous control net, zero DoFs.  Intent is identical:
preprocess once, analyze many times (common.py:716-722).

Visualization replaces the reference's ParaView ``.pvd`` output of FE
functions plus homogeneous-coordinate calculator recipes
(poisson-nurbs.py:148-164, dynamic-tspline.py:296-332): fields are sampled
on a per-element visualization grid and written as legacy VTK unstructured
quads with *already-rationalized* values and *physical* point locations --
no ParaView calculator gymnastics needed.  Pointwise context functions can
be sampled too, replacing projectScalarOntoLinears (common.py:1351-1388).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .models.bspline import TensorBSplineBasis, ControlMesh
from .models.multipatch import MultiPatchBSplineBasis, MergedBasis
from .models.tsplines import TSplineBasis
from .models.space import SplineSpace


# -- basis (de)serialization -----------------------------------------------------

def _basis_to_entry(basis, arrays, prefix):
    if isinstance(basis, TensorBSplineBasis):
        for d, kv in enumerate(basis.kvs):
            arrays[f"{prefix}knots{d}"] = kv.knots
        return {"type": "tensor_bspline",
                "degrees": [int(p) for p in basis.degrees]}
    if isinstance(basis, MultiPatchBSplineBasis):
        info = {"type": "multipatch", "patches": []}
        for i, p in enumerate(basis.patches):
            info["patches"].append(
                _basis_to_entry(p, arrays, f"{prefix}p{i}_"))
        return info
    if isinstance(basis, MergedBasis):
        arrays[f"{prefix}dof_map"] = basis.dof_map
        return {"type": "merged", "ncp": int(basis.ncp),
                "base": _basis_to_entry(basis.base, arrays,
                                        f"{prefix}base_")}
    if isinstance(basis, TSplineBasis):
        arrays[f"{prefix}C"] = basis.C
        arrays[f"{prefix}conn"] = basis.conn
        arrays[f"{prefix}mask"] = basis.mask
        return {"type": "tspline", "ncp": int(basis.ncp),
                "nshl": [int(C.shape[0]) for C in basis.ops_list]}
    raise TypeError(f"cannot serialize basis type {type(basis).__name__}")


def _basis_from_entry(info, arrays, prefix):
    t = info["type"]
    if t == "tensor_bspline":
        degrees = info["degrees"]
        kvecs = [arrays[f"{prefix}knots{d}"] for d in range(len(degrees))]
        return TensorBSplineBasis(degrees, kvecs)
    if t == "multipatch":
        patches = [_basis_from_entry(pi, arrays, f"{prefix}p{i}_")
                   for i, pi in enumerate(info["patches"])]
        return MultiPatchBSplineBasis(patches)
    if t == "merged":
        base = _basis_from_entry(info["base"], arrays, f"{prefix}base_")
        return MergedBasis(base, arrays[f"{prefix}dof_map"], info["ncp"])
    if t == "tspline":
        C = arrays[f"{prefix}C"]
        conn = arrays[f"{prefix}conn"]
        nshl = info["nshl"]
        nodes_list = [conn[e, :n] for e, n in enumerate(nshl)]
        ops_list = [C[e, :n] for e, n in enumerate(nshl)]
        return TSplineBasis(nodes_list=nodes_list, ops_list=ops_list,
                            ncp=info["ncp"])
    raise ValueError(f"unknown basis type {t!r}")


class _SerializedControlMesh(ControlMesh):
    def __init__(self, basis, bnet, nsd):
        self._basis = basis
        self._bnet = bnet
        self._nsd = int(nsd)

    def scalar_basis(self):
        return self._basis

    @property
    def nsd(self):
        return self._nsd

    def homogeneous_points(self):
        return self._bnet


def write_extraction(space: SplineSpace, dirname):
    """Serialize a SplineSpace's preprocessing (reference: writeExtraction,
    common.py:435-502)."""
    os.makedirs(dirname, exist_ok=True)
    arrays = {}
    ctrl_basis = space.control_mesh.scalar_basis()
    info = {
        "nsd": int(space.nsd),
        "nfields": space.nfields,
        "control_basis": _basis_to_entry(ctrl_basis, arrays, "ctrl_"),
        "fields": [],
    }
    arrays["bnet"] = np.asarray(space.control_mesh.homogeneous_points())
    arrays["zero_dofs"] = space.zero_dofs()
    for f, basis in enumerate(space.fields):
        if basis is ctrl_basis:
            info["fields"].append({"type": "control"})
        else:
            info["fields"].append(_basis_to_entry(basis, arrays, f"f{f}_"))
    with open(os.path.join(dirname, "extraction-info.json"), "w") as fp:
        json.dump(info, fp, indent=1)
    np.savez(os.path.join(dirname, "extraction.npz"), **arrays)


def read_extraction(dirname) -> SplineSpace:
    """Rebuild a SplineSpace from serialized extraction data (reference:
    initFromFilesystem, common.py:748-894)."""
    with open(os.path.join(dirname, "extraction-info.json")) as fp:
        info = json.load(fp)
    arrays = dict(np.load(os.path.join(dirname, "extraction.npz")))
    ctrl_basis = _basis_from_entry(info["control_basis"], arrays, "ctrl_")
    cm = _SerializedControlMesh(ctrl_basis, arrays["bnet"], info["nsd"])
    fields = []
    for f, fi in enumerate(info["fields"]):
        if fi.get("type") == "control":
            fields.append(ctrl_basis)
        else:
            fields.append(_basis_from_entry(fi, arrays, f"f{f}_"))
    space = SplineSpace(cm, fields)
    zd = arrays["zero_dofs"]
    if len(zd):
        space.add_zero_dofs_global(zd)
    return space


# -- visualization ----------------------------------------------------------------

def _vis_rule(m):
    """Closed uniform sampling rule with m+1 points per direction."""
    pts = np.linspace(-1.0, 1.0, m + 1)
    return pts, np.zeros_like(pts)


def write_vtk(fname, spline, fields=None, pointwise=None, resolution=4,
              rationalize=True):
    """Write a legacy-VTK unstructured-quad (or line/hex) sampling of the
    spline at physical locations.

    fields    : dict name -> DoF vector
    pointwise : dict name -> fn(ctx) sampled at visualization points
                (replaces projectScalarOntoLinears, common.py:1351-1388)
    resolution: subdivisions per Bezier element per direction
    rationalize: divide sampled field values by the control weight w.  This
                is correct only for homogeneous equal-order coefficients
                (the default isoparametric representation); pass False for
                compatible (RT/N) or otherwise non-isoparametric spaces,
                where the coefficients are not homogeneous.
    """
    from .ops.geometry import precompute_geometry, eval_jet_arrays
    import jax

    m = int(resolution)
    rule = _vis_rule(m)
    ctrl_basis = spline.control_basis
    ctrl_tab = ctrl_basis.tabulate(m + 1, spline.nders, rule=rule)
    geom = precompute_geometry(ctrl_tab, spline.bnet)
    x = np.asarray(geom.x)                      # [nel, npt, nsd]
    nel, npt, nsd = x.shape
    dim = ctrl_tab.dim

    data = {}
    if fields:
        for name, U in fields.items():
            U = np.asarray(U)
            vals = []
            for f in range(spline.space.nfields):
                tab = spline.space.fields[f].tabulate(m + 1, 0, rule=rule)
                v, _, _ = eval_jet_arrays(tab, U[spline.space.field_slice(f)])
                vals.append(np.asarray(v))
            stacked = np.stack(vals, axis=-1)
            if rationalize:
                stacked = stacked / np.asarray(geom.w)[..., None]
            data[name] = stacked
    if pointwise:
        for name, fn in pointwise.items():
            v = jax.vmap(jax.vmap(fn))(geom)
            data[name] = np.asarray(v)

    # point grid within each element: dir-0 fastest (matches _combine_tensor)
    npts_1d = m + 1
    cells = []
    if dim == 2:
        for e in range(nel):
            base = e * npt
            for j in range(m):
                for i in range(m):
                    v0 = base + j * npts_1d + i
                    cells.append((v0, v0 + 1, v0 + npts_1d + 1, v0 + npts_1d))
        cell_type = 9  # VTK_QUAD
        ncv = 4
    elif dim == 1:
        for e in range(nel):
            base = e * npt
            for i in range(m):
                cells.append((base + i, base + i + 1))
        cell_type = 3  # VTK_LINE
        ncv = 2
    elif dim == 3:
        n2 = npts_1d * npts_1d
        for e in range(nel):
            base = e * npt
            for k in range(m):
                for j in range(m):
                    for i in range(m):
                        v0 = base + k * n2 + j * npts_1d + i
                        cells.append((v0, v0 + 1, v0 + npts_1d + 1,
                                      v0 + npts_1d, v0 + n2, v0 + n2 + 1,
                                      v0 + n2 + npts_1d + 1, v0 + n2 + npts_1d))
        cell_type = 12  # VTK_HEXAHEDRON
        ncv = 8
    else:
        raise ValueError("unsupported dimension for VTK output")

    pts = x.reshape(-1, nsd)
    if nsd < 3:
        pts = np.concatenate([pts, np.zeros((len(pts), 3 - nsd))], axis=1)

    with open(fname, "w") as f:
        f.write("# vtk DataFile Version 3.0\ntigar_tpu output\nASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {len(pts)} double\n")
        for p in pts:
            f.write("%.12g %.12g %.12g\n" % tuple(p[:3]))
        f.write(f"\nCELLS {len(cells)} {len(cells) * (ncv + 1)}\n")
        for c in cells:
            f.write(str(ncv) + " " + " ".join(map(str, c)) + "\n")
        f.write(f"\nCELL_TYPES {len(cells)}\n")
        for _ in cells:
            f.write(f"{cell_type}\n")
        if data:
            f.write(f"\nPOINT_DATA {len(pts)}\n")
            for name, v in data.items():
                v = np.asarray(v).reshape(len(pts), -1)
                if v.shape[1] == 1:
                    f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    for row in v:
                        f.write("%.12g\n" % row[0])
                else:
                    vv = np.zeros((len(pts), 3))
                    vv[:, :min(3, v.shape[1])] = v[:, :3]
                    f.write(f"VECTORS {name} double\n")
                    for row in vv:
                        f.write("%.12g %.12g %.12g\n" % tuple(row))


def write_pvd(fname, series):
    """Write a ParaView .pvd collection for a time series of VTK files.
    ``series``: list of (time, filename)."""
    lines = ['<?xml version="1.0"?>',
             '<VTKFile type="Collection" version="0.1">',
             ' <Collection>']
    for t, fn in series:
        lines.append(f'  <DataSet timestep="{t}" part="0" file="{fn}"/>')
    lines += [' </Collection>', '</VTKFile>']
    with open(fname, "w") as f:
        f.write("\n".join(lines) + "\n")


# -- solution-state checkpointing ---------------------------------------------

def save_state(fname, **arrays):
    """Checkpoint solution state (DoF vectors, time-integrator history,
    multipliers, step counters...) to one npz file.  The reference has no
    solution checkpointing (SURVEY.md section 5.4: time series go to
    ParaView only); this provides restartable stepping loops."""
    np.savez(fname, **{k: np.asarray(v) for k, v in arrays.items()})


def load_state(fname):
    """Load a checkpoint written by save_state; returns a dict of arrays."""
    with np.load(fname) as data:
        return {k: data[k] for k in data.files}
