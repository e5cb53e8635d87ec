"""Bezier-extraction-format T-splines (Rhino T-spline plugin output).

Counterpart of tIGAr/RhinoTSplines.py: bi-cubic Bezier elements on (-1,1)^2,
each with a ragged list of supported T-spline functions and an extraction
operator C whose rows express each function as a combination of the 16
bi-cubic Bernstein polynomials (RhinoTSplines.py:37-60).  The reference
spaces elements out along x0 with stride 3 inside one FE chart
(RhinoTSplines.py:62-137); here each element is simply a row of the batched
tabulation, padded to the maximum per-element function count with masks.

File format (RhinoTSplines.py:78-111, 258-277):
  line 0:      header
  line 1:      "<tag> ncp"
  line 2:      "<tag> nelBez"
  lines 3...:  ncp control points: "<tag> x y z w"  (x,y,z NOT premultiplied)
  per element: "<tag> nshl"; a line of nshl node indices; nshl lines of 16
               extraction coefficients.
"""

from __future__ import annotations

import numpy as np

from ..config import INDEX_TYPE
from ..ops.basis import bernstein_basis_ders
from ..ops.quadrature import gauss_rule
from ..ops.tabulation import Tabulation
from .bspline import ScalarBasis, ControlMesh


def _parse_tspline_file(fname):
    with open(fname) as f:
        lines = f.read().split("\n")
    ncp = int(lines[1].split()[1])
    nel = int(lines[2].split()[1])
    # control points (homogenized here, RhinoTSplines.py:274-277)
    bnet = np.zeros((ncp, 4))
    for i in range(ncp):
        vals = [float(s) for s in lines[3 + i].split()[1:5]]
        w = vals[3]
        bnet[i, :3] = np.asarray(vals[:3]) * w
        bnet[i, 3] = w
    lc = 3 + ncp
    nodes_list = []
    ops_list = []
    for _ in range(nel):
        nshl = int(lines[lc].split()[1])
        nodes = np.asarray([int(s) for s in lines[lc + 1].split()],
                           dtype=np.int64)
        C = np.asarray([[float(s) for s in lines[lc + 2 + j].split()]
                        for j in range(nshl)])
        if C.shape != (nshl, 16):
            raise ValueError("malformed extraction operator")
        nodes_list.append(nodes)
        ops_list.append(C)
        lc += nshl + 2
    return bnet, nodes_list, ops_list


class TSplineBasis(ScalarBasis):
    """Scalar T-spline basis from element-by-element Bezier extraction
    (reference: RhinoTSplineScalarBasis, RhinoTSplines.py:67-240)."""

    def __init__(self, fname=None, *, nodes_list=None, ops_list=None,
                 ncp=None):
        if fname is not None:
            _, nodes_list, ops_list = _parse_tspline_file(fname)
            ncp = max(int(n.max()) for n in nodes_list) + 1 if ncp is None \
                else ncp
        self.nodes_list = [np.asarray(n, dtype=np.int64) for n in nodes_list]
        self.ops_list = [np.asarray(C, dtype=np.float64) for C in ops_list]
        self._ncp = int(ncp)
        self.max_nshl = max(C.shape[0] for C in self.ops_list)
        # padded [nel, max_nshl, 16] operators, [nel, max_nshl] conn + mask
        nel = len(self.ops_list)
        self.C = np.zeros((nel, self.max_nshl, 16))
        self.conn = np.zeros((nel, self.max_nshl), dtype=INDEX_TYPE)
        self.mask = np.zeros((nel, self.max_nshl))
        for e, (nodes, C) in enumerate(zip(self.nodes_list, self.ops_list)):
            nshl = C.shape[0]
            self.C[e, :nshl] = C
            self.conn[e, :nshl] = nodes
            self.mask[e, :nshl] = 1.0

    @classmethod
    def from_file(cls, fname, ncp=None):
        return cls(fname, ncp=ncp)

    @property
    def ncp(self):
        return self._ncp

    @property
    def nel(self):
        return len(self.ops_list)

    @property
    def dim(self):
        return 2

    def degree(self):
        return 3  # bi-cubic (RhinoTSplines.py:236-240)

    # -- tabulation ---------------------------------------------------------------

    def _bernstein_tab(self, npts, nders, rule=None):
        """Tensor-product bi-cubic Bernstein values/derivatives at Gauss
        points of (-1,1)^2.  Bernstein index b = j*4 + i with i along the
        first parametric direction (RhinoTSplines.py:50-53)."""
        if rule is not None:
            g, w = np.asarray(rule[0]), np.asarray(rule[1])
            npts = len(g)
        else:
            g, w = gauss_rule(npts)
        d1 = bernstein_basis_ders(3, g, nders, interval=(-1.0, 1.0))
        nq = npts * npts
        qi, qj = np.meshgrid(np.arange(npts), np.arange(npts), indexing="ij")
        qi = qi.reshape(-1, order="F")  # i fastest
        qj = qj.reshape(-1, order="F")
        bi, bj = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
        bi = bi.reshape(-1, order="F")
        bj = bj.reshape(-1, order="F")

        def prod(ku, kv):
            return d1[qi][:, ku, :][:, bi] * d1[qj][:, kv, :][:, bj]

        B = prod(0, 0)                                # [nq, 16]
        dB = d2B = None
        if nders >= 1:
            dB = np.stack([prod(1, 0), prod(0, 1)], axis=-1)  # [nq,16,2]
        if nders >= 2:
            d2B = np.zeros((nq, 16, 2, 2))
            d2B[:, :, 0, 0] = prod(2, 0)
            d2B[:, :, 0, 1] = d2B[:, :, 1, 0] = prod(1, 1)
            d2B[:, :, 1, 1] = prod(0, 2)
        qw = w[qi] * w[qj]
        qp = np.stack([g[qi], g[qj]], axis=-1)
        return B, dB, d2B, qp, qw

    def tabulate(self, npts_per_dir, nders, rule=None):
        npts = int(np.max(npts_per_dir)) if not np.isscalar(npts_per_dir) \
            else int(npts_per_dir)
        B, dB, d2B, qp, qw = self._bernstein_tab(npts, nders, rule=rule)
        nel, nq = self.nel, B.shape[0]
        N = np.einsum("eab,qb->eqa", self.C, B)
        dN = None if dB is None else np.einsum("eab,qbd->eqad", self.C, dB)
        d2N = None if d2B is None else np.einsum("eab,qbdc->eqadc",
                                                 self.C, d2B)
        return Tabulation(
            conn=self.conn,
            N=N, dN=dN, d2N=d2N,
            qp=np.broadcast_to(qp, (nel, nq, 2)).copy(),
            qw=np.broadcast_to(qw, (nel, nq)).copy(),
            ncp=self._ncp, dim=2, mask=self.mask.copy())

    def tabulate_boundary(self, npts_per_dir, nders, direction, side):
        raise NotImplementedError(
            "Rhino T-spline extraction data carries no boundary-topology "
            "information (RhinoTSplines.py:113 'TODO: read in BC info'); "
            "apply BCs by control-point location "
            "(SplineSpace.add_zero_dofs_by_location) as in "
            "dynamic-tspline.py:64-75.")

    def evaluate(self, coeffs, xi, element=0):
        """Evaluate at local coordinates ``xi`` [n, 2] of one element."""
        coeffs = np.asarray(coeffs)
        xi = np.atleast_2d(xi)
        du = bernstein_basis_ders(3, xi[:, 0], 0)[:, 0, :]
        dv = bernstein_basis_ders(3, xi[:, 1], 0)[:, 0, :]
        # B[n, j*4+i] = du[n,i] dv[n,j]: C-order flatten of [n, j, i]
        B = (dv[:, :, None] * du[:, None, :]).reshape(len(xi), 16)
        vals = np.einsum("ab,qb->qa", self.C[element], B)
        ce = coeffs[self.conn[element]] * self.mask[element]
        return vals @ ce


class RhinoTSplineControlMesh(ControlMesh):
    """Control mesh from a Rhino T-spline file
    (reference: RhinoTSplineControlMesh, RhinoTSplines.py:242-286)."""

    def __init__(self, fname):
        bnet, nodes_list, ops_list = _parse_tspline_file(fname)
        self._basis = TSplineBasis(nodes_list=nodes_list, ops_list=ops_list,
                                   ncp=bnet.shape[0])
        self._bnet = bnet

    def scalar_basis(self):
        return self._basis

    @property
    def nsd(self):
        return 3

    def homogeneous_points(self):
        return self._bnet


def merge_extraction_nodes(nodes_list, ops_list, node_map):
    """Merge T-spline functions by identifying nodes: every node index is
    mapped through ``node_map`` (old -> new global index, not necessarily
    dense); functions of one element that land on the same new node have
    their extraction rows SUMMED.  Row-summing preserves partition of unity
    and produces genuinely RAGGED per-element function counts -- the
    defining feature of extraordinary points in the Rhino format
    (RhinoTSplines.py:93-97, where nshl varies per element).

    Returns (nodes_list, ops_list, ncp) with dense renumbered nodes.
    """
    node_map = {int(k): int(v) for k, v in node_map.items()}
    new_nodes_list, new_ops_list = [], []
    seen = {}
    for nodes, C in zip(nodes_list, ops_list):
        mapped = [node_map.get(int(n), int(n)) for n in nodes]
        uniq = []
        rows = {}
        for a, n in enumerate(mapped):
            if n not in rows:
                rows[n] = np.zeros(C.shape[1])
                uniq.append(n)
            rows[n] = rows[n] + C[a]
        new_nodes_list.append(np.asarray(uniq, dtype=np.int64))
        new_ops_list.append(np.stack([rows[n] for n in uniq]))
    # dense renumbering over the union of used node ids
    used = sorted({int(n) for nodes in new_nodes_list for n in nodes})
    renum = {n: i for i, n in enumerate(used)}
    new_nodes_list = [np.asarray([renum[int(n)] for n in nodes],
                                 dtype=np.int64)
                      for nodes in new_nodes_list]
    return new_nodes_list, new_ops_list, len(used), used


def bspline_to_rhino_extraction(basis, bnet, fname):
    """Export a bi-cubic tensor-product B-spline patch as a Rhino-format
    T-spline extraction file (element-by-element Bezier operators).  Useful
    for generating verified T-spline inputs and for interoperability tests.

    basis : TensorBSplineBasis with degrees [3, 3]
    bnet  : [ncp, 4] homogeneous control points (w*x, w)
    """
    from ..ops.basis import bspline_basis_ders
    if basis.degrees != [3, 3]:
        raise ValueError("Rhino format is bi-cubic only")
    bnet = np.asarray(bnet)

    # per-direction extraction: coefficients of each of the 4 supported
    # functions in the element-local cubic Bernstein basis, via collocation
    # at 4 Chebyshev-like points
    def extraction_1d(kv):
        ops = []
        spans = kv.element_spans()
        lefts = kv.unique_knots[:-1]
        h = kv.element_sizes()
        t = np.asarray([-1.0, -0.5, 0.5, 1.0])
        Bmat = bernstein_basis_ders(3, t, 0)[:, 0, :]      # [4, 4]
        for e in range(kv.nel):
            u = lefts[e] + (t + 1.0) * 0.5 * h[e]
            ders = bspline_basis_ders(kv.ghost_knots, kv.n_ghost, kv.p,
                                      u, np.full(4, spans[e]), 0)
            Nvals = ders[:, 0, :]                          # [4 pts, 4 funcs]
            # solve B^T X^T = N  ->  rows of X are Bernstein coefficients
            X = np.linalg.solve(Bmat, Nvals).T             # [4 funcs, 4]
            ops.append(X)
        return ops

    ops_u = extraction_1d(basis.kvs[0])
    ops_v = extraction_1d(basis.kvs[1])
    nodes_u = basis.kvs[0].element_nodes()
    nodes_v = basis.kvs[1].element_nodes()
    M = basis.kvs[0].ncp

    nodes_list, ops_list = [], []
    # element flattening: dir-0 fastest (matches TensorBSplineBasis)
    for ev in range(basis.kvs[1].nel):
        for eu in range(basis.kvs[0].nel):
            nodes = [int(nodes_v[ev][j] * M + nodes_u[eu][i])
                     for j in range(4) for i in range(4)]
            # row a = j*4+i (function), col b = l*4+k (Bernstein, k along u):
            # C[a, b] = ops_u[i, k] * ops_v[j, l]
            C = np.einsum("ik,jl->jilk", ops_u[eu],
                          ops_v[ev]).reshape(16, 16)
            nodes_list.append(np.asarray(nodes, dtype=np.int64))
            ops_list.append(C)
    write_rhino_extraction(fname, bnet, nodes_list, ops_list)


def write_rhino_extraction(fname, bnet, nodes_list, ops_list):
    """Write element-by-element Bezier extraction in the Rhino T-spline
    format (the format _parse_tspline_file reads; ragged per-element
    function counts are fully supported, RhinoTSplines.py:93-97).

    bnet : [ncp, 4] homogeneous control points (w*x, w)
    """
    bnet = np.asarray(bnet)
    lines = ["tspline-extraction (generated by tigar_tpu)",
             f"nodeN {bnet.shape[0]}",
             f"elemN {len(nodes_list)}"]
    x = bnet[:, :3] / bnet[:, 3:4]
    for i in range(bnet.shape[0]):
        lines.append("n %.17g %.17g %.17g %.17g"
                     % (x[i, 0], x[i, 1], x[i, 2], bnet[i, 3]))
    for nodes, C in zip(nodes_list, ops_list):
        nshl = len(nodes)
        if C.shape != (nshl, 16):
            raise ValueError("extraction operator must be [nshl, 16]")
        lines.append(f"e {nshl}")
        lines.append(" ".join(str(int(n)) for n in nodes))
        for a in range(nshl):
            lines.append(" ".join("%.17g" % c for c in C[a]))
    with open(fname, "w") as f:
        f.write("\n".join(lines) + "\n")
