"""Batched assembly over Bezier elements: residuals, tangents, matrices.

This replaces the reference's entire assembly stack -- FFC-generated element
kernels called by DOLFIN ``assemble``, the PETSc MatPtAP projection MᵀAM and
MᵀB extraction (tIGAr/common.py:1142-1234) -- with one TPU-friendly pattern:

  gather DoFs -> evaluate field jets at quad points (batched einsum on MXU)
  -> vmapped pointwise density -> weighted sum / AD transpose -> scatter-add.

Residual vectors are reverse-mode gradients of the (linear-in-test-function)
total form; tangent actions are JVPs of the residual map; explicit matrices
come from per-element ``jacfwd`` + scatter.  Because fields are evaluated in
spline space directly, there is no extraction matrix and no PtAP: the
"extraction" is fused into the tabulated basis.

``DomainAssembler`` is registered as a JAX pytree so jitted kernels receive
its arrays as runtime arguments (not trace-embedded constants).  Densities
may take an optional trailing ``params`` pytree (traced; constant across
quadrature points) so load stepping and time stepping do not retrace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..forms import Jet


class DomainAssembler:
    """Assembly over one element batch (the volume, or one boundary side).

    Parameters
    ----------
    field_tabs : list of Tabulation, one per field (shared element grid)
    offsets    : [nfields+1] global DoF offsets
    ndof       : total DoFs
    ctx        : QP pytree with leaf leading dims [nel, nq]
    scale      : [nel, nq] quadrature weights * volume/surface Jacobian
    """

    def __init__(self, field_tabs, offsets, ndof, ctx, scale):
        self.nfields = len(field_tabs)
        self.offsets = tuple(int(o) for o in offsets)
        self.ndof = int(ndof)
        self.ctx = ctx
        self.scale = jnp.asarray(scale)
        self.conns = []
        self.Ns = []
        self.dNs = []
        self.d2Ns = []
        self.masks = []
        for t in field_tabs:
            self.conns.append(jnp.asarray(t.conn))
            self.Ns.append(jnp.asarray(t.N))
            self.dNs.append(None if t.dN is None else jnp.asarray(t.dN))
            self.d2Ns.append(None if t.d2N is None else jnp.asarray(t.d2N))
            self.masks.append(None if t.mask is None else jnp.asarray(t.mask))
        self.nens = tuple(t.nen for t in field_tabs)
        self.nloc = int(sum(self.nens))
        # concatenated element connectivity in global numbering
        self.cat_conn = jnp.concatenate(
            [self.conns[f] + self.offsets[f] for f in range(self.nfields)],
            axis=1)

    @property
    def nel(self):
        return self.scale.shape[0]

    @property
    def nq(self):
        return self.scale.shape[1]

    def astype(self, dtype):
        """Copy with all floating arrays cast to ``dtype`` -- the
        mixed-precision fast path (pair with solvers.refinement to recover
        f64 accuracy)."""
        import jax.tree_util as jtu
        children, aux = self.tree_flatten()
        children = jtu.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, children)
        return type(self).tree_unflatten(aux, children)

    # -- pytree protocol ---------------------------------------------------------

    def tree_flatten(self):
        children = (self.ctx, self.scale, tuple(self.conns), tuple(self.Ns),
                    tuple(self.dNs), tuple(self.d2Ns), tuple(self.masks),
                    self.cat_conn)
        aux = (self.nfields, self.offsets, self.ndof, self.nens, self.nloc)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.ctx, obj.scale, conns, Ns, dNs, d2Ns, masks,
         obj.cat_conn) = children
        obj.conns = list(conns)
        obj.Ns = list(Ns)
        obj.dNs = list(dNs)
        obj.d2Ns = list(d2Ns)
        obj.masks = list(masks)
        (obj.nfields, obj.offsets, obj.ndof, obj.nens, obj.nloc) = aux
        return obj

    # -- field evaluation -------------------------------------------------------

    def _field_jet(self, f, ce):
        """Jets of field ``f`` from element coefficients ce [nel, nen_f]."""
        if self.masks[f] is not None:
            ce = ce * self.masks[f]
        val = jnp.einsum("eqa,ea->eq", self.Ns[f], ce)
        g = None if self.dNs[f] is None else jnp.einsum(
            "eqad,ea->eqd", self.dNs[f], ce)
        h = None if self.d2Ns[f] is None else jnp.einsum(
            "eqadc,ea->eqdc", self.d2Ns[f], ce)
        return val, g, h

    def jets(self, U):
        """Evaluate the multi-field jet arrays of global vector U.

        Scalar space: leaves [nel,nq], [nel,nq,d], [nel,nq,d,d].
        Vector space: leaves [nel,nq,nf], [nel,nq,nf,d], ...
        """
        vals, gs, hs = [], [], []
        for f in range(self.nfields):
            ce = U[self.offsets[f] + self.conns[f]]
            v, g, h = self._field_jet(f, ce)
            vals.append(v)
            gs.append(g)
            hs.append(h)
        if self.nfields == 1:
            return Jet(vals[0], gs[0], hs[0])
        val = jnp.stack(vals, axis=2)
        g = None if gs[0] is None else jnp.stack(gs, axis=2)
        h = None if hs[0] is None else jnp.stack(hs, axis=2)
        return Jet(val, g, h)

    def jets_tree(self, U):
        """jets() over an array or a dict of arrays."""
        if isinstance(U, dict):
            return {k: self.jets(jnp.asarray(v)) for k, v in U.items()}
        return self.jets(jnp.asarray(U))

    # -- global assembly --------------------------------------------------------

    def _pointwise(self, density, field_args, params):
        n = 1 + len(field_args)
        if params is None:
            vm = jax.vmap(jax.vmap(density))
            return vm(self.ctx, *field_args)
        inner_axes = (0,) * n + (None,)
        vm = jax.vmap(jax.vmap(density, in_axes=inner_axes),
                      in_axes=inner_axes)
        return vm(self.ctx, *field_args, params)

    def functional(self, density, u_jets=None, params=None):
        """Integrate density(ctx[, u][, params]) over the domain."""
        args = () if u_jets is None else (u_jets,)
        return jnp.sum(self._pointwise(density, args, params) * self.scale)

    def linear_vector(self, density, params=None):
        """Assemble b_i = L(N_i) for density(ctx, v[, params]) linear in v."""
        def R(V):
            return jnp.sum(
                self._pointwise(density, (self.jets(V),), params)
                * self.scale)
        return jax.grad(R)(jnp.zeros(self.ndof, dtype=self.scale.dtype))

    def residual_vector(self, density, u_jets, params=None):
        """Assemble r_i = res(u; N_i) for density(ctx, u, v[, params]) linear
        in v.  ``u_jets`` from ``self.jets_tree``."""
        def R(V):
            return jnp.sum(
                self._pointwise(density, (u_jets, self.jets(V)), params)
                * self.scale)
        return jax.grad(R)(jnp.zeros(self.ndof, dtype=self.scale.dtype))

    # -- per-element explicit matrices ------------------------------------------

    def _split_local(self, uloc):
        parts = []
        s = 0
        for f in range(self.nfields):
            parts.append(uloc[s:s + self.nens[f]])
            s += self.nens[f]
        return parts

    def _local_jets(self, uloc, Ns_e, dNs_e, d2Ns_e, masks_e):
        parts = self._split_local(uloc)
        vals, gs, hs = [], [], []
        for f in range(self.nfields):
            ce = parts[f]
            if masks_e[f] is not None:
                ce = ce * masks_e[f]
            vals.append(jnp.einsum("qa,a->q", Ns_e[f], ce))
            gs.append(None if dNs_e[f] is None else
                      jnp.einsum("qad,a->qd", dNs_e[f], ce))
            hs.append(None if d2Ns_e[f] is None else
                      jnp.einsum("qadc,a->qdc", d2Ns_e[f], ce))
        if self.nfields == 1:
            return Jet(vals[0], gs[0], hs[0])
        val = jnp.stack(vals, axis=1)
        g = None if gs[0] is None else jnp.stack(gs, axis=1)
        h = None if hs[0] is None else jnp.stack(hs, axis=1)
        return Jet(val, g, h)

    def element_matrices(self, density, U, aux_jets=None, params=None):
        """[nel, nloc, nloc] element tangent matrices of density(ctx, u, v),
        linearized about U, via nested AD (jacfwd of the local residual).

        ``aux_jets``: optional dict of precomputed global jets ([nel, nq]
        leading dims) of auxiliary known fields; the density then receives
        u = {"u": <unknown jets>, **aux}.
        """
        dtype = self.scale.dtype

        def elem(uloc, ctx_e, scale_e, aux_e, Ns_e, dNs_e, d2Ns_e, masks_e):
            def local_residual(ul):
                def R(vloc):
                    uj = self._local_jets(ul, Ns_e, dNs_e, d2Ns_e, masks_e)
                    u = uj if aux_e is None else {"u": uj, **aux_e}
                    v = self._local_jets(vloc, Ns_e, dNs_e, d2Ns_e, masks_e)
                    if params is None:
                        dens = jax.vmap(density)(ctx_e, u, v)
                    else:
                        dens = jax.vmap(density,
                                        in_axes=(0, 0, 0, None))(
                            ctx_e, u, v, params)
                    return jnp.sum(dens * scale_e)
                return jax.grad(R)(jnp.zeros(self.nloc, dtype=dtype))
            return jax.jacfwd(local_residual)(uloc)

        Ue = U[self.cat_conn]  # [nel, nloc]
        return jax.vmap(elem)(
            Ue, self.ctx, self.scale, aux_jets,
            tuple(self.Ns), tuple(self.dNs), tuple(self.d2Ns),
            tuple(self.masks))

    def scatter_dense(self, A_e):
        """Scatter element matrices into a dense [ndof, ndof] matrix."""
        rows = self.cat_conn[:, :, None]
        cols = self.cat_conn[:, None, :]
        A = jnp.zeros((self.ndof, self.ndof), dtype=A_e.dtype)
        return A.at[rows, cols].add(A_e)

    def scatter_diag(self, A_e):
        """Scatter only the element-matrix diagonals (Jacobi preconditioner)."""
        d = jnp.diagonal(A_e, axis1=1, axis2=2)
        out = jnp.zeros(self.ndof, dtype=A_e.dtype)
        return out.at[self.cat_conn].add(d)


jax.tree_util.register_pytree_node(
    DomainAssembler,
    lambda a: a.tree_flatten(),
    DomainAssembler.tree_unflatten)


def apply_bc_vector(b, mask):
    """Zero constrained entries of an assembled vector
    (reference: extractVector BC zeroing, common.py:1142-1160)."""
    return b * mask


def apply_bc_matrix(A, mask, diag=1.0):
    """Zero constrained rows/columns and set the diagonal
    (reference: zeroRowsColumns with ``diag`` knob, common.py:1197-1200;
    the large-diag variant shifts BC modes in eigenproblems,
    modal-analysis.py:66-69)."""
    A = A * mask[:, None] * mask[None, :]
    return A + jnp.diag(diag * (1.0 - mask))


def bc_operator(action, mask, diag=1.0):
    """Matrix-free version of apply_bc_matrix for an operator W -> A@W."""
    def op(w):
        return mask * action(mask * w) + diag * (1.0 - mask) * w
    return op


def scatter_bcoo(asm, A_e, ndof=None):
    """Assemble element matrices into a jax.experimental.sparse BCOO matrix
    (duplicates summed) -- the explicit-operator path for problems too large
    for dense assembly but needing an assembled matrix (cheap repeated
    matvecs, eigenproblems, preconditioner construction).  This replaces
    the reference's PETSc MPIAIJ + MatPtAP product (SURVEY.md section 7,
    hard part 4)."""
    from jax.experimental import sparse as jsparse
    import jax.numpy as jnp_

    ndof = asm.ndof if ndof is None else ndof
    nel, nloc, _ = A_e.shape
    rows = jnp_.broadcast_to(asm.cat_conn[:, :, None],
                             (nel, nloc, nloc)).reshape(-1)
    cols = jnp_.broadcast_to(asm.cat_conn[:, None, :],
                             (nel, nloc, nloc)).reshape(-1)
    idx = jnp_.stack([rows, cols], axis=1).astype(jnp_.int32)
    M = jsparse.BCOO((A_e.reshape(-1), idx), shape=(ndof, ndof))
    return M.sum_duplicates(nse=nel * nloc * nloc)
