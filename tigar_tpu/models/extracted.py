"""ExtractedSpline: the user-facing analysis object.

TPU-native re-design of the reference's ExtractedSpline
(tIGAr/common.py:667-1434).  Construction tabulates every field basis and
the control basis on the shared Bezier-element grid, precomputes geometry at
all quadrature points, and exposes:

  - assembly of functionals, residual vectors, tangent actions, and dense
    matrices from pointwise JAX form densities (ops/assembly.py),
  - Dirichlet BCs as masks (zeroRowsColumns semantics incl. the ``diag``
    knob, common.py:1176-1204),
  - linear / nonlinear (Newton) variational solvers mirroring
    common.py:1236-1348,
  - L2 and lumped projections (common.py:1351-1433).

Forms are JAX densities evaluated per quadrature point:
    residual/bilinear: density(ctx, u, v)   (linear in v)
    linear:            density(ctx, v)
    functional:        density(ctx, u)      (u optional)
where ctx is a forms.QP and u/v are forms.Jet pytrees.  The state ``U``
passed to assembly may be a single DoF array or a dict of arrays (the
unknown under key "u", plus auxiliary known fields, e.g. time-integrator
history); densities then receive the same structure of Jets.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import (DEFAULT_MAX_ITERS, DEFAULT_RELATIVE_TOLERANCE,
                      real_dtype)
from ..ops.quadrature import npoints_for_degree
from ..ops.geometry import precompute_geometry
from ..ops.assembly import (DomainAssembler, apply_bc_matrix, apply_bc_vector,
                            bc_operator)
from ..solvers.linear import solve_dense, solve_krylov, jacobi_preconditioner
from ..solvers.newton import newton_solve
from .space import SplineSpace

DEFAULT_DENSE_THRESHOLD = 4096


def _get_unknown(U):
    return U["u"] if isinstance(U, dict) else U


def _set_unknown(U, arr):
    if isinstance(U, dict):
        out = dict(U)
        out["u"] = arr
        return out
    return arr


class ExtractedSpline:
    """Analysis object over a SplineSpace.

    Parameters
    ----------
    space       : SplineSpace (or generator subclass)
    quad_degree : polynomial degree integrated exactly per direction
                  (reference QUAD_DEG, e.g. 2*p; poisson.py:89)
    nders       : derivative order to tabulate (1 default; 2 enables
                  hess/lap and rational Hessians, needed for biharmonic,
                  beam, and Kirchhoff-Love shells)
    """

    def __init__(self, space: SplineSpace, quad_degree, nders=1,
                 geom_nders=None):
        self.space = space
        self.quad_degree = int(quad_degree)
        self.npts = npoints_for_degree(quad_degree)
        self.nders = int(nders)
        # geometry may need second derivatives (d2F, for pushforward
        # gradients and Christoffel symbols) even when fields do not
        self.geom_nders = self.nders if geom_nders is None else int(geom_nders)
        self.dtype = real_dtype()

        self.control_basis = space.control_mesh.scalar_basis()
        self.bnet = jnp.asarray(space.control_mesh.homogeneous_points(),
                                dtype=self.dtype)
        self.nsd = space.nsd
        self.dim = self.control_basis.dim
        self.ndof = space.ndof

        self._tab_cache = {}
        self._assemblers = {}
        self.mask = jnp.asarray(space.bc_mask(), dtype=self.dtype)

        # solver options (reference: setSolverOptions, common.py:1292-1302)
        self.max_iters = DEFAULT_MAX_ITERS
        self.relative_tolerance = DEFAULT_RELATIVE_TOLERANCE
        self.linear_solver = None       # None = auto (dense direct if small)
        self.linear_tol = 1e-12
        self.linear_max_iter = None
        self.dense_threshold = DEFAULT_DENSE_THRESHOLD

        # eagerly build the volume assembler
        self._assembler("dx")

    # -- options ---------------------------------------------------------------

    def set_solver_options(self, max_iters=None, relative_tolerance=None,
                           linear_solver=None, linear_tol=None,
                           linear_max_iter=None, dense_threshold=None):
        if max_iters is not None:
            self.max_iters = max_iters
        if relative_tolerance is not None:
            self.relative_tolerance = relative_tolerance
        if linear_solver is not None:
            self.linear_solver = linear_solver
        if linear_tol is not None:
            self.linear_tol = linear_tol
        if linear_max_iter is not None:
            self.linear_max_iter = linear_max_iter
        if dense_threshold is not None:
            self.dense_threshold = dense_threshold

    # -- tabulation / assembler construction ------------------------------------

    def _field_tab(self, basis, domain, nders=None):
        nders = self.nders if nders is None else nders
        key = (id(basis), domain, nders)
        if key not in self._tab_cache:
            if domain == "dx":
                self._tab_cache[key] = basis.tabulate(self.npts, nders)
            else:
                _, direction, side = domain
                self._tab_cache[key] = basis.tabulate_boundary(
                    self.npts, nders, direction, side)
        return self._tab_cache[key]

    def _assembler(self, domain) -> DomainAssembler:
        if domain not in self._assemblers:
            ctrl_tab = self._field_tab(self.control_basis, domain,
                                       nders=self.geom_nders)
            geom = precompute_geometry(ctrl_tab, self.bnet)
            qw = jnp.asarray(ctrl_tab.qw, dtype=self.dtype)
            jac = geom.sqrtJ if domain == "dx" else geom.surfJ
            scale = qw * jac
            tabs = [self._field_tab(f, domain) for f in self.space.fields]
            self._assemblers[domain] = DomainAssembler(
                tabs, self.space.offsets, self.ndof, geom, scale)
        return self._assemblers[domain]

    def _terms(self, form):
        """Normalize a form into [(domain, density)].  A bare callable means
        a volume ("dx") term; a dict may use keys "dx", ("ds", dir, side),
        or "ds" (all boundary sides)."""
        if callable(form):
            return [("dx", form)]
        terms = []
        for key, density in form.items():
            if key == "ds":
                for direction in range(self.dim):
                    for side in (0, 1):
                        terms.append((("ds", direction, side), density))
            else:
                terms.append((key, density))
        return terms

    # -- quadrature-point data for user inspection -------------------------------

    @property
    def geometry(self):
        """QP pytree at volume quadrature points, leaves [nel, nq, ...]."""
        return self._assembler("dx").ctx

    # -- assembly ----------------------------------------------------------------

    def assemble_functional(self, form, U=None):
        """Integrate a scalar density over the domain (for errors, energies,
        dissipation rates...)."""
        total = 0.0
        for domain, density in self._terms(form):
            asm = self._assembler(domain)
            if U is None:
                total = total + asm.functional(density)
            else:
                uj = self._jets_tree(asm, U)
                total = total + jnp.sum(
                    jax.vmap(jax.vmap(density))(asm.ctx, uj) * asm.scale)
        return total

    def assemble_vector(self, form, U=None, apply_bcs=True):
        """Assemble a linear form L(ctx, v) (U=None) or residual
        res(ctx, u, v) at state U (reference: assembleVector,
        common.py:1162-1173)."""
        b = jnp.zeros(self.ndof, dtype=self.dtype)
        for domain, density in self._terms(form):
            asm = self._assembler(domain)
            if U is None:
                b = b + asm.linear_vector(density)
            else:
                b = b + asm.residual_vector(density, self._jets_tree(asm, U))
        if apply_bcs:
            b = apply_bc_vector(b, self.mask)
        return b

    def _jets_tree(self, asm, U):
        if isinstance(U, dict):
            return {k: asm.jets(jnp.asarray(v)) for k, v in U.items()}
        return asm.jets(jnp.asarray(U))

    def _jets_passthrough(self, U):
        return U

    def tangent_action(self, form, U, W, apply_bcs=True, diag=1.0):
        """Action of the tangent dR/d(unknown) at U on W -- the matrix-free
        MᵀAM product."""
        out = jnp.zeros(self.ndof, dtype=self.dtype)
        Uu = _get_unknown(U)
        if apply_bcs:
            W_in = self.mask * W
        else:
            W_in = W
        for domain, density in self._terms(form):
            asm = self._assembler(domain)

            def r_of(a):
                return asm.residual_vector(density,
                                           self._jets_tree(asm, _set_unknown(U, a)))
            out = out + jax.jvp(r_of, (Uu,), (W_in,))[1]
        if apply_bcs:
            out = self.mask * out + diag * (1.0 - self.mask) * W
        return out

    def matrix_operator(self, form, U=None, apply_bcs=True, diag=1.0):
        """Matrix-free operator W -> A @ W (tangent at U)."""
        if U is None:
            U = jnp.zeros(self.ndof, dtype=self.dtype)
        return lambda W: self.tangent_action(form, U, W, apply_bcs=apply_bcs,
                                             diag=diag)

    def assemble_matrix(self, form, U=None, apply_bcs=True, diag=1.0):
        """Dense tangent/bilinear matrix (for eigenproblems and direct
        solves; reference: assembleMatrix + zeroRowsColumns,
        common.py:1176-1220)."""
        if U is None:
            U = jnp.zeros(self.ndof, dtype=self.dtype)
        A = jnp.zeros((self.ndof, self.ndof), dtype=self.dtype)
        for domain, density in self._terms(form):
            asm = self._assembler(domain)
            A = A + asm.scatter_dense(self._element_matrices(asm, density, U))
        if apply_bcs:
            A = apply_bc_matrix(A, self.mask, diag=diag)
        return A

    def assemble_diagonal(self, form, U=None, apply_bcs=True, diag=1.0):
        """Diagonal of the tangent (Jacobi preconditioner)."""
        if U is None:
            U = jnp.zeros(self.ndof, dtype=self.dtype)
        d = jnp.zeros(self.ndof, dtype=self.dtype)
        for domain, density in self._terms(form):
            asm = self._assembler(domain)
            d = d + asm.scatter_diag(self._element_matrices(asm, density, U))
        if apply_bcs:
            d = self.mask * d + diag * (1.0 - self.mask)
        return d

    def _element_matrices(self, asm, density, U):
        if isinstance(U, dict):
            aux = {k: asm.jets(jnp.asarray(v)) for k, v in U.items()
                   if k != "u"}
            return asm.element_matrices(density, jnp.asarray(U["u"]),
                                        aux_jets=aux)
        return asm.element_matrices(density, jnp.asarray(U))

    def assemble_linear_system(self, lhs_form, rhs_form, apply_bcs=True):
        """(A, b) for a bilinear lhs and linear rhs (reference:
        assembleLinearSystem, common.py:1223-1234)."""
        A = self.assemble_matrix(lhs_form, apply_bcs=apply_bcs)
        b = self.assemble_vector(rhs_form, apply_bcs=apply_bcs)
        return A, b

    # -- linear solves -----------------------------------------------------------

    def _solve_linearized(self, form, U, rhs):
        """Solve J(U) x = rhs with BCs applied, dispatching on solver
        options."""
        method = self.linear_solver
        if method is None:
            method = "direct" if self.ndof <= self.dense_threshold else "cg"
        if method == "direct":
            A = self.assemble_matrix(form, U=U)
            return solve_dense(A, rhs)
        action = self.matrix_operator(form, U=U)
        diag = self.assemble_diagonal(form, U=U)
        M = jacobi_preconditioner(diag)
        return solve_krylov(action, rhs, method=method, tol=self.linear_tol,
                            maxiter=self.linear_max_iter, M=M)

    def solve_linear_variational_problem(self, form, rhs_form=None, U0=None,
                                         apply_bcs=True):
        """Solve a linear problem (reference:
        solveLinearVariationalProblem, common.py:1266-1290).

        Either pass (bilinear ``form``, linear ``rhs_form``) -- the a == L
        pattern -- or a single residual ``form`` linear in u (rhs_form=None),
        in which case one exact Newton step is taken from U0.
        """
        if U0 is None:
            U0 = jnp.zeros(self.ndof, dtype=self.dtype)
        if rhs_form is not None:
            A = self.assemble_matrix(form, apply_bcs=apply_bcs)
            b = self.assemble_vector(rhs_form, apply_bcs=apply_bcs)
            if self.linear_solver in (None, "direct") \
                    and self.ndof <= self.dense_threshold:
                return solve_dense(A, b)
            action = self.matrix_operator(form)
            M = jacobi_preconditioner(jnp.diag(A))
            return solve_krylov(action, b,
                                method=self.linear_solver or "cg",
                                tol=self.linear_tol,
                                maxiter=self.linear_max_iter, M=M)
        r = self.assemble_vector(form, U=U0, apply_bcs=apply_bcs)
        dU = self._solve_linearized(form, U0, r)
        return _get_unknown(U0) - dU if isinstance(U0, dict) else U0 - dU

    # -- nonlinear solve ----------------------------------------------------------

    def solve_nonlinear_variational_problem(self, form, U0=None,
                                            reference_error=None, log=False):
        """Newton solve (reference: solveNonlinearVariationalProblem,
        common.py:1304-1348).  U0 may be an array or a dict with the unknown
        under "u" (auxiliary fields are held fixed)."""
        if U0 is None:
            U0 = jnp.zeros(self.ndof, dtype=self.dtype)
        Uaux = U0 if isinstance(U0, dict) else None

        def residual(u_arr):
            U = _set_unknown(Uaux, u_arr) if Uaux is not None else u_arr
            return self.assemble_vector(form, U=U)

        def solve_lin(u_arr, r):
            U = _set_unknown(Uaux, u_arr) if Uaux is not None else u_arr
            return self._solve_linearized(form, U, r)

        u0 = jnp.asarray(_get_unknown(U0), dtype=self.dtype)
        u, _ = newton_solve(residual, solve_lin, u0,
                            max_iters=self.max_iters,
                            rtol=self.relative_tolerance,
                            reference_error=reference_error, log=log)
        return u

    # -- projections ----------------------------------------------------------------

    def project(self, fn, rationalize=True, lump_mass=False, apply_bcs=False):
        """L2 (or lumped) projection of a pointwise function ``fn(ctx)``
        (scalar or [nfields]) onto the spline space; returns homogeneous
        DoFs (reference: project, common.py:1392-1433)."""
        def L(ctx, v):
            vv = ctx.rationalize(v) if rationalize else v
            fval = fn(ctx)
            return jnp.sum(jnp.asarray(fval) * vv.val)

        b = self.assemble_vector(L, apply_bcs=apply_bcs)
        if lump_mass:
            def Lones(ctx, v):
                vv = ctx.rationalize(v) if rationalize else v
                return jnp.sum(jnp.atleast_1d(vv.val))
            m = self.assemble_vector(Lones, apply_bcs=apply_bcs)
            return b / m

        def a(ctx, u, v):
            uu = ctx.rationalize(u) if rationalize else u
            vv = ctx.rationalize(v) if rationalize else v
            return jnp.sum(jnp.asarray(uu.val) * jnp.asarray(vv.val))

        return self.solve_linear_variational_problem(a, rhs_form=lambda c, v: L(c, v),
                                                     apply_bcs=apply_bcs)

    # alias matching the reference's FE-to-IGA least-squares intent
    # (common.py:968-993): fitting a pointwise function into spline space.
    fit = project

    # -- point evaluation --------------------------------------------------------

    def evaluate(self, U, xi, rationalize=True):
        """Evaluate the solution at parametric points ``xi`` [n, dim].
        Returns [n] (scalar space) or [n, nfields].  With ``rationalize``,
        divides by the control weight function (physical representation)."""
        import numpy as np_
        U = np_.asarray(U)
        xi = np_.atleast_2d(np_.asarray(xi, dtype=float))
        vals = [self.space.fields[f].evaluate(U[self.space.field_slice(f)], xi)
                for f in range(self.space.nfields)]
        out = np_.stack(vals, axis=-1)
        if rationalize:
            w = self.control_basis.evaluate(
                np_.asarray(self.bnet)[:, -1], xi)
            out = out / w[:, None]
        return out[:, 0] if self.space.nfields == 1 else out

    def evaluate_geometry(self, xi):
        """Physical location F(xi) of parametric points [n, dim] -> [n, nsd]."""
        import numpy as np_
        xi = np_.atleast_2d(np_.asarray(xi, dtype=float))
        B = np_.asarray(self.bnet)
        H = self.control_basis.evaluate(B, xi)  # [n, nsd+1]
        return H[:, :-1] / H[:, -1:]

    # -- norms -----------------------------------------------------------------------

    def errornorm(self, U, exact_fn, rationalize=True, norm="L2"):
        """L2 norm of (u - exact) over the domain; ``exact_fn(ctx)`` gives
        the exact value at a quadrature point."""
        def density(ctx, u):
            uu = ctx.rationalize(u) if rationalize else u
            e = jnp.asarray(uu.val) - jnp.asarray(exact_fn(ctx))
            return jnp.sum(e * e)
        return jnp.sqrt(self.assemble_functional(density, U=U))
