"""Mixed-precision stencil-multigrid Newton for MULTI-PATCH spaces.

Round-3 VERDICT item #2: the production mixed-precision solver
(solvers/newton_stencil.StencilNewton) served exactly one space family --
equal-order single-patch tensor-product.  This module extends the SAME
solver structure (f32 production steps, stencil tangents, fused MG-CG,
f64/mixed polish to the double-precision evaluation floor) to equal-order
spaces over a MultiPatchBSplineBasis whose patches are weakly coupled by
any interface form (penalty, or the round-4 consistent
interface.EnergyNitscheCoupling):

  - the assembled tangent is a ``MultiPatchStencilOperator``: one
    sliding-window stencil PER PATCH (the element batch of a multipatch
    tabulation is the patch-ordered concatenation of per-patch batches,
    models/multipatch._concat_tabs, so per-patch element-matrix slices
    feed ops/stencil.stencil_from_element_matrices unchanged) plus the
    EXACT dense interface tangent block from
    interface.InterfaceForm.tangent_block (per-quadrature-point
    jet-Hessians scattered over the interface support -- never an
    ndof-direction AD sweep);
  - level transfers are per-patch separable knot insertions
    (``MultiPatchProlong``), dropping into the SAME fused MG-CG programs
    as the single-patch solver through the up()/down() prolongation
    interface;
  - every level operator (smoothing residuals, Jacobi diagonals, the
    coarsest dense inverse) INCLUDES its level's interface block --
    penalty/Nitsche interface stiffness is comparable to the bending
    diagonal at production scales, so leaving it out of the smoother
    diverges the V-cycle on interface DoFs;
  - the nonlinear residual is domain + coupling:  r(U) = mask * (R(U) +
    dE_interface/dU), assembled in f32 for production steps and in f64
    (optionally native IEEE f64 on the host CPU backend) for the polish
    phase, with the same cross-backend evaluation-floor certificate.

Reference analog: common.py:1304-1348 is space-agnostic because PETSc
assembles whatever sparsity arrives; here the multi-patch structure is
kept explicit so every apply stays gather/scatter-free within patches.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .multigrid import insertion_matrix_1d
from .newton_stencil import (StencilNewton, make_stencil_mgcg,
                             make_stencil_mgcg_mixed, _grid_prolong,
                             _equal_order_basis)
from ..ops.stencil import (StencilOperator, stencil_from_element_matrices,
                           stencil_to_dense)
from ..ops.assembly import apply_bc_matrix
from ..interface import _iform_tangent_block


class MultiPatchStencilOperator:
    """W -> A @ W for a multi-patch assembled tangent: block-diagonal
    per-patch StencilOperators (field-major global DoF layout, patch
    blocks contiguous within each field) plus a dense interface coupling
    block over the interface-supported DoFs.  Registered pytree;
    jit-stable across rebuilt values."""

    def __init__(self, sts, iface_idx, iface_K, foffsets, doffsets, nf,
                 iface_Sinv=None):
        self.sts = tuple(sts)
        self.iface_idx = iface_idx          # [m] int or None
        self.iface_K = iface_K              # [m, m] or None
        # dense f32 inverse of the BC'd LOCAL interface operator
        # (patch-stencil diagonal at iface_idx + full K): the exact
        # subspace (Schwarz) correction the V-cycle smoother applies --
        # Jacobi alone cannot smooth the penalty-stiff interface block
        # (measured: inner MG-CG stalls at 0.31 relative without it)
        self.iface_Sinv = iface_Sinv        # [m, m] f32 or None
        self.foffsets = tuple(int(o) for o in foffsets)   # len nf
        self.doffsets = tuple(int(o) for o in doffsets)   # len n_patch+1
        self.nf = int(nf)

    @property
    def has_schwarz(self):
        return self.iface_Sinv is not None

    def schwarz(self, r, mask):
        """Exact interface-subspace correction (f32 local solve).

        iface_Sinv is a HOST-f64 inverse cast to f32 (see
        MultiPatchStencilNewton._mp_build: the on-device f32 LU's bf16
        internal passes corrupt it beyond Newton-Schulz repair on this
        penalty-dominated block).  precision=HIGHEST on the apply: the
        block spans the penalty scales (pd ~ 2e9 displacement / pr ~ 2e6
        rotation vs O(1e7) bending diagonal) and a bf16-pass correction
        re-injects eps_bf16-relative noise on the stiffest rows.  The op
        is [m, m] @ [m] with m ~ O(1e2-1e3); true-f32 passes cost
        nothing measurable."""
        m_idx = mask[self.iface_idx]
        rs = (m_idx * r[self.iface_idx]).astype(self.iface_Sinv.dtype)
        y = jnp.matmul(self.iface_Sinv, rs,
                       precision=jax.lax.Precision.HIGHEST).astype(r.dtype)
        return jnp.zeros_like(r).at[self.iface_idx].set(m_idx * y)

    @property
    def ndof(self):
        return self.nf * self.doffsets[-1]

    def _patch_block(self, U, p):
        dp = self.doffsets[p]
        ncp = self.doffsets[p + 1] - dp
        return jnp.concatenate([U[of + dp:of + dp + ncp]
                                for of in self.foffsets])

    def _scatter_patch(self, out, y, p):
        dp = self.doffsets[p]
        ncp = self.doffsets[p + 1] - dp
        y = y.reshape(self.nf, ncp)
        for f, of in enumerate(self.foffsets):
            out = out.at[of + dp:of + dp + ncp].set(y[f])
        return out

    def __call__(self, U):
        out = jnp.zeros_like(U)
        for p, st in enumerate(self.sts):
            out = self._scatter_patch(out, st(self._patch_block(U, p)), p)
        if self.iface_K is not None:
            # precision=HIGHEST: penalty-scaled block (see schwarz());
            # bf16 MXU passes put ~4e-3 relative noise on pd~2e9 entries,
            # which the f32 production CG and V-cycle smoothing residuals
            # cannot tolerate.  [m, m] @ [m], cost immeasurable.
            out = out.at[self.iface_idx].add(jnp.matmul(
                self.iface_K, U[self.iface_idx],
                precision=jax.lax.Precision.HIGHEST))
        return out

    def diagonal(self):
        n = self.ndof
        d = jnp.zeros((n,), dtype=self.sts[0].S.dtype)
        for p, st in enumerate(self.sts):
            d = self._scatter_patch(d, st.diagonal(), p)
        if self.iface_K is not None:
            d = d.at[self.iface_idx].add(jnp.diagonal(self.iface_K))
        return d

    def astype(self, dtype):
        return MultiPatchStencilOperator(
            tuple(st.astype(dtype) for st in self.sts),
            self.iface_idx,
            None if self.iface_K is None else self.iface_K.astype(dtype),
            self.foffsets, self.doffsets, self.nf,
            iface_Sinv=self.iface_Sinv)   # preconditioner-only, stays f32

    def tree_flatten(self):
        return ((self.sts, self.iface_idx, self.iface_K, self.iface_Sinv),
                (self.foffsets, self.doffsets, self.nf))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.sts, obj.iface_idx, obj.iface_K, obj.iface_Sinv = children
        obj.foffsets, obj.doffsets, obj.nf = aux
        return obj


jax.tree_util.register_pytree_node(
    MultiPatchStencilOperator,
    lambda s: s.tree_flatten(),
    MultiPatchStencilOperator.tree_unflatten)


class MultiPatchProlong:
    """Per-patch separable knot-insertion prolongation between two
    multi-patch levels with identical patch layouts (pytree; the up/down
    interface of newton_stencil.TensorProlong)."""

    def __init__(self, Ps, nf, shapes_f, shapes_c, foff_f, foff_c,
                 doff_f, doff_c):
        self.Ps = tuple(tuple(p) for p in Ps)   # [patch][direction]
        self.nf = int(nf)
        self.shapes_f = tuple(tuple(s) for s in shapes_f)
        self.shapes_c = tuple(tuple(s) for s in shapes_c)
        self.foff_f = tuple(int(o) for o in foff_f)
        self.foff_c = tuple(int(o) for o in foff_c)
        self.doff_f = tuple(int(o) for o in doff_f)
        self.doff_c = tuple(int(o) for o in doff_c)

    def _move(self, x, Ps_by_patch, shapes_in, foff_in, doff_in,
              foff_out, doff_out, n_out, shapes_out):
        out = jnp.zeros((self.nf * doff_out[-1],), dtype=x.dtype)
        for p, Ps in enumerate(Ps_by_patch):
            dpi = doff_in[p]
            ncpi = doff_in[p + 1] - dpi
            blk = jnp.concatenate([x[of + dpi:of + dpi + ncpi]
                                   for of in foff_in])
            y = _grid_prolong(Ps, blk, self.nf, shapes_in[p])
            ncpo = doff_out[p + 1] - doff_out[p]
            y = y.reshape(self.nf, ncpo)
            for f, of in enumerate(foff_out):
                out = out.at[of + doff_out[p]:
                             of + doff_out[p] + ncpo].set(y[f])
        return out

    def up(self, xc):
        return self._move(xc, self.Ps, self.shapes_c, self.foff_c,
                          self.doff_c, self.foff_f, self.doff_f,
                          None, self.shapes_f)

    def down(self, rf):
        PsT = tuple(tuple(P.T for P in Ps) for Ps in self.Ps)
        return self._move(rf, PsT, self.shapes_f, self.foff_f,
                          self.doff_f, self.foff_c, self.doff_c,
                          None, self.shapes_c)

    def tree_flatten(self):
        return ((self.Ps,), (self.nf, self.shapes_f, self.shapes_c,
                             self.foff_f, self.foff_c, self.doff_f,
                             self.doff_c))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.Ps,) = children
        (obj.nf, obj.shapes_f, obj.shapes_c, obj.foff_f, obj.foff_c,
         obj.doff_f, obj.doff_c) = aux
        return obj


jax.tree_util.register_pytree_node(
    MultiPatchProlong,
    lambda p: p.tree_flatten(),
    MultiPatchProlong.tree_unflatten)


def _cast_pytree(obj, dtype):
    """Cast every floating jnp leaf of a registered pytree object."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, obj)


def mp_stencil_to_dense(op: MultiPatchStencilOperator):
    """Densify on the host (numpy index arithmetic only)."""
    n = op.ndof
    S0 = np.asarray(op.sts[0].S)
    A = np.zeros((n, n), dtype=S0.dtype)
    for p, st in enumerate(op.sts):
        Ad = stencil_to_dense(st)
        dp = op.doffsets[p]
        ncp = op.doffsets[p + 1] - dp
        gidx = np.concatenate([of + dp + np.arange(ncp)
                               for of in op.foffsets])
        A[np.ix_(gidx, gidx)] += Ad
    if op.iface_K is not None:
        idx = np.asarray(op.iface_idx)
        A[np.ix_(idx, idx)] += np.asarray(op.iface_K)
    return A


class MultiPatchStencilNewton(StencilNewton):
    """StencilNewton over an equal-order multi-patch space with a weak
    interface coupling (see module docstring).  Inherits the full
    production/polish driver (step / polish_step / solve, the precision
    model, the evaluation-floor certificates) from StencilNewton;
    everything space-specific is rebuilt here.

    Parameters beyond StencilNewton
    -------------------------------
    coupling     : interface form on ``spline`` (PenaltyInterfaceCoupling /
                   ShellInterfaceCoupling / EnergyNitscheCoupling / any
                   InterfaceForm) -- folded into residuals, tangents,
                   Jacobi diagonals, and the coarse dense inverse
    mg_couplings : one interface form per entry of ``mg_splines`` (the
                   same coupling constructed on each coarser space)
    """

    def __init__(self, spline, adjoint_res, coupling, mg_splines=(),
                 mg_couplings=(), cg_iters=15, n_smooth=2, omega=0.7,
                 build_chunk32=None, build_chunk64=1024, setup_log=None,
                 coarse_cache=None, polish_cg_iters=30,
                 polish_tangent="f64", build_quad_degree=None,
                 rebuild_rel=1e-5, hessian=None,
                 polish_residual_device="accel"):
        import os as _os
        import time as _time
        from ..models.multipatch import MultiPatchBSplineBasis

        if len(mg_couplings) != len(mg_splines):
            raise ValueError("need one mg_coupling per mg_spline")
        self.spline = spline
        self.adjoint = adjoint_res
        self.coupling = coupling
        self.cg_iters = int(cg_iters)
        self.asm64 = spline._assembler("dx")
        self.asm32 = self.asm64.astype(jnp.float32)
        self._build_quad_degree = build_quad_degree
        asm64_b = (self.asm64 if build_quad_degree is None
                   else spline._assembler("dx",
                                          quad_degree=build_quad_degree))
        asm32_b = asm64_b.astype(jnp.float32)
        self.asm_b32 = (asm32_b if build_chunk32 is None
                        else asm32_b.with_chunk(build_chunk32))
        self.asm_b64 = (asm64_b if build_chunk64 is None
                        else asm64_b.with_chunk(build_chunk64))
        self.mask64 = spline.mask
        self.mask32 = spline.mask.astype(jnp.float32)
        self.basis = _equal_order_basis(spline)
        if not isinstance(self.basis, MultiPatchBSplineBasis):
            raise ValueError("MultiPatchStencilNewton requires a "
                             "MultiPatchBSplineBasis space; use "
                             "StencilNewton for single patches")
        degs0 = tuple(self.basis.patches[0].degrees)
        for pt in self.basis.patches:
            if tuple(pt.degrees) != degs0:
                raise NotImplementedError("all patches must share degrees "
                                          "(padded ragged tabulations do "
                                          "not slice into stencils)")
        self.nf = spline.space.nfields
        self.mg_splines = list(mg_splines)
        self.mg_couplings = list(mg_couplings)
        self._n_smooth = int(n_smooth)
        self._omega = float(omega)
        self._polish_cg_iters = int(polish_cg_iters)
        self.polish_tangent = str(polish_tangent)
        self.rebuild_rel = float(rebuild_rel)
        self.polish_residual_device = str(polish_residual_device)
        self._res_cpu = None
        self.hessian = hessian
        self._st64 = None
        self._P0_f64 = None

        # f32 copies of the couplings (pytree casts; ints/indices survive)
        self._c64 = coupling
        self._c32 = _cast_pytree(coupling, jnp.float32)
        adjoint = self.adjoint
        nf = self.nf
        basis = self.basis

        def _layout(spl):
            b = _equal_order_basis(spl)
            foff = tuple(int(o) for o in spl.space.offsets[:-1])
            doff = tuple(int(o) for o in b.doffsets)
            shapes = [tuple(kv.ncp for kv in reversed(pt.kvs))
                      for pt in b.patches]
            return b, foff, doff, shapes

        _, foff_f, doff_f, shapes_f = _layout(spline)
        self._foff = foff_f
        self._doff = doff_f

        def _elem_mats(asm_, U):
            if hessian is not None:
                return asm_.element_matrices_hessian(hessian, U)
            return asm_.element_matrices_adjoint(adjoint, U)

        def _mp_build(asm_, U, cpl, idxpos, mask, b, foff, doff):
            """Returns (op WITHOUT iface_Sinv, S): the dense inverse of
            the BC'd local interface operator S is computed OUTSIDE the
            jit on the HOST in f64 (_host_sinv) -- jnp.linalg.inv's f32
            LU runs bf16 MXU passes on TPU, and on this penalty-dominated
            S (kappa >= pd/pr ~ 1e3, and much worse against the bending
            diagonal) the bf16 inverse error eps_bf16*kappa is O(1)+:
            Newton-Schulz cannot recover it (it needs |I - S Sinv| < 1)
            and the corrupted Schwarz correction de-SPDs the V-cycle --
            measured on the chip: the mixed FCG polish step LEAVES a 40x
            linear residual (CPU IEEE twin: 1.05) and Newton diverges."""
            E = _elem_mats(asm_, U)
            sts = []
            e0 = 0
            for pt in b.patches:
                sts.append(stencil_from_element_matrices(
                    pt, E[e0:e0 + pt.nel], nf=nf))
                e0 += pt.nel
            idx, pos_a, pos_b = idxpos
            K = _iform_tangent_block(cpl, U[idx], pos_a, pos_b, cpl.params)
            op = MultiPatchStencilOperator(sts, idx, K, foff, doff, nf)
            # BC'd local interface operator (patch-diagonal at idx + K)
            d_patch = (op.diagonal() - jnp.zeros(op.ndof,
                                                 dtype=K.dtype)
                       .at[idx].add(jnp.diagonal(K)))[idx]
            m_idx = mask[idx].astype(K.dtype)
            S = K + jnp.diag(d_patch)
            S = (m_idx[:, None] * S * m_idx[None, :]
                 + jnp.diag(1.0 - m_idx))
            return op, S

        def _host_sinv(S):
            """Exact f64 host inverse of the local interface operator,
            cast to the f32 the Schwarz preconditioner stores.  One
            [m, m] fetch + host LU per tangent rebuild (m ~ O(1e2-1e3));
            jnp.asarray keeps the result UNCOMMITTED so downstream jits
            still hit the persistent cache (round-3 lesson)."""
            Sh = np.asarray(S, dtype=np.float64)
            return jnp.asarray(np.linalg.inv(Sh).astype(np.float32))

        idxpos_f = coupling.support_positions()

        @jax.jit
        def build_fine(asm_, U, cpl, idxpos, mask):
            return _mp_build(asm_, U, cpl, idxpos, mask, basis, foff_f,
                             doff_f)

        self._build_mp = build_fine

        def _build(asm_, U):
            f64 = U.dtype == jnp.float64
            op, S = build_fine(asm_, U,
                               self._c64 if f64 else self._c32,
                               idxpos_f,
                               self.mask64 if f64 else self.mask32)
            # the Schwarz inverse is preconditioner-only (always f32 and
            # only ever applied through the f32 V-cycle): f64 operator
            # builds never smooth, so skip the host round trip for them
            if not f64:
                op.iface_Sinv = _host_sinv(S)
            return op

        self._build = _build

        @jax.jit
        def res(asm_, mask, U, cpl):
            r = asm_.residual_vector_adjoint(adjoint, U)
            return mask * (r + jax.grad(cpl.energy)(U))

        self._res = lambda asm_, mask, U: res(
            asm_, mask, U,
            self._c64 if U.dtype == jnp.float64 else self._c32)

        if self.polish_residual_device == "cpu":
            _t0 = _time.time()
            self._cpu_res()
            if setup_log:
                setup_log(f"  host-CPU f64 residual assembler built "
                          f"({_time.time() - _t0:.1f}s)")

        # -- multigrid ladder --------------------------------------------------
        all_splines = [spline] + self.mg_splines
        layouts = [_layout(s) for s in all_splines]
        nlev = len(all_splines)
        self._mgcg = make_stencil_mgcg(nlev, n_smooth=n_smooth,
                                       omega=omega, n_iters=self.cg_iters)
        self._mgcg_mixed = make_stencil_mgcg_mixed(
            nlev, n_smooth=n_smooth, omega=omega,
            n_iters=int(polish_cg_iters))
        prolongs = []
        for i in range(nlev - 1):
            bf, foff_fi, doff_fi, shapes_fi = layouts[i]
            bc, foff_ci, doff_ci, shapes_ci = layouts[i + 1]
            Ps = []
            for pf, pc in zip(bf.patches, bc.patches):
                Ps.append(tuple(jnp.asarray(insertion_matrix_1d(kc, kf),
                                            dtype=jnp.float32)
                                for kc, kf in zip(reversed(pc.kvs),
                                                  reversed(pf.kvs))))
            prolongs.append(MultiPatchProlong(
                Ps, nf, shapes_fi, shapes_ci, foff_fi, foff_ci,
                doff_fi, doff_ci))
        self._Ps = tuple(prolongs)

        # -- coarse operators (zero state; optional disk cache) ---------------
        cached = None
        if coarse_cache and _os.path.exists(coarse_cache):
            try:
                with np.load(coarse_cache) as z:
                    cached = {k: z[k] for k in z.files}
            except Exception:
                cached = None
        # v3: caches written before the bf16-MXU precision fix carry a
        # corrupted iface_Sinv (built by an f32 LU whose internal matmuls
        # ran as bf16 passes on the TPU; see _mp_build docstring);
        # absent/older version keys force a rebuild with the host-f64
        # inverse path.
        loaded = (cached is not None
                  and int(cached.get("n", -1)) == len(self.mg_splines)
                  and int(cached.get("v", 1)) >= 4)
        coarse_sts, diags, masks = [], [], []
        dense_inv = None
        for i, (spl, cpl) in enumerate(zip(self.mg_splines,
                                           self.mg_couplings)):
            _t0 = _time.time()
            b_c, foff_c, doff_c, _ = _layout(spl)
            cpl32 = _cast_pytree(cpl, jnp.float32)
            idxpos_c = cpl32.support_positions()
            if loaded:
                sts = [StencilOperator(
                    jnp.asarray(cached[f"S{i}_{p}"]),
                    tuple(kv.ncp for kv in reversed(pt.kvs)),
                    tuple(kv.p for kv in reversed(pt.kvs)), nf)
                    for p, pt in enumerate(b_c.patches)]
                op = MultiPatchStencilOperator(
                    sts, idxpos_c[0],
                    jnp.asarray(cached[f"K{i}"]), foff_c, doff_c, nf,
                    iface_Sinv=jnp.asarray(cached[f"Sinv{i}"]))
            else:
                asm_c = spl._assembler("dx").astype(jnp.float32)
                asm_c = asm_c.with_chunk(1024)
                build_c = jax.jit(
                    lambda a, U, c, ip, mk, b=b_c, fo=foff_c, do=doff_c:
                    _mp_build(a, U, c, ip, mk, b, fo, do))
                op, S_c = build_c(asm_c,
                                  jnp.zeros(spl.ndof, dtype=jnp.float32),
                                  cpl32, idxpos_c,
                                  spl.mask.astype(jnp.float32))
                op.iface_Sinv = _host_sinv(S_c)
            m_h = np.asarray(spl.mask, dtype=np.float64)
            d = np.asarray(op.diagonal())
            d = m_h * d + (1.0 - m_h)
            coarse_sts.append(op)
            diags.append(jnp.asarray(1.0 / d, dtype=jnp.float32))
            masks.append(jnp.asarray(m_h, dtype=jnp.float32))
            if i == len(self.mg_splines) - 1:
                if loaded:
                    dense_inv = jnp.asarray(cached["inv"],
                                            dtype=jnp.float32)
                else:
                    A = mp_stencil_to_dense(op)
                    cpu = jax.devices("cpu")[0]
                    A = np.asarray(apply_bc_matrix(
                        jax.device_put(jnp.asarray(A), cpu),
                        jax.device_put(jnp.asarray(m_h), cpu)))
                    dense_inv = jnp.asarray(np.linalg.inv(A),
                                            dtype=jnp.float32)
            if setup_log:
                setup_log(f"    coarse level {i} ({spl.ndof} dofs"
                          f"{', cached' if loaded else ''}): "
                          f"{_time.time() - _t0:.1f}s")
        if coarse_cache and not loaded and self.mg_splines:
            payload = {"n": np.asarray(len(self.mg_splines)),
                       "v": np.asarray(4),
                       "inv": np.asarray(dense_inv)}
            for i, op in enumerate(coarse_sts):
                for p, st in enumerate(op.sts):
                    payload[f"S{i}_{p}"] = np.asarray(st.S)
                payload[f"K{i}"] = np.asarray(op.iface_K)
                payload[f"Sinv{i}"] = np.asarray(op.iface_Sinv)
            _os.makedirs(_os.path.dirname(coarse_cache) or ".",
                         exist_ok=True)
            np.savez(coarse_cache, **payload)
            if setup_log:
                setup_log(f"    coarse operators saved to {coarse_cache}")
        if not self.mg_splines:
            raise ValueError("MultiPatchStencilNewton requires at least "
                             "one coarser spline in mg_splines")
        self._coarse_sts = tuple(coarse_sts)
        self._coarse_dinvs = tuple(diags)
        self._coarse_masks = tuple(masks)
        self._coarse_inv = dense_inv

    # -- space-specific overrides -------------------------------------------------

    def _cpu_res_build(self):
        cpu = jax.devices("cpu")[0]
        asm_cpu = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, cpu),
            self.spline._assembler("dx", device=cpu))
        mask_cpu = jax.device_put(self.mask64, cpu)
        c_cpu = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, cpu), self._c64)
        adjoint = self.adjoint

        @jax.jit
        def rc_full(a, m, u, c):
            return m * (a.residual_vector_adjoint(adjoint, u)
                        + jax.grad(c.energy)(u))

        self._res_cpu = (lambda a, m, u: rc_full(a, m, u, c_cpu),
                         asm_cpu, mask_cpu)

    def coarse_solver(self, **kwargs):
        raise NotImplementedError("nested iteration is not wired for the "
                                  "multipatch solver (the flat solve is "
                                  "the production path)")

    def solve_nested(self, *a, **k):
        raise NotImplementedError("nested iteration is not wired for the "
                                  "multipatch solver")

    def prolong_solution(self, Uc):
        return self.mask64 * self._Ps[0].up(
            Uc.astype(self.spline.dtype)).astype(self.spline.dtype)
