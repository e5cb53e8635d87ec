"""Stencil operators (ops/stencil): assembled sliding-window form of an
arbitrary bilinear form on tensor-product spaces.

Pins: stencil apply == scatter_dense matvec; diagonal extraction; host
densify (stencil_to_dense, the coarse-MG dense-inverse path) == the
element-matrix dense scatter.
"""

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (precompute_shell_reference,
                                    svk_shell_adjoint)
from tigar_tpu.ops.stencil import (stencil_from_element_matrices,
                                   stencil_to_dense)


def _shell(nel, p=2):
    kvecs = [uniform_knots(p, -1.0, 1.0, nel)] * 2
    cm = ExplicitBSplineControlMesh([p, p], kvecs, extra_dim=1)
    sp = EqualOrderSpline(3, cm)
    return precompute_shell_reference(
        ExtractedSpline(sp, quad_degree=2 * p, nders=2))


def test_stencil_matches_dense():
    spline = _shell(5)
    asm = spline._assembler("dx")
    basis = spline.space.fields[0]

    def adj(ctx, u):
        return svk_shell_adjoint(ctx, u, 1.0e7, 0.3, 0.03)

    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-3)
    Em = asm.element_matrices_adjoint(adj, U)
    A = np.asarray(asm.scatter_dense(Em))
    st = stencil_from_element_matrices(basis, Em, nf=3)

    W = jnp.asarray(rng.normal(size=spline.ndof))
    np.testing.assert_allclose(np.asarray(st(W)), A @ np.asarray(W),
                               rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.diagonal()), np.diag(A),
                               rtol=1e-12)
    np.testing.assert_allclose(stencil_to_dense(st), A,
                               rtol=1e-12, atol=1e-12)


def test_with_chunk_same_matrices():
    spline = _shell(4)
    asm = spline._assembler("dx")

    def adj(ctx, u):
        return svk_shell_adjoint(ctx, u, 1.0e7, 0.3, 0.03)

    rng = np.random.default_rng(4)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-3)
    Em = asm.element_matrices_adjoint(adj, U)
    Em_c = asm.with_chunk(5).element_matrices_adjoint(adj, U)
    np.testing.assert_allclose(np.asarray(Em), np.asarray(Em_c),
                               rtol=1e-12, atol=1e-12)
