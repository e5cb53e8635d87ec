"""Pallas TPU kernels for hot assembly paths.

The dominant production kernel in matrix-free IGA is the operator apply:
per Bezier element, evaluate parametric gradients of the field (small dense
matmul), contract with precomputed geometry factors, and project back onto
test-function gradients.  XLA expresses this as batched GEMMs with
[nel, nq, d] intermediates round-tripping HBM; the Pallas kernel fuses the
chain in VMEM, tiling over the element batch.

Key layout trick: the geometry contraction (qw * sqrtJ * g^{-1}) is folded
into the *test-side* gradient tabulation once per geometry, so the kernel
body is exactly two batched GEMMs with no transposes or reshapes (which
Mosaic cannot tile well):

    g[qd, e]  = sum_a A1[(a,qd), e] u[a, e]      (trial gradients)
    r[a, e]   = sum_qd A2[(a,qd), e] g[qd, e]    (geometry-weighted test)

with the element axis riding the 128-wide vector lanes (structure-of-arrays)
and the small basis loops statically unrolled.
Compute dtype is float32 (TPU VPU/MXU native); the XLA float64 path is the
verification reference.  On non-TPU backends the kernel runs in interpret
mode for testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_apply_kernel(m, nen):
    """Kernel factory: one element tile, element-major (structure-of-arrays)
    layout.  The element axis rides the 128-wide vector lanes; the small
    basis/quadrature axes are unrolled statically as contiguous 2D row
    blocks (Mosaic handles 2D elementwise ops + sublane reductions well,
    3D reductions poorly)."""

    def kernel(A1_ref, A2_ref, u_ref, out_ref):
        # A1 rows grouped by local function a: rows [a*m:(a+1)*m] hold the
        # m trial-gradient samples of function a; likewise A2 for the
        # geometry-weighted test gradients.  All slices go through the refs
        # (Mosaic legalizes ref windows at unaligned rows; value slices of
        # non-sublane-aligned loads it does not).
        g = A1_ref[0:m, :] * u_ref[0:1, :]
        for a in range(1, nen):
            g += A1_ref[a * m:(a + 1) * m, :] * u_ref[a:a + 1, :]
        for a in range(nen):
            out_ref[a:a + 1, :] = jnp.sum(
                A2_ref[a * m:(a + 1) * m, :] * g, axis=0, keepdims=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_e", "interpret"))
def fused_element_apply(A1, A2, ue, tile_e=256, interpret=False):
    """Fused per-element operator apply (float32).

    A1 : [nen*m, nel]    trial-side tabulation, rows grouped by local
                         function (m flattens quadrature points x
                         parametric directions; element axis on lanes)
    A2 : [nen*m, nel]    geometry-weighted test-side tabulation, same layout
    ue : [nen, nel]      gathered element coefficients (element-major)
    ->   [nen, nel]      element residual contributions
    """
    # 2D element-major layouts: [nen*m, nel], [nen*m, nel], [nen, nel]
    A1 = A1.astype(jnp.float32)
    A2 = A2.astype(jnp.float32)
    ue = ue.astype(jnp.float32)
    nen, nel = ue.shape
    m = A1.shape[0] // nen
    nel_p = _round_up(nel, tile_e)
    if nel_p != nel:
        pad = nel_p - nel
        A1 = jnp.pad(A1, ((0, 0), (0, pad)))
        A2 = jnp.pad(A2, ((0, 0), (0, pad)))
        ue = jnp.pad(ue, ((0, 0), (0, pad)))

    grid = (nel_p // tile_e,)
    # Mosaic cannot legalize the i64 index ops x64-mode tracing produces;
    # the kernel is all-f32, so trace it with x64 disabled.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _make_apply_kernel(m, nen),
            grid=grid,
            in_specs=[
                pl.BlockSpec((nen * m, tile_e), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nen * m, tile_e), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nen, tile_e), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nen, tile_e), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nen, nel_p), jnp.float32),
            interpret=interpret,
        )(A1, A2, ue)
    return out[:, :nel]


def laplace_layouts(asm):
    """Precompute the (A1, A2) layouts of the fused stiffness apply for a
    scalar space: A1 = trial gradients, A2 = qw * sqrtJ * ginv-weighted test
    gradients.  One-time geometry work (f32)."""
    if asm.nfields != 1:
        raise ValueError("fused Laplace apply expects a scalar space")
    dN = asm.dNs[0]                       # [nel, nq, nen, d]
    nel, nq, nen, d = dN.shape
    G = asm.ctx.ginv * asm.scale[..., None, None]   # [nel, nq, d, d]
    dNG = jnp.einsum("eqac,eqdc->eqad", dN, G)      # weighted test grads
    # 2D element-major layouts: rows grouped by local function a, element
    # axis last (rides the vector lanes)
    A1 = dN.transpose(2, 1, 3, 0).reshape(nen * nq * d, nel)
    A2 = dNG.transpose(2, 1, 3, 0).reshape(nen * nq * d, nel)
    return A1.astype(jnp.float32), A2.astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("ndof", "tile_e", "interpret",
                                    "use_pallas", "nen"))
def _laplace_apply(A1, A2, connT, mask, W, ndof, tile_e, interpret,
                   use_pallas, nen):
    Wm = (mask * W).astype(jnp.float32)
    ue = Wm[connT]
    if use_pallas:
        re = fused_element_apply(A1, A2, ue, tile_e=tile_e,
                                 interpret=interpret)
    else:
        m = A1.shape[0] // nen
        A1r = A1.reshape(nen, m, -1)
        A2r = A2.reshape(nen, m, -1)
        g = jnp.einsum("amn,an->mn", A1r, ue)
        re = jnp.einsum("amn,mn->an", A2r, g)
    r = jnp.zeros(ndof, dtype=jnp.float32).at[connT].add(re)
    return (mask * r + (1.0 - mask) * W).astype(W.dtype)


def make_laplace_operator(asm, mask, tile_e=256, interpret=None,
                          use_pallas=False):
    """Matrix-free stiffness operator W -> A @ W for a scalar space on the
    f32 fast path (the f64 XLA tangent action remains the verification
    path).  One jitted gather -> element apply -> scatter chain.

    Measured on a TPU v5e chip at 66k DoFs / 65k elements (p=2): the XLA
    einsum formulation of the element apply sustains ~2.6e9 DoF/s per
    operator application (0.025 ms), 5x the f64 AD tangent action; the
    hand-written Pallas kernel (use_pallas=True) is functionally identical
    but hits a Mosaic slow path with sub-sublane row blocks (~10 ms), so
    XLA's fusion is the production default -- don't hand-schedule what the
    compiler already does.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    A1, A2 = laplace_layouts(asm)
    connT = asm.conns[0].T  # [nen, nel]
    ndof = asm.ndof
    nen = int(connT.shape[0])

    def op(W):
        return _laplace_apply(A1, A2, connT, mask, W, ndof, tile_e,
                              interpret, use_pallas, nen)

    return op
