"""Curvilinear tensor calculus at quadrature points.

Counterpart of the reference's CurvilinearTensor machinery
(tIGAr/calculusUtils.py:83-249): tensors with per-index raised/lowered
bookkeeping, index raising/lowering through the metric, curvilinear inner
products, and covariant derivatives with Christoffel corrections.  The
reference operates on UFL expressions where ``grad`` is symbolic; here a
tensor's parametric derivative is supplied explicitly (for spline fields it
is the next jet component), and the geometry (metric, inverse metric,
Christoffel symbols) comes from the quadrature-point context ``forms.QP``.

Cartesian operators (cartesianGrad/Div/Curl) and the conforming
pushforwards live on QP itself (forms.py); the scaled measure that
``tIGArMeasure`` implements (calculusUtils.py:351-410) is built into the
assembler, which multiplies every density by qw * sqrt(det g) (volume) or
qw * surface Jacobian (facets).
"""

from __future__ import annotations

import string

import jax.numpy as jnp


class CurvilinearTensor:
    """Arbitrary-rank tensor in curvilinear coordinates with raised/lowered
    index bookkeeping (reference: calculusUtils.py:83-174)."""

    def __init__(self, T, g, lowered=None, ginv=None):
        from .ops.smallmat import inv_small
        self.T = jnp.asarray(T)
        self.g = g
        self.ginv = inv_small(g) if ginv is None else ginv
        if lowered is None:
            lowered = [True] * self.T.ndim
        self.lowered = list(lowered)

    @property
    def rank(self):
        return self.T.ndim

    # -- arithmetic -------------------------------------------------------------

    def __add__(self, other):
        return CurvilinearTensor(self.T + other.T, self.g, self.lowered,
                                 self.ginv)

    def __sub__(self, other):
        return CurvilinearTensor(self.T - other.T, self.g, self.lowered,
                                 self.ginv)

    def __rmul__(self, c):
        return CurvilinearTensor(c * self.T, self.g, self.lowered, self.ginv)

    __mul__ = __rmul__

    # -- index gymnastics ---------------------------------------------------------

    def _flip(self, i):
        mat = self.ginv if self.lowered[i] else self.g
        n = self.rank
        letters = string.ascii_lowercase
        src = letters[:n]
        out = src[:i] + "z" + src[i + 1:]
        T = jnp.einsum(f"{src},{src[i]}z->{out}", self.T, mat)
        lowered = self.lowered[:i] + [not self.lowered[i]] + self.lowered[i + 1:]
        return CurvilinearTensor(T, self.g, lowered, self.ginv)

    def raise_index(self, i):
        return self._flip(i) if self.lowered[i] else self

    def lower_index(self, i):
        return self._flip(i) if not self.lowered[i] else self

    def sharp(self):
        out = self
        for i in range(self.rank):
            out = out.raise_index(i)
        return out

    def flat(self):
        out = self
        for i in range(self.rank):
            out = out.lower_index(i)
        return out


def curvilinear_inner(T: CurvilinearTensor, S: CurvilinearTensor):
    """Metric-weighted full contraction (calculusUtils.py:176-186)."""
    return jnp.sum(T.sharp().T * S.flat().T)


def covariant_derivative(T: CurvilinearTensor, dT, christoffel):
    """Covariant derivative (new index last, lowered).

    dT          : parametric derivative of T's components, shape
                  T.shape + (d,)
    christoffel : Gamma^a_{dc} with the first index raised
                  (forms.QP.christoffel())
    (reference: calculusUtils.py:189-211)
    """
    n = T.rank
    letters = string.ascii_lowercase
    src = letters[:n]
    out = jnp.asarray(dT)
    for i in range(n):
        # contract the i-th index with Gamma; new derivative index is 'y'
        rest = src[:i] + "z" + src[i + 1:]
        if T.lowered[i]:
            corr = jnp.einsum(f"{rest},z{src[i]}y->{src}y", T.T, christoffel)
            out = out - corr
        else:
            corr = jnp.einsum(f"{rest},{src[i]}zy->{src}y", T.T, christoffel)
            out = out + corr
    return CurvilinearTensor(out, T.g, T.lowered + [True], T.ginv)


def curvilinear_grad(T: CurvilinearTensor, dT, christoffel):
    """Covariant derivative with the new (last) index raised
    (calculusUtils.py:213-226)."""
    D = covariant_derivative(T, dT, christoffel)
    return D.raise_index(D.rank - 1)


def curvilinear_div(T: CurvilinearTensor, dT, christoffel):
    """Covariant derivative contracted over the new index and the last
    raised index of T (calculusUtils.py:228-249)."""
    j = -1
    for i in range(T.rank):
        if not T.lowered[i]:
            j = i
    if j == -1:
        raise ValueError("divergence requires at least one raised index")
    D = covariant_derivative(T, dT, christoffel)
    n = D.rank
    letters = string.ascii_lowercase
    src = letters[:n - 1] + letters[j]  # contract last with index j
    out_idx = letters[:j] + letters[j + 1:n - 1]
    out = jnp.einsum(f"{src}->{out_idx}", D.T)
    lowered = T.lowered[:j] + T.lowered[j + 1:]
    return CurvilinearTensor(out, T.g, lowered, T.ginv)


def spline_GRAD(ctx, u):
    """Curvilinear gradient of a (vector) field jet whose components are in
    parametric coordinates, all indices lowered by default (reference:
    ExtractedSpline.GRAD, common.py:1068-1081)."""
    T = CurvilinearTensor(u.val, ctx.g, ginv=ctx.ginv)
    return curvilinear_grad(T, u.g, ctx.christoffel())


def spline_DIV(ctx, u):
    """Curvilinear divergence of a (vector) field jet, indices raised first
    (reference: ExtractedSpline.DIV, common.py:1082-1093)."""
    T = CurvilinearTensor(u.val, ctx.g, ginv=ctx.ginv).sharp()
    # sharp() changes components: propagate the parametric derivative of the
    # raised components: d(g^{ab} u_b) = dg^{ab} u_b + g^{ab} du_b, with
    # dg^{-1} = -ginv dg ginv.
    dg = ctx.dmetric()
    dginv = -jnp.einsum("ac,cbe,bd->ade", ctx.ginv, dg, ctx.ginv)
    dT = (jnp.einsum("abe,b->ae", dginv, u.val)
          + jnp.einsum("ab,be->ae", ctx.ginv, u.g))
    return curvilinear_div(T, dT, ctx.christoffel())
