"""Geometry precomputation at quadrature points.

The reference builds geometry symbolically in UFL: F = cpFuncs/w, DF, metric,
measures (tIGAr/common.py:896-966).  Here the rational geometry mapping and
all derived quantities (metric, pseudo-inverse, volume/surface Jacobians,
physical normals) are evaluated *numerically once* at every quadrature point
of every Bezier element, producing batched arrays that assembly kernels
consume directly.  Geometry is static during analysis, so this is a
preprocessing step, jitted and batched on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..forms import QP
from .smallmat import det_small, inv_small


def eval_jet_arrays(tab, coeffs):
    """Evaluate jets of a (multi-component) coefficient field on a tabulation.

    tab    : Tabulation
    coeffs : [ncp] or [ncp, m]

    Returns (val [nel,nq,(m)], g [nel,nq,(m),d], h or None).
    Padded connectivity entries are neutralized by tab.mask.
    """
    N = jnp.asarray(tab.N)
    conn = jnp.asarray(tab.conn)
    ce = jnp.asarray(coeffs)[conn]  # [nel, nen] or [nel, nen, m]
    if tab.mask is not None:
        m = jnp.asarray(tab.mask)
        ce = ce * (m[..., None] if ce.ndim == 3 else m)
    sub_c = "eam" if ce.ndim == 3 else "ea"
    out_m = "m" if ce.ndim == 3 else ""
    val = jnp.einsum(f"eqa,{sub_c}->eq{out_m}", N, ce)
    g = None
    h = None
    if tab.dN is not None:
        g = jnp.einsum(f"eqad,{sub_c}->eq{out_m}d", jnp.asarray(tab.dN), ce)
    if tab.d2N is not None:
        h = jnp.einsum(f"eqadc,{sub_c}->eq{out_m}dc", jnp.asarray(tab.d2N), ce)
    return val, g, h


def _geom_point(xi, H, Hg, Hh, nref):
    """Build a QP from the homogeneous-geometry jet at one point.

    H   : [nsd+1]      homogeneous coordinates (w x, w)
    Hg  : [nsd+1, d]
    Hh  : [nsd+1, d, d] or None
    nref: [d] outward reference normal, or None for volume points
    """
    nsd = H.shape[0] - 1
    w = H[-1]
    dw = Hg[-1]
    F = H[:nsd] / w
    DF = (Hg[:nsd] - F[:, None] * dw[None, :]) / w
    d2F = None
    wh = None
    if Hh is not None:
        wh = Hh[-1]
        d2F = (Hh[:nsd]
               - DF[:, :, None] * dw[None, None, :]
               - DF[:, None, :] * dw[None, :, None]
               - F[:, None, None] * wh[None, :, :]) / w
    g = DF.T @ DF
    detg = det_small(g)
    ginv = inv_small(g, detg)
    sqrtJ = jnp.sqrt(detg)
    pinv = ginv @ DF.T

    normal = None
    surfJ = None
    if nref is not None:
        # mappedNormal (calculusUtils.py:38-54) and surfaceJacobian (:71-80)
        nraw = DF @ (ginv @ nref)
        normal = nraw / jnp.sqrt(jnp.dot(nraw, nraw))
        surfJ = jnp.sqrt(detg * (nref @ ginv @ nref))

    return QP(xi=xi, x=F, w=w, wg=dw, wh=wh, DF=DF, d2F=d2F, g=g, ginv=ginv,
              sqrtJ=sqrtJ, pinv=pinv, nref=nref, normal=normal, surfJ=surfJ)


_GEOM_JIT_CACHE = {}


def _geom_batched(has_h, has_n):
    """Module-level cache of the jitted double-vmapped QP builder so repeated
    geometry precomputation (e.g. write_vtk time-series loops) reuses the
    compiled kernel instead of retracing per call."""
    key = (has_h, has_n)
    fn = _GEOM_JIT_CACHE.get(key)
    if fn is None:
        axes = (0, 0, 0, 0 if has_h else None, 0 if has_n else None)
        fn = jax.jit(jax.vmap(jax.vmap(_geom_point, in_axes=axes),
                              in_axes=axes))
        _GEOM_JIT_CACHE[key] = fn
    return fn


def precompute_geometry(ctrl_tab, bnet):
    """Evaluate the geometry QP at every quadrature point of ``ctrl_tab``.

    ctrl_tab : Tabulation of the control scalar basis
    bnet     : [ncp, nsd+1] homogeneous control points

    Returns a QP pytree whose leaves have leading dims [nel, nq].
    """
    val, gg, hh = eval_jet_arrays(ctrl_tab, bnet)
    nel, nq = val.shape[:2]
    xi = jnp.asarray(ctrl_tab.qp)
    nref = None
    if ctrl_tab.normal is not None:
        nrm = jnp.asarray(ctrl_tab.normal)
        if nrm.ndim == 2:   # per-element normals (whole-boundary batches)
            nrm = nrm[:, None, :]
        nref = jnp.broadcast_to(nrm, (nel, nq) + (xi.shape[-1],))

    fn = _geom_batched(hh is not None, nref is not None)
    return fn(xi, val, gg, hh, nref)


def precompute_geometry_fused(ctrl_tab, bnet):
    """precompute_geometry as ONE jitted program with the tabulation
    arrays passed as arguments (not closed-over constants).  Use for
    host-CPU assembler builds: the eager op-by-op evaluation costs ~0.4 s
    of XLA:CPU compile latency PER PRIMITIVE on this machine (measured
    80 s total at 128^2 shells), while the fused program compiles once
    (and persists, being above the cache's min-compile-time threshold).
    The default-device (accelerator) build keeps the eager path so its
    downstream jit cache keys (uncommitted leaves) stay unchanged."""
    import dataclasses

    arrs = {k: getattr(ctrl_tab, k)
            for k in ("conn", "N", "dN", "d2N", "qp", "qw", "normal",
                      "mask")
            if getattr(ctrl_tab, k) is not None}

    @jax.jit
    def go(arrs, bnet):
        tab = dataclasses.replace(ctrl_tab, **arrs)
        return precompute_geometry(tab, bnet)

    return go(arrs, bnet)
