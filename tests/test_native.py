"""Native C++ kernel tests: the batched Cox-de Boor and extraction-apply
kernels must agree with the numpy implementations to machine precision."""

import numpy as np
import pytest

from tigar_tpu.ops.knots import KnotVector, uniform_knots
from tigar_tpu.ops import basis as basis_mod
from tigar_tpu.ops.native import (get_lib, bspline_basis_ders_native,
                                  extraction_apply_native)

needs_native = pytest.mark.skipif(get_lib() is None,
                                  reason="native toolchain unavailable")


def _numpy_ders(kv, u, span, nders):
    """Force the numpy path regardless of batch size."""
    out = []
    for i in range(0, len(u), 256):
        out.append(basis_mod.bspline_basis_ders(
            kv.ghost_knots, kv.n_ghost, kv.p, u[i:i + 256],
            span[i:i + 256], nders))
    return np.concatenate(out)


@needs_native
def test_native_basis_matches_numpy():
    rng = np.random.default_rng(0)
    for p in (1, 2, 3, 4):
        for periodic in (False, True):
            kv = KnotVector(p, uniform_knots(p, 0.0, 2.0, 9,
                                             periodic=periodic))
            u = rng.uniform(0.0, 2.0, size=2000)
            span = kv.knot_span(u)
            nat = bspline_basis_ders_native(kv.ghost_knots, kv.n_ghost, p,
                                            u, span, min(2, p))
            ref = _numpy_ders(kv, u, span, min(2, p))
            assert np.allclose(nat, ref, atol=1e-13), (p, periodic)


@needs_native
def test_native_extraction_apply():
    rng = np.random.default_rng(1)
    C = rng.normal(size=(37, 16, 16))
    bern = rng.normal(size=(9, 16))
    nat = extraction_apply_native(C, bern)
    ref = np.einsum("eab,qb->eqa", C, bern)
    assert np.allclose(nat, ref, atol=1e-12)


@needs_native
def test_large_tabulation_uses_native():
    """End-to-end: a large tabulation goes through the native path (>=512
    points) and matches small-batch numpy evaluation."""
    p = 3
    kv = KnotVector(p, uniform_knots(p, 0.0, 1.0, 200))
    u = np.linspace(0.001, 0.999, 4000)
    span = kv.knot_span(u)
    full = basis_mod.bspline_basis_ders(kv.ghost_knots, kv.n_ghost, p, u,
                                        span, 2)
    ref = _numpy_ders(kv, u, span, 2)
    assert np.allclose(full, ref, atol=1e-13)
