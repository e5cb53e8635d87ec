"""DoF-sharded residual assembly prototype (parallel/dof_sharding.py,
round-3 VERDICT item #6): slow-direction DoF blocks with p-layer halo
ppermutes.  Exactness against the unsharded assembler on the 8-device
CPU mesh, per-shard memory accounting, and the guard rails."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.parallel.sharding import make_device_mesh
from tigar_tpu.parallel.dof_sharding import DoFShardedAssembler


def _spline(p=2, nel=(6, 26), nf=2):
    kvecs = [uniform_knots(p, 0.0, 1.0, nel[0]),
             uniform_knots(p, 0.0, 1.0, nel[1])]
    cm = ExplicitBSplineControlMesh([p, p], kvecs)
    gen = EqualOrderSpline(nf, cm)
    basis = cm.scalar_basis()
    gen.add_zero_dofs(0, basis.side_dofs(1, 0))
    if nf > 1:
        gen.add_zero_dofs(1, basis.side_dofs(0, 1))
    return ExtractedSpline(gen, quad_degree=2 * p)


def _dens(nf):
    if nf == 1:
        def dens(ctx, u, v):
            return (jnp.sum(ctx.grad(u) * ctx.grad(v))
                    + u.val ** 3 * v.val - v.val)
    else:
        def dens(ctx, u, v):
            return (jnp.sum(ctx.grad(u) * ctx.grad(v))
                    + jnp.sum(u.val ** 2 * v.val)
                    - v.val[0] - 0.5 * v.val[1])
    return dens


@pytest.mark.parametrize("nf", [1, 2])
def test_sharded_residual_matches_unsharded(nf):
    spline = _spline(nf=nf)
    dens = _dens(nf)
    mesh = make_device_mesh(8)
    ds = DoFShardedAssembler(spline, mesh)

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=spline.ndof) * 0.3)
    r_ref = np.asarray(spline.mask
                       * spline._assembler("dx").residual_vector(dens, U))

    u3 = ds.scatter_u(U)
    r3 = ds.residual(dens, u3)
    r = ds.gather_u(r3)
    assert np.allclose(r, r_ref, rtol=1e-12, atol=1e-13), \
        float(np.max(np.abs(r - r_ref)))


def test_sharded_memory_accounting():
    """No device shard of the DoF block array holds more than its
    1/n_shards row slab (+ padding): the distributed-row-storage
    guarantee (reference analog: PETSc MPIAIJ, common.py:1474-1492)."""
    spline = _spline(nf=1)
    mesh = make_device_mesh(8)
    ds = DoFShardedAssembler(spline, mesh)
    u3 = ds.from_function(lambda f, r, c: np.sin(0.3 * r) + 0.0 * f + c)
    r3 = ds.residual(_dens(1), u3)
    itemsize = np.dtype(spline.dtype).itemsize
    blk = ds.nf * ds.R * ds.fast * itemsize
    for arr in (u3, r3):
        sizes = [sh.data.nbytes for sh in arr.addressable_shards]
        assert len(sizes) == 8
        assert all(s == blk for s in sizes), (sizes, blk)
        assert max(sizes) < spline.ndof * itemsize
    # from_function agrees with scatter_u of the same full vector
    rows = np.arange(ds.ncp_slow)
    cols = np.arange(ds.fast)
    F = (np.sin(0.3 * rows)[None, :, None]
         + np.zeros((1, 1, 1))
         + cols[None, None, :])
    U = F.reshape(-1)
    assert np.allclose(ds.gather_u(u3), U)


def test_too_many_shards_raises():
    spline = _spline(nel=(4, 6))   # ncp_slow = 8 < 8 * (p+1)
    mesh = make_device_mesh(8)
    with pytest.raises(ValueError, match="fewer shards"):
        DoFShardedAssembler(spline, mesh)
