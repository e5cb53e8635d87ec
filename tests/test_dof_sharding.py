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


# -- full sharded Newton step (round-4 VERDICT item #5) --------------------------


def _unsharded_step(spline, adjoint, U, cg_iters):
    """Reference Newton step with the SAME algorithm (Jacobi-PCG, fixed
    iterations) on the replicated assembler."""
    asm = spline._assembler("dx")
    mask = spline.mask
    r = mask * asm.residual_vector_adjoint(adjoint, U)
    E = asm.element_matrices_adjoint(adjoint, U)
    cat = asm.cat_conn

    def apply_(x):
        xe = (mask * x)[cat]
        ye = jnp.einsum("eab,eb->ea", E, xe)
        y = jnp.zeros_like(x).at[cat].add(ye)
        return mask * y + (1.0 - mask) * x

    d = jnp.zeros_like(U).at[cat].add(
        jnp.diagonal(E, axis1=1, axis2=2))
    d = mask * d + (1.0 - mask)
    dinv = jnp.where(d != 0.0, 1.0 / d, 1.0)

    x = jnp.zeros_like(r)
    rr = r
    z = dinv * rr
    p = z
    rz = jnp.vdot(rr, z)
    for _ in range(cg_iters):
        Ap = apply_(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = dinv * rr
        rz_new = jnp.vdot(rr, z)
        p = z + (rz_new / rz) * p
        rz = rz_new
    return U - x, float(jnp.linalg.norm(r))


def test_sharded_newton_step_matches_unsharded():
    """The FULL sharded Newton step (sharded residual + sharded element
    tangents + sharded Jacobi-PCG) reproduces the replicated step run
    with the identical algorithm, to f64 roundoff (summation order
    differs across shards)."""
    from tigar_tpu.forms import adjoint_of
    from tigar_tpu.parallel.dof_sharding import DoFShardedNewton

    nf = 2
    spline = _spline(nf=nf)
    adjoint = adjoint_of(_dens(nf))
    mesh = make_device_mesh(8)
    ds = DoFShardedAssembler(spline, mesh)
    newton = DoFShardedNewton(ds, adjoint, cg_iters=30)

    rng = np.random.default_rng(1)
    U = jnp.asarray(spline.mask * rng.normal(size=spline.ndof) * 0.2)
    u3 = ds.scatter_u(U)

    # tangent apply exactness
    E = newton.element_tangent(u3)
    x = jnp.asarray(rng.normal(size=spline.ndof))
    y3 = newton.tangent_apply(E, ds.scatter_u(x))
    asm = spline._assembler("dx")
    Ef = asm.element_matrices_adjoint(adjoint, U)
    mask = spline.mask
    xe = (mask * x)[asm.cat_conn]
    y_ref = jnp.zeros_like(x).at[asm.cat_conn].add(
        jnp.einsum("eab,eb->ea", Ef, xe))
    y_ref = mask * y_ref + (1.0 - mask) * x
    assert np.allclose(ds.gather_u(y3), np.asarray(y_ref),
                       rtol=1e-11, atol=1e-12)

    # full step exactness
    u3_new, rnorm = newton.step(u3)
    U_ref, rnorm_ref = _unsharded_step(spline, adjoint, U, 30)
    assert np.isclose(float(rnorm), rnorm_ref, rtol=1e-12)
    got = ds.gather_u(u3_new)
    ref = np.asarray(U_ref)
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-30)
    assert err < 1e-9, err


def test_sharded_newton_step_memory():
    """No full-length vector in the STEP: every sharded intermediate
    (state, residual via step's return, Krylov result) keeps the
    1/n-slab-per-shard layout, and the element-tangent batch is sharded
    over its element axis."""
    from tigar_tpu.forms import adjoint_of
    from tigar_tpu.parallel.dof_sharding import DoFShardedNewton

    spline = _spline(nf=1)
    adjoint = adjoint_of(_dens(1))
    mesh = make_device_mesh(8)
    ds = DoFShardedAssembler(spline, mesh)
    newton = DoFShardedNewton(ds, adjoint, cg_iters=10)

    u3 = ds.from_function(lambda f, r, c: 0.05 * np.sin(0.5 * r + c))
    E = newton.element_tangent(u3)
    nel_total = ds.n_shards * ds.nel_local
    per_shard_el = [sh.data.shape[0] for sh in E.addressable_shards]
    assert len(per_shard_el) == 8
    assert all(s == ds.nel_local for s in per_shard_el), per_shard_el
    assert max(per_shard_el) < nel_total

    u3_new, rnorm = newton.step(u3)
    assert np.isfinite(float(rnorm))
    itemsize = np.dtype(spline.dtype).itemsize
    blk = ds.nf * ds.R * ds.fast * itemsize
    sizes = [sh.data.nbytes for sh in u3_new.addressable_shards]
    assert all(s == blk for s in sizes), (sizes, blk)
    assert max(sizes) < spline.ndof * itemsize

    # the step moves the state toward equilibrium (residual decreases)
    _, r1 = newton.step(u3_new)
    assert float(r1) < float(rnorm)
