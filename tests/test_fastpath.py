"""f32 fast-path element apply (ops/fastpath.py) agrees with the f64 AD
tangent action (the verification reference)."""

import numpy as np
import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.ops.fastpath import make_laplace_operator


def test_fastpath_matches_ad_tangent():
    p = 2
    cm = ExplicitBSplineControlMesh([p, p],
                                    [uniform_knots(p, 0.0, 1.0, 6)] * 2)
    sp = EqualOrderSpline(1, cm)
    b = cm.scalar_basis()
    for d in (0, 1):
        for s in (0, 1):
            sp.add_zero_dofs(0, b.side_dofs(d, s))
    spline = ExtractedSpline(sp, quad_degree=2 * p)
    asm = spline._assembler("dx")

    def a_form(ctx, u, v):
        return jnp.dot(ctx.grad(u), ctx.grad(v))

    W = jnp.asarray(np.random.default_rng(0).normal(size=spline.ndof))
    ref = spline.tangent_action(a_form, jnp.zeros(spline.ndof), W)
    op = make_laplace_operator(asm, spline.mask)
    out = op(W)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-6 * scale  # f32 path
