"""Probe f32 compile times of the shell residual program under program
restructurings (the BENCH_r02 '427 s f32 compile' diagnosis).  Each probe
compiles ONE residual program and reports wall-clock; run one PROBE= at a
time (compiles are minutes through the tunnel)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PROBE_NOCACHE", "0") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from tigar_tpu.ops.knots import uniform_knots
from tigar_tpu.models.bspline import ExplicitBSplineControlMesh
from tigar_tpu.models.space import EqualOrderSpline
from tigar_tpu.models.extracted import ExtractedSpline
from tigar_tpu.models.shell import (precompute_shell_reference,
                                    svk_shell_adjoint)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


nel = int(os.environ.get("BENCH_NEL", "128"))
chunk = os.environ.get("PROBE_CHUNK", "")
chunk = None if chunk == "" else int(chunk)
p = 2
kvecs = [uniform_knots(p, -1.0, 1.0, nel)] * 2
cm = ExplicitBSplineControlMesh([p, p], kvecs, extra_dim=1)
sp = EqualOrderSpline(3, cm)
spline = precompute_shell_reference(
    ExtractedSpline(sp, quad_degree=2 * p, nders=2, assembly_chunk=chunk))
asm64 = spline._assembler("dx")
asm32 = asm64.astype(jnp.float32)
log(f"nel={asm64.nel} chunk={asm64.chunk} ndof={spline.ndof}")

E, nu, h, q = 1.0e7, 0.3, 0.03, 1e-2


def res_adj(ctx, u):
    F = svk_shell_adjoint(ctx, u, E, nu, h)
    return F._replace(val=F.val.at[2].add(-q))


@jax.jit
def step(asm_, U, c):
    r = asm_.residual_vector_adjoint(
        res_adj, U + jnp.asarray(1e-9, U.dtype) * c)
    return (jnp.vdot(r, r) * 1e-30).astype(c.dtype)


rng = np.random.default_rng(0)
U = jnp.asarray(rng.normal(size=spline.ndof) * 1e-4, dtype=jnp.float32)
c = jnp.zeros((), jnp.float32)
t0 = time.time()
v = float(step(asm32, U, c))
log(f"f32 compile+first: {time.time() - t0:.1f}s (v={v:.3e})")
t0 = time.time()
for _ in range(10):
    c = step(asm32, U, c)
float(c)
log(f"f32 run: {(time.time() - t0) / 10 * 1e3:.3f} ms")
