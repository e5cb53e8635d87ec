"""tigar_tpu: a TPU-native isogeometric analysis (IGA) framework in JAX.

Re-designed from scratch with the capability surface of tIGAr
(github.com/david-kamensky/tIGAr): B-spline / NURBS / T-spline /
div- and curl-conforming compatible-spline discretizations of PDEs, with
batched Bezier-element quadrature assembly, autodiff-derived residuals and
tangents, matrix-free Krylov solvers, and GSPMD sharding over device meshes
replacing the reference's FEniCS/PETSc/MPI substrate.
"""

from . import config  # noqa: F401  (configures x64 at import)

from .ops.knots import (uniform_knots, KnotVector,  # noqa: F401
                        ij2dof, ijk2dof, dof2ij, dof2ijk)
from .ops.quadrature import gauss_rule, gauss_rule_interval  # noqa: F401
from .models.bspline import (TensorBSplineBasis, ScalarBasis,  # noqa: F401
                             ControlMesh, ExplicitBSplineControlMesh)

__version__ = "0.1.0"
