"""gaussianprocessnode_tpu — a TPU-native variational sparse-GP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
biaslab/GaussianProcessNode (the "factor graph approach to Variational
Sparse Gaussian Processes" research codebase): UniSGP / MultiSGP factor
nodes, variational message-passing inference, free-energy evaluation, and
hyperparameter learning — built MXU-first (batched Gram matrices, fused
quadrature, natural-parameter accumulation) rather than translated.

Layer map (see SURVEY.md):
    ops.linalg / ops.kernels      L0  dense linear algebra, Gram matrices
    dists                         L1  exponential-family distributions
    ops.quadrature                L2  GH / spherical-radial / UT / GenUT
    nodes.unisgp / nodes.multisgp L3  message rules + average energies
    objectives                    L4  hyperparameter losses (jax.grad)
    infer.*                       L5  VMP inference programs
    experiments/ (repo root)      L6  workload scripts
"""

from . import config as config  # noqa: F401  (side effect: enables x64)
from .dists import (  # noqa: F401
    Gaussian,
    GammaShapeRate,
    MvGaussian,
    MvGaussianNat,
    PointMass,
    Wishart,
    WishartFast,
)
from .ops.kernels import Kernel, invsoftplus, softplus  # noqa: F401
from .ops.quadrature import GaussHermite, GenUT, SphericalRadial, Unscented  # noqa: F401

__version__ = "0.1.0"
