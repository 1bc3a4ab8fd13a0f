"""Global configuration for the TPU-native sparse-GP framework.

The reference implementation (biaslab/GaussianProcessNode) runs in Julia
Float64 throughout. For numerical parity we default to float64
(``jax_enable_x64``); a float32 fast path can be selected with
``GPNODE_X64=0`` for benchmarking on MXU-friendly dtypes.

Jitter constants mirror the reference call sites exactly
(see SURVEY.md §5 "Failure detection"):

- ``JITTER_KUU``   : 1e-8  added to Kuu before Cholesky
                     (reference: notebooks, e.g. GPT_regression.ipynb cell 7)
- ``JITTER_PSI2``  : 1e-8  added to expected Ψ2 in uncertain-input rules
                     (reference: GPnode/UniSGPnode.jl:135,187)
- ``JITTER_KUU_SSM``: 1e-12 added to Kuu for the MultiSGP dense inverse
                     (reference: Pendulum_Wishart_2d.ipynb cell 16,
                      helper_functions/derivative_helper.jl:43,93)
- ``VAR_FLOOR``    : 1e-6  variance floor on moment-matched products
                     (reference: GPnode/UniSGPnode.jl:44)
- ``CLAMP_LO/HI``  : clamp bounds on energy terms
                     (reference: GPnode/UniSGPnode.jl:189-190)
"""

import os

import jax

_X64 = os.environ.get("GPNODE_X64", "1") not in ("0", "false", "False")
if _X64:
    jax.config.update("jax_enable_x64", True)

# Default matmul precision = HIGHEST, package-wide. On the TPU MXU the
# default lowers f32 contractions to bfloat16 passes (~1e-3 relative),
# which is invisible on CPU and catastrophic for the f32-first device
# mode: the pendulum --f32 hyperopt ran 3.8x faster than f64 on the chip
# and DIVERGED (θ softplus values ~20-50, NaN smoothing) because the
# M-step objective's M-length contractions carried bf16 error, while the
# same program converged in true-f32 on the host. The hot kin40k paths
# already pin precision per-op; this covers every other contraction.
# HIGHEST f32 = 3-pass bf16 (f32-accurate) — still far from emulated-f64
# cost, so the f32-first mode keeps its speedup.
jax.config.update("jax_default_matmul_precision", "highest")

JITTER_KUU = 1e-8
JITTER_PSI2 = 1e-8
JITTER_KUU_SSM = 1e-12
VAR_FLOOR = 1e-6
CLAMP_LO = 1e-12
CLAMP_HI = 1e12


def default_dtype():
    import jax.numpy as jnp

    return jnp.float64 if _X64 else jnp.float32


def x64_enabled() -> bool:
    return _X64
