"""Pallas TPU kernel: fused squared-exponential Gram matrix.

The hot op of every sweep is K(Z, X) = σ²·exp(−½‖z/ℓ − x/ℓ‖²) (SURVEY.md §7,
"Gram+Chol TFLOP/s" north star). XLA already fuses the sqdist matmul with the
exp epilogue reasonably well; the Pallas version packs scale + cross-term MXU
matmul + row/col norms + exp into ONE kernel launch — which matters on this
backend where per-op dispatch costs ~4 µs — and is the template for deeper
fusions (Gram-then-SYRK).

float32 only (Mosaic on this backend downcasts f64 refs); callers keep the
f64 path via ops.kernels. Falls back to the jnp implementation on
non-TPU platforms or unsupported dtypes.
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import kernels as _k

__all__ = ["se_gram_pallas", "se_gram_auto"]

_BM = 256  # rows per tile (Z)
_BN = 256  # cols per tile (X)


def _gram_kernel(z_ref, x_ref, zz_ref, xx_ref, var_ref, o_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    cross = jax.lax.dot_general(
        z_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BM, BN) = Z Xᵀ
    d2 = zz_ref[:] + xx_ref[:] - 2.0 * cross
    o_ref[:] = var_ref[0, 0] * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def _pad(a, m, axis):
    pad = (-a.shape[axis]) % m
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    # pad coordinates far away: exp(−huge) underflows to exactly 0
    return jnp.pad(a, widths, constant_values=1e3)


@partial(jax.jit, static_argnames=())
def se_gram_pallas(Z, X, variance, lengthscales):
    """σ²·exp(−½ d²(Z/ℓ, X/ℓ)) as a single Pallas kernel. Z (M,D), X (N,D)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N = Z.shape[0], X.shape[0]
    Zs = (Z / lengthscales).astype(jnp.float32)
    Xs = (X / lengthscales).astype(jnp.float32)
    Zp = _pad(Zs, _BM, 0)
    Xp = _pad(Xs, _BN, 0)
    Mp, Np = Zp.shape[0], Xp.shape[0]
    zz = jnp.sum(Zp * Zp, axis=1)[:, None]  # (Mp, 1)
    xx = jnp.sum(Xp * Xp, axis=1)[None, :]  # (1, Np)
    var = jnp.asarray(variance, jnp.float32).reshape(1, 1)

    grid = (Mp // _BM, Np // _BN)
    # Mosaic requires i32 grid indices; with global x64 the index maps trace
    # to i64 and legalization fails — scope x64 off around the call
    with jax.enable_x64(False):
        out = _call_gram(grid, Zp, Xp, zz, xx, var)
    return out[:M, :N]


def _call_gram(grid, Zp, Xp, zz, xx, var):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mp, Np = Zp.shape[0], Xp.shape[0]
    return pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_BM, Zp.shape[1]), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BN, Xp.shape[1]), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_BM, _BN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
    )(Zp, Xp, zz, xx, var)


def se_gram_auto(Z, X, variance, lengthscales):
    """Pallas SE Gram on TPU/f32; jnp fallback elsewhere."""
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and Z.dtype == jnp.float32 and X.dtype == jnp.float32:
        return se_gram_pallas(Z, X, variance, lengthscales)
    return _k.se_gram(Z, X, variance, lengthscales)
