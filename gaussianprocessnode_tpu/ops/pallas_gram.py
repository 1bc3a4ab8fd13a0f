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
_BN = 512  # cols per tile (X) — 256×512 measured fastest at the kin40k
#            Gram shapes (600×10000: 0.68 ms vs 0.70 ms for XLA's fusion)

# tests flip this to run the kernel through the Pallas interpreter on CPU so
# the suite exercises the real pallas_call path (incl. the vma declaration
# below, whose breakage is otherwise only visible on hardware under shard_map)
_INTERPRET = False


def _gram_kernel(z_ref, x_ref, zz_ref, xx_ref, var_ref, o_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    # full f32 MXU passes: the default bf16 multipass (ε≈8e-3) is enough
    # noise in d² to visibly degrade hyperparameter learning (measured
    # SMSE 0.080 → 0.091 on kin40k when trained through the bf16 version)
    cross = jax.lax.dot_general(
        z_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
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
    # inside a shard_map (the data-parallel trainers) pallas_call demands an
    # explicit varying-manual-axes declaration on the out_shape — even an
    # EMPTY one for fully-replicated Grams like Kuu (check_vma rejects
    # vma=None outright). The output varies over the union of the inputs'
    # axes (e.g. the 'dp' axis of the sharded X slab); an explicit empty set
    # is also accepted outside shard_map, so declare it unconditionally.
    # Operands are pvary'd up to that union so the kernel body sees
    # vma-consistent avals (free on hardware; required by the interpreter).
    args = (Zp, Xp, zz, xx, var)
    try:
        vma = frozenset().union(*(jax.typeof(a).vma for a in args))
        args = tuple(
            jax.lax.pvary(a, tuple(vma - jax.typeof(a).vma)) for a in args
        )
        out_shape = jax.ShapeDtypeStruct((Mp, Np), jnp.float32, vma=vma)
    except (AttributeError, TypeError):  # older jax without aval/kwarg vma
        out_shape = jax.ShapeDtypeStruct((Mp, Np), jnp.float32)
    Zp, Xp, zz, xx, var = args
    return pl.pallas_call(
        _gram_kernel,
        out_shape=out_shape,
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
        interpret=_INTERPRET,
    )(Zp, Xp, zz, xx, var)


def se_gram_auto(Z, X, variance, lengthscales):
    """Pallas SE Gram on TPU/f32 (or interpreted, for tests); jnp fallback
    elsewhere."""
    on_tpu = jax.default_backend() == "tpu" or _INTERPRET
    if on_tpu and Z.dtype == jnp.float32 and X.dtype == jnp.float32:
        return se_gram_pallas(Z, X, variance, lengthscales)
    return _k.se_gram(Z, X, variance, lengthscales)


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward + analytic VJP
# ---------------------------------------------------------------------------
#
# pallas_call has no autodiff rule, so routing the Pallas Gram into the
# hyperparameter objectives (which jax.grad w.r.t. θ) needs a custom VJP.
# For K = σ²·exp(−½ Σ_k (z_k−x_k)²/ℓ_k²) the cotangents collapse to GEMMs
# on W = Ḡ ⊙ K — cheaper than autodiff through the jnp sqdist graph, and
# pure MXU work:
#
#   σ̄²   = ⟨Ḡ, K⟩/σ²
#   ℓ̄_k  = (1/ℓ_k³)·[⟨r, z_k²⟩ + ⟨c, x_k²⟩ − 2 z_kᵀ W x_k]   (r/c = row/col sums of W)
#   Z̄_mk = −(z_mk r_m − (W X)_mk)/ℓ_k²,   X̄ symmetric.


@jax.custom_vjp
def se_gram_fused(Z, X, variance, lengthscales):
    """Differentiable SE Gram: Pallas kernel forward (TPU/f32, jnp fallback),
    analytic matmul-only VJP. Drop-in for ops.kernels.se_gram."""
    return se_gram_auto(Z, X, variance, lengthscales)


def _se_gram_fwd(Z, X, variance, lengthscales):
    K = se_gram_auto(Z, X, variance, lengthscales)
    return K, (Z, X, variance, lengthscales, K)


def _se_gram_bwd(res, G):
    Z, X, variance, lengthscales, K = res
    hi = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    ls = jnp.broadcast_to(jnp.asarray(lengthscales, Z.dtype), (Z.shape[1],))
    W = G * K  # (M, N)
    r = jnp.sum(W, axis=1)  # (M,)
    c = jnp.sum(W, axis=0)  # (N,)
    var_bar = jnp.sum(W) / variance
    WX = hi(W, X)  # (M, D)
    WtZ = hi(W.T, Z)  # (N, D)
    # ℓ̄_k = [Σ_m r_m z²_mk + Σ_n c_n x²_nk − 2 Σ_mn W_mn z_mk x_nk] / ℓ_k³
    cross = jnp.sum(Z * WX, axis=0)  # Σ_mn W_mn z_mk x_nk per k
    ls_bar = (r @ (Z * Z) + c @ (X * X) - 2.0 * cross) / ls**3
    Z_bar = -(Z * r[:, None] - WX) / ls**2
    X_bar = -(X * c[:, None] - WtZ) / ls**2
    if jnp.ndim(lengthscales) == 0:
        ls_bar = jnp.sum(ls_bar)
    var_bar = jnp.reshape(var_bar, jnp.shape(variance))
    return Z_bar, X_bar, var_bar, ls_bar


se_gram_fused.defvjp(_se_gram_fwd, _se_gram_bwd)
