"""Stationary kernels and Gram-matrix construction (L0 layer).

TPU-native replacement for KernelFunctions.jl usage in the reference
(``θ[1] * with_lengthscale(SEKernel(), θ[2:])`` — e.g.
experiments/regression_kin40k.ipynb cell 5, GPtest.jl:21).

Design notes (MXU-first):
- Inputs are always dense ``(N, D)`` float arrays — 1-D problems use
  ``(N, 1)``. No vectors-of-vectors.
- The squared distance is computed as ``|x|² + |z|² − 2 x·z`` so the hot
  term is a single batched matmul that XLA tiles onto the MXU; the
  elementwise exp is fused into the epilogue by XLA (and by the Pallas
  kernel in ops/pallas_gram.py for large shapes).
- Kernel hyperparameters are a flat vector ``θ = [variance, lengthscales…]``
  (already positive — experiment configs apply softplus *before* calling,
  mirroring ``StatsFuns.softplus.(θ)`` in the notebooks).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = [
    "sqdist",
    "se_gram",
    "matern12_gram",
    "matern32_gram",
    "matern52_gram",
    "gram",
    "gram_diag",
    "Kernel",
    "softplus",
    "invsoftplus",
]


def softplus(x):
    """Numerically stable softplus (StatsFuns.softplus)."""
    return jax.nn.softplus(x)


def invsoftplus(x):
    """Inverse softplus (StatsFuns.invsoftplus): log(exp(x) - 1)."""
    x = jnp.asarray(x)
    return x + jnp.log(-jnp.expm1(-x))


def _scale(X: jax.Array, lengthscales: jax.Array) -> jax.Array:
    """Divide each input dimension by its lengthscale (broadcasts scalar ℓ)."""
    return X / lengthscales


def sqdist(X: jax.Array, Z: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distances, MXU-friendly.

    ``d²[i,j] = |x_i|² + |z_j|² − 2 x_i·z_j`` — the cross term is one GEMM.
    Clamped at 0 to kill negative round-off.
    """
    xx = jnp.sum(X * X, axis=-1)[:, None]
    zz = jnp.sum(Z * Z, axis=-1)[None, :]
    # full-precision cross term: TPU f32 dots default to bfloat16 passes
    # (ε≈8e-3) — enough noise in d² to visibly slow hyperparameter learning
    cross = jnp.matmul(X, Z.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(xx + zz - 2.0 * cross, 0.0)


def se_gram(X, Z, variance, lengthscales):
    """Squared-exponential (RBF) Gram matrix σ²·exp(−d²/2ℓ²)."""
    d2 = sqdist(_scale(X, lengthscales), _scale(Z, lengthscales))
    return variance * jnp.exp(-0.5 * d2)


def matern12_gram(X, Z, variance, lengthscales):
    d = jnp.sqrt(sqdist(_scale(X, lengthscales), _scale(Z, lengthscales)) + 1e-36)
    return variance * jnp.exp(-d)


def matern32_gram(X, Z, variance, lengthscales):
    d = jnp.sqrt(sqdist(_scale(X, lengthscales), _scale(Z, lengthscales)) + 1e-36)
    s = jnp.sqrt(3.0) * d
    return variance * (1.0 + s) * jnp.exp(-s)


def matern52_gram(X, Z, variance, lengthscales):
    d = jnp.sqrt(sqdist(_scale(X, lengthscales), _scale(Z, lengthscales)) + 1e-36)
    s = jnp.sqrt(5.0) * d
    return variance * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


_GRAMS = {
    "se": se_gram,
    "matern12": matern12_gram,
    "matern32": matern32_gram,
    "matern52": matern52_gram,
}


def gram(kind: str, X, Z, variance, lengthscales):
    return _GRAMS[kind](X, Z, variance, lengthscales)


def gram_diag(kind: str, X, variance):
    """Diagonal of K(X,X). All supported kernels are stationary: k(x,x)=σ²."""
    del kind
    return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * variance


@dataclass(frozen=True)
class Kernel:
    """A kernel family with a θ-parameterization.

    ``theta`` layout: ``[variance, ℓ…]`` where ℓ is either a single shared
    lengthscale or one per input dimension (ARD — the kin40k/banana configs).
    ``transform='softplus'`` applies softplus to θ first, mirroring
    ``softplus(θ[1]) * with_lengthscale(SE, softplus.(θ[2:]))``
    (reference: regression_kin40k.ipynb cell 5). ``'identity'`` matches the
    raw parameterization used in GPtest.jl:21.

    ``use_pallas=True`` routes SE Grams through the fused Pallas TPU kernel
    (ops/pallas_gram.py) on TPU/f32, with automatic jnp fallback elsewhere.
    """

    kind: str = "se"
    transform: str = "identity"
    use_pallas: bool = False

    def params(self, theta: jax.Array):
        theta = jnp.asarray(theta)
        if self.transform == "softplus":
            theta = softplus(theta)
        return theta[0], theta[1:]

    def __call__(self, theta, X, Z) -> jax.Array:
        var, ls = self.params(theta)
        X2, Z2 = jnp.atleast_2d(X), jnp.atleast_2d(Z)
        if self.use_pallas and self.kind == "se":
            # differentiable wrapper: Pallas forward + analytic matmul VJP
            # (pallas_call itself has no autodiff rule)
            from .pallas_gram import se_gram_fused

            return se_gram_fused(X2, Z2, var, ls)
        return gram(self.kind, X2, Z2, var, ls)

    def diag(self, theta, X) -> jax.Array:
        var, _ = self.params(theta)
        return gram_diag(self.kind, jnp.atleast_2d(X), var)

    def kxx(self, theta, x) -> jax.Array:
        """Scalar k(x,x) for a single input point."""
        var, _ = self.params(theta)
        return jnp.asarray(var)

    def kuu(self, theta, Xu, jitter: float = 0.0) -> jax.Array:
        K = self(theta, Xu, Xu)
        if jitter:
            K = K + jitter * jnp.eye(K.shape[0], dtype=K.dtype)
        return K


