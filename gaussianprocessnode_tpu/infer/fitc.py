"""FITC / SoR / DTC sparse-GP marginal-likelihood baselines.

TPU-native equivalent of the reference's legacy baseline notebook
``.ipynb_checkpoints/Regression_FITC_SoR-checkpoint.ipynb`` (GaussianProcesses.jl
``SoR`` / ``FITC`` trained by ConjugateGradient/LBFGS on the negative log
marginal likelihood): toy regression from the same saved draw (recorded SoR
SMSE 0.008066, FITC 0.008064 — cell 7) and kin40k from the same saved
``Xu_kin40k.jld`` (recorded SoR mll −2414.13 — cell 13). These classic
approximations complete the baseline family around the repo's SVGP/Titsias
trainers (infer/svgp.py): SoR/DTC and FITC are *likelihood* approximations
(Quiñonero-Candela & Rasmussen 2005), while VSGP bounds the exact model.

All three share one O(N·M²) Woodbury evaluation — a single MXU Gram
K(Xu, X) plus an M×M SYRK and Cholesky, jitted end-to-end:

    Σ = Q_ff + D,  Q_ff = Kfuᵀ Kuu⁻¹ Kfu = Vᵀ V,  V = Lu⁻¹ K_uf
    D_SoR = D_DTC = σ² I                (degenerate-prior likelihood)
    D_FITC = σ² I + diag(K_ff − Q_ff)   (exact per-point variances)

    −log p(y) = ½ [N log 2π + log|B| + Σᵢ log Dᵢ + βᵀβ − cᵀc],
    W = V D^{−1/2},  B = I + W Wᵀ,  β = D^{−1/2} y,  c = L_B⁻¹ W β.

The methods differ again at prediction (Λ = Kuu + K_uf D⁻¹ K_fu):
mean* = K*u Λ⁻¹ K_uf D⁻¹ y for all three; SoR's predictive variance is the
degenerate K*u Λ⁻¹ K u* (the well-known variance collapse far from Xu),
DTC/FITC restore the exact prior marginal k** − q** + K*u Λ⁻¹ K u*.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import JITTER_KUU
from ..ops.linalg import chol_lower, tri_solve_lower

__all__ = [
    "SparseGPParams",
    "init_sparse_gp",
    "sparse_nlml",
    "fit_sparse_gp",
    "sparse_predict",
]

_METHODS = ("sor", "dtc", "fitc")


class SparseGPParams(NamedTuple):
    theta: jax.Array  # kernel hyperparameters (softplus-transformed in kernel)
    log_noise: jax.Array  # log observation variance σ²


def init_sparse_gp(theta0, noise: float = 1.0):
    """The notebook's inits are ℓ=σf=1, σ_noise=1 (SE(0,0), logNoise=log 1)."""
    return SparseGPParams(
        theta=theta0,
        log_noise=jnp.asarray(jnp.log(noise), theta0.dtype),
    )


def _whitened_stats(kernel, params: SparseGPParams, Xu, X, method: str,
                    jitter: float):
    """Shared per-evaluation statistics: (Lu, V, D, W, B-chol)."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    Kuu = kernel.kuu(params.theta, Xu, jitter=jitter)
    Lu = chol_lower(Kuu)
    Kux = kernel(params.theta, Xu, X)  # (M, N)
    V = tri_solve_lower(Lu, Kux)  # (M, N)
    noise = jnp.exp(params.log_noise)
    if method == "fitc":
        kxx = kernel.diag(params.theta, X)
        qxx = jnp.sum(V * V, axis=0)
        # k − q ≥ 0 exactly (Schur complement); clamp the rounding tail
        D = noise + jnp.maximum(kxx - qxx, 0.0)
    else:
        D = jnp.full(X.shape[0], noise, dtype=V.dtype)
    W = V / jnp.sqrt(D)[None, :]
    M = Xu.shape[0]
    B = jnp.eye(M, dtype=V.dtype) + W @ W.T
    return Lu, V, D, W, chol_lower(B)


def sparse_nlml(kernel, params: SparseGPParams, Xu, X, y,
                method: str = "fitc", jitter: float = JITTER_KUU):
    """Negative log marginal likelihood of y ~ N(0, VᵀV + D).

    SoR and DTC share this value exactly (they differ only in the test-time
    variance), so ``method="sor"`` and ``"dtc"`` are the same training
    criterion — matching GaussianProcesses.jl, whose SoR/DTC mll coincide.
    """
    N = X.shape[0]
    _, _, D, W, LB = _whitened_stats(kernel, params, Xu, X, method, jitter)
    beta = y / jnp.sqrt(D)
    c = tri_solve_lower(LB, W @ beta)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB))) + jnp.sum(jnp.log(D))
    quad = beta @ beta - c @ c
    return 0.5 * (N * jnp.log(2.0 * jnp.pi) + logdet + quad)


@partial(jax.jit, static_argnames=("kernel", "method", "jitter"))
def sparse_predict(kernel, params: SparseGPParams, Xu, X_test, X, y,
                   method: str = "fitc", jitter: float = JITTER_KUU):
    """Predictive (mean, var) of f* at X_test. Λ⁻¹ = Lu⁻ᵀ B⁻¹ Lu⁻¹ since
    Λ = Kuu + K_uf D⁻¹ K_fu = Lu B Luᵀ — so everything stays in whitened
    coordinates and no M×M inverse is formed."""
    Lu, _, D, W, LB = _whitened_stats(kernel, params, Xu, X, method, jitter)
    beta = y / jnp.sqrt(D)
    c = tri_solve_lower(LB, W @ beta)  # (M,)
    Kut = kernel(params.theta, Xu, X_test)  # (M, Nt)
    At = tri_solve_lower(Lu, Kut)  # Lu⁻¹ K u*
    P = tri_solve_lower(LB, At)  # L_B⁻¹ Lu⁻¹ K u*
    mean = P.T @ c
    var_deg = jnp.sum(P * P, axis=0)  # K*u Λ⁻¹ K u*
    if method == "sor":
        return mean, var_deg
    ktt = kernel.diag(params.theta, X_test)
    qtt = jnp.sum(At * At, axis=0)
    return mean, jnp.maximum(ktt - qtt, 0.0) + var_deg


@partial(jax.jit, static_argnames=(
    "kernel", "method", "steps", "learning_rate", "learn_noise", "jitter"))
def fit_sparse_gp(
    kernel,
    params0: SparseGPParams,
    Xu,
    X,  # (N, D) FULL batch — one NLML evaluation is a handful of MXU GEMMs
    y,
    method: str = "fitc",
    steps: int = 300,
    learning_rate: float = 0.05,
    learn_noise: bool = True,
    jitter: float = JITTER_KUU,
):
    """AdaMax on the NLML, one jitted scan (the notebook's CG/LBFGS with a
    wall-clock limit becomes a fixed-step first-order schedule — same
    full-batch objective, fused on-device like fit_svgp_collapsed).
    Returns (params, nlml trace)."""
    optimizer = optax.chain(optax.zero_nans(), optax.adamax(learning_rate))

    def loss(p):
        if not learn_noise:
            p = p._replace(log_noise=jax.lax.stop_gradient(p.log_noise))
        return sparse_nlml(kernel, p, Xu, X, y, method=method, jitter=jitter)

    vg = jax.value_and_grad(loss)

    def step(carry, _):
        p, os_ = carry
        v, g = vg(p)
        upd, os_ = optimizer.update(g, os_, p)
        return (optax.apply_updates(p, upd), os_), v

    (params, _), trace = jax.lax.scan(
        step, (params0, optimizer.init(params0)), None, length=steps
    )
    return params, trace
