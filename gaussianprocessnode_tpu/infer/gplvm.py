"""GPLVM inference: latent-input VMP through the MultiSGP node.

Reference workload: GPLVM.ipynb (SURVEY.md §3.4). Model:

    v ~ MvNWMP(0, I_D ⊗ Kuu(θ))        (whitened prior: precision = Kuu)
    x_i ~ MvN(x̄_i^PCA, 100·I_2)
    y_i ~ MultiSGP(x_i, v, W=1e2·I_D, θ)    W PointMass, D=12 outputs

Mean-field q(x)q(v). Per VMP iteration:
  1. every q(x_i): Laplace in-message (MultiSGPnode.jl:210-236 — L-BFGS on
     −log ν, Hessian precision) × the MvN prior — a closed-form Gaussian
     product, vmapped over the N latents;
  2. q(v): natural sum of v-messages with expected Ψ's under the fresh q(x).

FE (the NelderMead objective in the reference) = Σ node energies +
prior energies − entropies.
"""

from functools import partial
from typing import NamedTuple

import math

import jax
import jax.numpy as jnp

from ..config import JITTER_KUU_SSM
from ..dists import (MvGaussian, MvGaussianNat, mv_gaussian_entropy,
                     mv_nat_to_meancov)
from ..nodes.multisgp import MultiSGPArgs, _split_blocks, average_energy
from ..ops import psi as psiops
from ..ops import quadrature as quad
from ..ops.linalg import chol_lower, chol_solve, cholinv, logdet_from_chol, sym
from .batch_vmp import prior_energy_mvn

_LOG2PI = math.log(2.0 * math.pi)  # pure-host constant: a jnp op here
#          would initialize the device backend at IMPORT time (slow and
#          fragile through the device tunnel)


class GPLVMState(NamedTuple):
    x_means: jax.Array  # (N, Din)
    x_covs: jax.Array  # (N, Din, Din)
    xi_v: jax.Array
    prec_v: jax.Array


def _qv_stats(xi, prec):
    """(ξ, Λ) → (μ, Σ) via dists.mv_nat_to_meancov — factored in f64
    regardless of the state dtype (κ(Λ_v) ≈ 1e10 for the converged GPLVM
    q(v), DEVIATIONS #30), moments cast back. No-op for f64 states."""
    dt = xi.dtype
    q = mv_nat_to_meancov(MvGaussianNat(
        xi.astype(jnp.float64), prec.astype(jnp.float64)))
    return q.mean.astype(dt), q.cov.astype(dt)


def _qv_stats_kron(xi, prec, M, D):
    """q(v) moments through the GPLVM family's EXACT Kronecker structure.

    In this model (C = I coregionalization, W = w·I PointMass — GPLVM.ipynb
    cell 12) every producer of the held precision (:func:`gplvm_vmp`,
    :func:`gplvm_init_state`) builds Λ_v = I_D⊗Kuu + (w·I_D)⊗ΣΨ2 =
    I_D ⊗ B with B = Kuu + w·ΣΨ2, so the (M·D)³ factorization collapses to
    ONE M×M Cholesky: μ_d = B⁻¹ξ_d per output block, Σ_v = I_D ⊗ B⁻¹,
    logdet Λ_v = D·logdet B. Besides the D³ FLOP cut (the 360×360
    Choleskys dominated the on-device M-step, DEVIATIONS #30), the small
    factorization is the numerically stronger route under the TPU
    backend's emulated f64. Returns ``(mu_v, Binv, Lb)`` with ``Lb`` the
    f64 Cholesky factor of B (consumers take logdets from it — the FE term
    most precision-sensitive, so it stays f64; μ/B⁻¹ are cast back to the
    state dtype). The factorization always runs in f64: κ(B) ≈ 1e10 at
    convergence, far beyond f32, and at M×M it costs nothing — the
    f32-first device mode keeps every BULK op (Ψ-statistics, Laplace
    updates, node energies) in native f32. Requires a kron-structured
    precision — states hand-built with a non-spherical W are outside this
    model family (tests/test_e2e.py pins the structure)."""
    dt = xi.dtype
    B = sym(prec[:M, :M]).astype(jnp.float64)
    Lb = chol_lower(B)
    Binv = sym(chol_solve(Lb, jnp.eye(M, dtype=jnp.float64)))
    mu = chol_solve(Lb, xi.astype(jnp.float64).reshape(D, M).T).T.reshape(-1)
    return mu.astype(dt), Binv.astype(dt), Lb



def _kuu_ssm(kernel, theta, Xu):
    """Kuu at the SSM jitter, dtype-aware: the reference's 1e-12 is
    invisible at f32 resolution, so the f32-first mode jitters at
    300·ε_f32 ≈ 3.6e-5 (ops/linalg.effective_jitter) — without it the f32
    Gram's entrywise noise leaves Kuu numerically indefinite, Kuu⁻¹ turns
    to garbage, every Laplace Hessian fails the PSD guard, and the latents
    freeze at their priors (measured). The f64 path is unchanged."""
    from ..ops.linalg import effective_jitter

    dt = jnp.result_type(theta, Xu)
    jit = (JITTER_KUU_SSM if dt == jnp.float64
           else effective_jitter(dt, JITTER_KUU_SSM))
    return kernel.kuu(theta, Xu, jitter=jit)


def make_x_update(kernel, theta, Xu, Kuu_inv, xi_v, prec_v, W, x_prior_prec,
                  laplace_steps):
    """The GPLVM latent update at FROZEN v-statistics — the one shared
    x-update map of :func:`gplvm_vmp` (per-sweep, fresh q(v)) and
    :func:`gplvm_embed` (trained q(v)): Laplace in-message through the
    MultiSGP node (L-BFGS minimizer + Hessian precision,
    MultiSGPnode.jl:210-236) × the per-point MvN prior, as natural params.

    Returns ``update_x(y_i, m_init, xi_p) -> (mean, cov)`` (vmappable);
    ``m_init`` seeds the L-BFGS (the objective is multimodal — GPLVM latent
    symmetries — so the start selects the mode), ``xi_p`` is the prior's
    natural mean.

    The WHOLE Laplace path runs in f64 regardless of the model dtype (a
    no-op for f64 states): the in-message curvature A_in is a large-scale
    cancellation of tr(W)·Kuu⁻¹ against ΣRv·W in which Kuu⁻¹ at the
    reference's 1e-12 jitter is itself beyond f32 (measured: under f32 the
    modes flip point-by-point and the latent embedding degrades from 0.875
    to 0.67 1-NN accuracy). Every op here is M×Din-tiny, so pinning it to
    f64 costs the f32-first device mode almost nothing — the bulk work
    (batched Ψ-statistics, node energies) stays f32."""
    f64 = jnp.float64
    dt = x_prior_prec.dtype  # model dtype (xi_v/prec_v are always f64)
    M = Xu.shape[0]
    D = W.shape[0]
    theta64, Xu64 = theta.astype(f64), Xu.astype(f64)
    W64 = W.astype(f64)
    tr_W = jnp.trace(W64)
    # Kuu⁻¹ from the f64-evaluated Gram at the reference jitter — the f32
    # Gram + dtype-scaled jitter (_kuu_ssm) is fine for the Ψ-statistics
    # trace terms but NOT for this cancellation; cheap at M×M
    Kuu_inv64 = cholinv(_kuu_ssm(kernel, theta, Xu).astype(f64))
    # kron-structured q(v) (Λ_v = I_D ⊗ B, _qv_stats_kron): the Σ_v part of
    # Σᵢⱼ Wᵢⱼ·Rv[i,j] is block-diagonal, so sumRv_W = tr(W)·B⁻¹ + Σᵢⱼ Wᵢⱼ μᵢμⱼᵀ
    mu_v, Binv, _ = _qv_stats_kron(xi_v.astype(f64), prec_v.astype(f64), M, D)
    mu_blocks = _split_blocks(mu_v, M, D)
    sumRv_W = tr_W * Binv + jnp.einsum(
        "ij,im,jn->mn", W64, mu_blocks, mu_blocks)
    A_in = 0.5 * tr_W * Kuu_inv64 - 0.5 * sumRv_W
    x_prior_prec64 = x_prior_prec.astype(f64)

    def update_x(y_i, m_init, xi_p):
        sumdiagV = (W64 @ y_i.astype(f64)) @ mu_blocks  # (M,)

        def neg_log(x):
            k = psiops.psi1_exact(kernel, theta64, Xu64, x)
            psi0 = kernel.kxx(theta64, x)
            return -(-0.5 * tr_W * psi0 + k @ A_in @ k + sumdiagV @ k)

        from .training import lbfgs_solve

        m_z, _ = lbfgs_solve(neg_log, m_init.astype(f64),
                             max_steps=laplace_steps)
        W_z = laplace_precision_guard(jax.hessian(neg_log)(m_z))
        # product with the prior (natural params)
        prec = x_prior_prec64 + W_z
        cov = cholinv(sym(prec))
        mean = cov @ (xi_p.astype(f64) + W_z @ m_z)
        return mean.astype(dt), sym(cov).astype(dt)

    return update_x


def laplace_precision_guard(W_z: jax.Array) -> jax.Array:
    """Branchless PSD guard for a Laplace-message precision: returns the
    symmetrized Hessian if it is PD and finite, else zeros (a flat message —
    the marginal falls back to its prior side, mirroring the reference's
    NaN fallback semantics). A positive DIAGONAL does not imply PSD (e.g.
    [[1,2],[2,1]]); the smallest eigenvalue is checked (Din is tiny, eigh
    is cheap) because a later cholinv of an indefinite precision silently
    returns NaN and poisons the whole GPLVM state."""
    W_sym = 0.5 * (W_z + W_z.T)
    ok = (jnp.min(jnp.linalg.eigvalsh(W_sym)) > 0) & jnp.all(jnp.isfinite(W_z))
    return jnp.where(ok, W_sym, jnp.zeros_like(W_z))


def gplvm_free_energy(
    kernel,
    theta,
    Xu,
    Y,
    state: "GPLVMState",
    x_prior_means,
    x_prior_cov_scale: float = 100.0,
    W_val: float = 100.0,
):
    """Bethe free energy FE(θ; q) at a FROZEN variational state — the
    gradient-hyperopt M-step objective (differentiable in θ through the
    cubature Ψ-statistics AND the θ-dependent whitened v-prior I_D ⊗ Kuu(θ)).

    Freezing q makes the alternation a generalized EM: the E-step
    (:func:`gplvm_vmp` sweeps) decreases FE over q at fixed θ, this
    objective's gradient steps decrease it over θ at fixed q — the same
    FE the reference minimizes derivative-free by NelderMead
    (GPLVM.ipynb cells 16-17).

    Split as :func:`gplvm_fe_theta_terms` (θ-dependent: node energies +
    v-prior energy) + :func:`gplvm_fe_const_terms` (θ-independent at frozen
    q: latent prior energies and all entropies) so the M-step L-BFGS can
    differentiate ONLY the θ-terms — the old single-body form re-ran every
    q(v) factorization inside each objective/gradient eval of the AD loop,
    the dominant on-device M-step cost (DEVIATIONS #30)."""
    M = Xu.shape[0]
    D = Y.shape[1]
    mu_v, Binv, Lb = _qv_stats_kron(state.xi_v, state.prec_v, M, D)
    # the f64-held naturals collapse to moments ONCE; the bulk θ-terms
    # (node energies over N) run in the model dtype
    mu_v, Binv = mu_v.astype(Y.dtype), Binv.astype(Y.dtype)
    cov_v = jnp.kron(jnp.eye(D, dtype=Y.dtype), Binv)
    mub = _split_blocks(mu_v, M, D)
    R_diag_sum = D * Binv + jnp.einsum("dm,dn->mn", mub, mub)
    return gplvm_fe_theta_terms(
        kernel, theta, Xu, Y, state.x_means, state.x_covs, mu_v, cov_v,
        R_diag_sum, W_val,
    ) + gplvm_fe_const_terms(state, x_prior_means, Lb, x_prior_cov_scale)


def gplvm_fe_theta_terms(kernel, theta, Xu, Y, x_means, x_covs, mu_v, cov_v,
                         R_diag_sum, W_val: float = 100.0):
    """The θ-dependent half of the GPLVM Bethe FE at frozen q: Σ node
    average energies (θ through the cubature Ψ-statistics) + the v-prior
    energy −E_q[log N(v; 0, (I_D ⊗ Kuu(θ))⁻¹)] in Kronecker precision
    form: logdet(I⊗Kuu) = D·logdet Kuu (one M×M Cholesky) and
    tr((I⊗Kuu)·R_v) = tr(Kuu · Σ_d R_dd), with ``R_diag_sum`` = Σ_d R_dd =
    D·B⁻¹ + Σ_d μ_dμ_dᵀ precomputed from the frozen q(v)
    (:func:`_qv_stats_kron`). This is the whole M-step objective — the
    q(v) moments enter as closed-over constants, so no (M·D)-sized
    factorization is traced into the AD loop."""
    N, D = Y.shape
    M = Xu.shape[0]
    dt = Y.dtype
    sr = quad.SphericalRadial()
    Kuu = _kuu_ssm(kernel, theta, Xu)
    # factored in f64 regardless of the model dtype (f32-first mode): the
    # inverse of the ill-conditioned Kuu is condition-critical, the Gram is
    # not (see chain_smoother._kuu_inv_f64)
    Kuu_inv = cholinv(Kuu.astype(jnp.float64)).astype(Kuu.dtype)
    args = MultiSGPArgs(theta, Xu, Kuu_inv)
    W = W_val * jnp.eye(D, dtype=dt)
    logdetW = D * jnp.log(jnp.asarray(W_val, dt))

    def node_e(y_i, m_i, V_i):
        return average_energy(
            kernel, sr, args, y_i, jnp.zeros((D, D), dt), MvGaussian(m_i, V_i),
            mu_v, cov_v, W, logdetW,
        )

    U_nodes = jnp.sum(jax.vmap(node_e)(Y, x_means, x_covs))
    Lk = chol_lower(sym(Kuu).astype(jnp.float64))  # f64 logdet (FE term)
    tr_prior = jnp.einsum("mn,nm->", Kuu, R_diag_sum)
    U_v = 0.5 * (M * D * _LOG2PI - D * logdet_from_chol(Lk) + tr_prior)
    return U_nodes + U_v


def gplvm_fe_const_terms(state: "GPLVMState", x_prior_means, Lb,
                         x_prior_cov_scale: float = 100.0):
    """The θ-independent half of the GPLVM Bethe FE at frozen q: latent
    prior energies U_x minus the entropies H_x + H_v. ``Lb`` is the M×M
    Cholesky factor of the q(v) precision's Kronecker block
    (:func:`_qv_stats_kron`), giving H_v = (MD/2)(1+log2π) − (D/2)·logdet B
    — the exactly-SPD precision route of DEVIATIONS #30 at 1/D³ the cost."""
    N, Din = state.x_means.shape
    M = Lb.shape[0]
    D = state.xi_v.shape[0] // M
    dt = state.x_means.dtype
    U_x = jnp.sum(
        jax.vmap(
            lambda m, V, mp: prior_energy_mvn(
                m, V, mp, x_prior_cov_scale * jnp.eye(Din, dtype=dt)
            )
        )(state.x_means, state.x_covs, x_prior_means)
    )
    H_x = jnp.sum(
        jax.vmap(lambda m, V: mv_gaussian_entropy(MvGaussian(m, V)))(
            state.x_means, state.x_covs
        )
    )
    H_v = 0.5 * M * D * (1.0 + _LOG2PI) - 0.5 * D * logdet_from_chol(Lb)
    return U_x - H_x - H_v


def gplvm_init_state(kernel, theta, Xu, Y, x_prior_means) -> "GPLVMState":
    """The canonical cold-start mean-field state: latents at their PCA prior
    means with unit covariance, q(v) at the θ-dependent whitened prior
    (ξ=0, Λ = I_D ⊗ Kuu(θ)) — exactly what :func:`gplvm_vmp` /
    :func:`fit_gplvm_grad` build internally when ``init_state`` is omitted.

    Exposed so chunked device drivers can pass an EXPLICIT initial state:
    the ``init_state=None`` and ``init_state=<pytree>`` call signatures are
    two different jit traces, i.e. two multi-minute TPU compiles for one
    program's worth of math (experiments/gplvm.py)."""
    N, D = Y.shape
    Din = x_prior_means.shape[1]
    M = Xu.shape[0]
    dt = Y.dtype
    f64 = jnp.float64
    # q(v)'s natural parameters ALWAYS live in f64 (a no-op for the f64
    # path): the whitened prior makes κ(Λ_v) ≈ 1e10, so B's small
    # eigenvalues sit below the f32 representation noise of its large
    # entries — an f32-held precision is indefinite-by-rounding and every
    # downstream factorization NaNs (measured; DEVIATIONS r5). The x
    # marginals and all bulk Ψ work stay in the model dtype.
    Kuu64 = _kuu_ssm(kernel, theta, Xu).astype(f64)
    return GPLVMState(
        x_prior_means,
        jnp.tile(jnp.eye(Din, dtype=dt), (N, 1, 1)),
        jnp.zeros(M * D, dtype=f64),
        jnp.kron(jnp.eye(D, dtype=f64), Kuu64),
    )


@partial(jax.jit, static_argnames=("kernel", "n_iters", "laplace_steps", "compute_fe"))
def gplvm_vmp(
    kernel,
    theta,
    Xu,
    Y,  # (N, D_out) observed outputs
    x_prior_means,  # (N, Din) PCA init
    x_prior_cov_scale: float = 100.0,
    W_val: float = 100.0,
    n_iters: int = 6,
    laplace_steps: int = 20,
    compute_fe: bool = True,
    init_state: "GPLVMState | None" = None,
):
    N, D = Y.shape
    Din = x_prior_means.shape[1]
    M = Xu.shape[0]
    dt = Y.dtype
    sr = quad.SphericalRadial()

    f64 = jnp.float64
    Kuu = _kuu_ssm(kernel, theta, Xu)
    # factored in f64 regardless of the model dtype (f32-first mode): the
    # inverse of the ill-conditioned Kuu is condition-critical, the Gram is
    # not (see chain_smoother._kuu_inv_f64)
    Kuu_inv = cholinv(Kuu.astype(f64)).astype(Kuu.dtype)
    args = MultiSGPArgs(theta, Xu, Kuu_inv)
    W = W_val * jnp.eye(D, dtype=dt)
    tr_W = jnp.trace(W)

    # θ-dependent whitened prior on v: precision = I_D ⊗ Kuu (GPLVM.ipynb
    # cell 16). Natural params of q(v) are HELD IN F64 in every mode — see
    # gplvm_init_state: κ(Λ_v) ≈ 1e10 puts B's small eigenvalues below the
    # f32 noise floor of its large entries.
    Kuu64 = _kuu_ssm(kernel, theta, Xu).astype(f64)
    prior_prec_v = jnp.kron(jnp.eye(D, dtype=f64), Kuu64)
    prior_xi_v = jnp.zeros(M * D, dtype=f64)

    x_prior_prec = jnp.eye(Din, dtype=dt) / x_prior_cov_scale
    x_prior_xi = x_prior_means / x_prior_cov_scale  # (N, Din)

    def sweep(state: GPLVMState, _):
        # ---- 1. q(v) from the current latent marginals ----------------------
        # Order matters: at initialization q(v) sits at its whitened prior,
        # which makes the in-message exactly flat (A_in = 0) — updating x
        # first would collapse q(x) to the broad prior and extinguish every
        # Ψ-statistic (a degenerate fixed point). Updating v first from the
        # unit-variance initial marginals (the reference's
        # RequireMarginalFunctionalDependencies init) escapes it.
        psi0_b, psi1_b, Kp, wq = psiops.psi_batch_expected_multi(
            kernel, theta, Xu, sr, state.x_means, state.x_covs
        )
        sum_psi2 = psiops.sum_weighted_psi2(Kp, wq, jnp.ones((N,), dt))
        yW = Y @ W.T  # (N, D)
        # the data sums are f32 MXU work; the ACCUMULATED naturals are f64
        xi_v = prior_xi_v + jnp.einsum(
            "nd,mn->dm", yW, psi1_b,
            precision=jax.lax.Precision.HIGHEST).reshape(-1).astype(f64)
        prec_v = prior_prec_v + jnp.kron(W, sum_psi2).astype(f64)

        # ---- 2. q(x_i): the shared Laplace-×-prior update, vmapped ---------
        # (L-BFGS starts at the current marginal mean — the reference's
        # RequireMarginalFunctionalDependencies start point)
        update_x = make_x_update(kernel, theta, Xu, Kuu_inv, xi_v, prec_v,
                                 W, x_prior_prec, laplace_steps)
        new_means, new_covs = jax.vmap(update_x)(Y, state.x_means, x_prior_xi)
        return GPLVMState(new_means, new_covs, xi_v, prec_v), None

    state0 = init_state
    if state0 is None:
        state0 = GPLVMState(
            x_prior_means,
            jnp.tile(jnp.eye(Din, dtype=dt), (N, 1, 1)),
            prior_xi_v,
            prior_prec_v,
        )  # == gplvm_init_state(kernel, theta, Xu, Y, x_prior_means)
    state, _ = jax.lax.scan(sweep, state0, None, length=n_iters)

    fe = jnp.asarray(0.0, dt)
    if compute_fe:
        fe = gplvm_free_energy(
            kernel, theta, Xu, Y, state, x_prior_means, x_prior_cov_scale, W_val
        )

    return state, fe


@partial(jax.jit, static_argnames=(
    "kernel", "epochs", "n_iters", "laplace_steps", "lbfgs_steps",
))
def fit_gplvm_grad(
    kernel,
    theta0,
    Xu,
    Y,
    x_prior_means,
    epochs: int = 25,
    n_iters: int = 6,
    laplace_steps: int = 20,
    lbfgs_steps: int = 8,
    x_prior_cov_scale: float = 100.0,
    W_val: float = 100.0,
    init_state: "GPLVMState | None" = None,
):
    """Gradient-based GPLVM hyperparameter optimization (SURVEY §7.1
    optimizer row: "gradient descent through the (now differentiable) FE",
    replacing the reference's derivative-free NelderMead — GPLVM.ipynb
    cells 16-17).

    One jitted scan over epochs; each epoch alternates
      E-step: ``n_iters`` warm-started VMP sweeps at the current θ
              (the reference re-runs 6 COLD sweeps per NelderMead FE
              evaluation; warm starting converges q much further for the
              same budget — a large part of the measured FE win),
      M-step: ``lbfgs_steps`` L-BFGS iterations on FE(θ; q frozen)
              (:func:`gplvm_free_energy` — generalized EM, so each half-step
              decreases the SAME objective NelderMead probes blindly).

    ``init_state`` warm-starts the mean-field state (resume across epoch
    chunks — the on-device runs thread it through host checkpoints so long
    hyperopts stay under the device-tunnel RPC deadline per execution).

    Returns (θ, state, fe_trace) with fe_trace[e] = FE after epoch e's
    M-step at the epoch's E-step state."""
    dt = Y.dtype
    M = Xu.shape[0]
    D = Y.shape[1]

    def epoch(carry, _):
        theta, state = carry
        state, _ = gplvm_vmp(
            kernel, theta, Xu, Y, x_prior_means, x_prior_cov_scale, W_val,
            n_iters=n_iters, laplace_steps=laplace_steps, compute_fe=False,
            init_state=state,
        )
        from .training import lbfgs_solve

        # frozen-q M-step: factor the epoch's q(v) ONCE (M×M Kronecker
        # block) and close the moments over the L-BFGS objective — only the
        # θ-terms of the FE are evaluated/differentiated per line-search
        # step; the θ-constant terms (U_x − H_x − H_v) are added back for
        # the reported FE. Same minimizer (a constant shift), and it
        # removes every q(v) factorization from inside the AD loop.
        mu_v, Binv, Lb = _qv_stats_kron(state.xi_v, state.prec_v, M, D)
        mu_v, Binv = mu_v.astype(dt), Binv.astype(dt)  # f64 naturals →
        #             model-dtype moments for the bulk θ-terms
        cov_v = jnp.kron(jnp.eye(D, dtype=dt), Binv)
        mub = _split_blocks(mu_v, M, D)
        R_diag_sum = D * Binv + jnp.einsum("dm,dn->mn", mub, mub)
        const = gplvm_fe_const_terms(state, x_prior_means, Lb,
                                     x_prior_cov_scale)

        def obj(th):
            return gplvm_fe_theta_terms(
                kernel, th, Xu, Y, state.x_means, state.x_covs, mu_v, cov_v,
                R_diag_sum, W_val,
            )

        theta, _ = lbfgs_solve(obj, theta, max_steps=lbfgs_steps)
        return (theta, state), obj(theta) + const

    if init_state is not None:
        state0 = init_state
    else:
        state0 = gplvm_init_state(kernel, theta0, Xu, Y, x_prior_means)
    (theta, state), fe_trace = jax.lax.scan(
        epoch, (theta0, state0), None, length=epochs
    )
    return theta, state, fe_trace


@partial(jax.jit, static_argnames=("kernel", "n_iters", "laplace_steps"))
def gplvm_embed(
    kernel,
    theta,
    Xu,
    Y_new,  # (N*, D_out) new observations to embed
    state: GPLVMState,  # trained state (q(v) frozen)
    x_prior_means,  # (N*, Din) per-point prior means (the PCA projection,
    #                 exactly as the training latents' priors)
    x_prior_cov_scale: float = 100.0,
    W_val: float = 100.0,
    n_iters: int = 3,
    laplace_steps: int = 20,
    x_start=None,  # (N*, Din) first Laplace start; default = the prior means
):
    """Out-of-sample GPLVM embedding: q(x*) for NEW observations under the
    TRAINED model — the mean-field x-update of :func:`gplvm_vmp` (Laplace
    in-message × MvN prior, MultiSGPnode.jl:210-236) iterated with the
    trained q(v) FROZEN. The reference only ever infers latents for its
    training set (GPLVM.ipynb cell 22); this is the natural serving surface
    of the model family — what "embed this new sample" means for a GPLVM
    user switching over.

    ``x_prior_means`` plays the role the PCA projections play for the
    training latents (per-point MvN prior centers); ``x_start`` seeds the
    first L-BFGS — the Laplace objective is multimodal (GPLVM latent
    symmetries), so the start selects the mode, exactly as the training
    trajectory's warm starts do. ``n_iters`` polishes the linearization
    point by restarting L-BFGS from the previous iteration's posterior
    mean.

    Returns (means (N*, Din), covs (N*, Din, Din)).
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be ≥ 1 (got {n_iters}): the final "
                         "pass IS the embedding; n_iters-1 are polish "
                         "iterations")
    Din = x_prior_means.shape[1]
    D = Y_new.shape[1]
    dt = Y_new.dtype

    Kuu = _kuu_ssm(kernel, theta, Xu)
    # factored in f64 regardless of the model dtype (f32-first mode): the
    # inverse of the ill-conditioned Kuu is condition-critical, the Gram is
    # not (see chain_smoother._kuu_inv_f64)
    Kuu_inv = cholinv(Kuu.astype(jnp.float64)).astype(Kuu.dtype)
    W = W_val * jnp.eye(D, dtype=dt)
    x_prior_prec = jnp.eye(Din, dtype=dt) / x_prior_cov_scale
    x_prior_xi = x_prior_means / x_prior_cov_scale  # (N*, Din)
    if x_start is None:
        x_start = x_prior_means

    # the SAME x-update map as gplvm_vmp's sweeps, at the trained (frozen)
    # v-statistics — what makes "trained latents are fixed points" structural
    update_x = make_x_update(kernel, theta, Xu, Kuu_inv, state.xi_v,
                             state.prec_v, W, x_prior_prec, laplace_steps)

    # polish iterations carry only the means (the L-BFGS restart point);
    # the final pass also materializes the covariances
    means, _ = jax.lax.scan(
        lambda m, _: (jax.vmap(update_x)(Y_new, m, x_prior_xi)[0], None),
        x_start, None, length=n_iters - 1,
    )
    return jax.vmap(update_x)(Y_new, means, x_prior_xi)
