"""Minibatched sparse-GP training with warm-started q(v) (kin40k / banana).

The reference per-batch pipeline (SURVEY.md §3.1, regression_kin40k.ipynb
cell 9): one VMP sweep warm-started from the previous batch's q(v), then an
AdaMax step on the hyperparameter objective. Here the WHOLE training run is a
single jitted ``lax.scan``; no host round-trips inside.

TPU-native hot-loop design: NO Cholesky / triangular solves. On this backend
XLA lowers factorizations to while-loops with ~100 ms of per-op dispatch,
while matmuls run at ~20 TFLOP/s — so every inverse is a warm-started
Newton–Schulz iteration (ops/linalg.spd_inverse) and the objective is the
trace-form :func:`~..objectives.neg_log_backwardmess_gram`. Mathematically
this computes the same fixed point as the reference (‖Uv k‖² = kᵀRv k).

Natural-parameter warm start: the reference carries q(v) as (μ, Σ) and feeds
it back as the next batch's prior; accumulating (ξ, Λ) is the same fixed
point without the invert/re-invert churn.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..dists import GammaShapeRate, MvGaussianNat
from ..nodes import probit as probit_node
from ..objectives import neg_log_backwardmess_gram
from ..ops.linalg import (
    effective_jitter, gershgorin_lambda_min, ir_solve, spd_inverse, sym,
)

__all__ = [
    "MinibatchCarry",
    "default_optimizer",
    "fast_optimizer",
    "fit_kin40k",
    "fit_kin40k_fast",
    "init_kin40k_fast_state",
    "fit_banana",
    "fit_banana_fast",
    "init_banana_state",
    "qv_grand_update",
    "banana_epoch_stats",
    "make_theta_step",
]

# Newton–Schulz budgets: the q(v) precision and Kuu change little between
# consecutive batches, so a warm start + few iterations suffices in steady
# state. The branchless guard in spd_inverse rejects stale warm starts.
NS_ITERS_WARMUP = 40
NS_ITERS_STEADY = 8
# Cold refresh budget for the fast trainers' per-epoch q(v) statistics
# refresh, which runs the SCALED Newton–Schulz (a rigorous λmin bound from
# the prior precision is always available there): scaled convergence at the
# kin40k/banana κ ~ 1e9-1e12 takes ~22-24 iterations to the f64 floor
# (measured vs np.linalg.inv at κ=1e12: scaled-24 ≡ unscaled-45 at rel-err
# ~2e-6 = κ·ε₆₄), so 28 carries a 4-6 iteration margin where the UNSCALED
# budget needed 45 (and silently corrupted training at 30 — round-2 finding,
# DEVIATIONS #6).
REFRESH_NS_ITERS_SCALED = 28


def _identity(x):
    return x


def qv_grand_update(Kall64, y64, xi, prec, w64, cov_warm, ns_iters,
                    ns_tol=None, reduce=_identity, lambda_min=None):
    """ONE grand natural-parameter update of q(v) + the f64 refresh — the
    shared numerical core of the fast trainers AND their data-parallel
    variants (parallel/sharding.py):

      ξ ← ξ + w·reduce(K y),  Λ ← sym(Λ + w·reduce(K Kᵀ)),
      Σ = NS⁻¹(Λ) warm-started,  μ = IR-solve(Λ, ξ; Σ, 2 rounds).

    ``reduce`` is identity single-device and ``lax.psum`` over the mesh axis
    under shard_map — valid because both increments are pure data-sums over
    the point dimension. Keeping the update in ONE place makes the
    "DP ≡ single-device" guarantee structural rather than a
    parallel-maintenance promise (tests/test_sharding.py).

    ``lambda_min``: rigorous λmin bound on the accumulated precision —
    Λ = Λ_prior + Σ PSD increments ⪰ Λ_prior, so
    :func:`~..ops.linalg.gershgorin_lambda_min` of the PRIOR precision is
    valid for every epoch — enabling the optimally scaled Newton–Schulz
    refresh (~22 converged iterations at κ~1e10 vs ~45 unscaled; see
    spd_inverse_ns)."""
    hi = jax.lax.Precision.HIGHEST
    xi = xi + w64 * reduce(jnp.matmul(Kall64, y64, precision=hi))
    prec = sym(prec + w64 * reduce(jnp.matmul(Kall64, Kall64.T, precision=hi)))
    cov64 = spd_inverse(prec, warm=cov_warm, iters=ns_iters, tol=ns_tol,
                        lambda_min=lambda_min)
    mu64 = ir_solve(prec, xi, cov64, rounds=2)
    return xi, prec, cov64, mu64


def make_theta_step(grad_one, optimizer, reduce=_identity):
    """Scan body for the AdaMax θ-steps against frozen epoch statistics.

    ``grad_one(theta, kuu_warm, batch) -> (grad, kuu_warm)`` computes the
    (shard-local) objective gradient for one minibatch; ``reduce`` folds the
    per-shard gradients into the full-batch gradient under shard_map (the
    objective is a pure data-sum, so the psum of shard gradients IS the
    full-batch gradient)."""

    def theta_step(tc, batch):
        th, os_, kw = tc
        g, kw = grad_one(th, kw, batch)
        g = reduce(g)
        upd, os_ = optimizer.update(g, os_, th)
        return (optax.apply_updates(th, upd), os_, kw), None

    return theta_step


def banana_epoch_stats(kernel, Xu, X, y, carry, N_global, refresh_ns_iters,
                       dt, acc_dt, reduce=_identity, lambda_min=None):
    """The grand per-epoch statistics pass of :func:`fit_banana_fast`
    (see its docstring for the schedule): forward f-messages and probit
    tilted marginals for (this shard of) the data, the reduced accumulating
    q(v) update + f64 Newton–Schulz refresh, and the reduced carried q(w)
    update (shape += N/2, rate += Σ(I1+I2)/2; trace forms of
    UniSGPnode.jl:219-238).

    Every global quantity is a pure data-sum over the point dimension, so
    the single-device pass and the shard_map pass (``reduce=psum``,
    ``N_global`` = pre-shard count) share this one implementation.
    Returns ``(qf, xi, prec, cov64, mu_v, Rv, w_shape, w_rate)``."""
    hi = jax.lax.Precision.HIGHEST
    theta = carry.theta
    Kall = kernel(theta, Xu, X)  # (M, N_local) — one MXU Gram
    Kall64 = Kall.astype(acc_dt)
    kxx = kernel.diag(theta, X)
    w_mean = (carry.w_shape / carry.w_rate).astype(dt)
    mu_v_prev = ir_solve(carry.prec_v, carry.xi_v, carry.cov_v, rounds=2).astype(dt)
    # forward f messages → probit tilted marginals (a per-datum map)
    f_fwd = jnp.matmul(Kall.T, mu_v_prev, precision=hi)
    f_var = jnp.full_like(f_fwd, 1.0 / w_mean)
    qf = probit_node.tilted_marginal_batch(f_fwd, f_var, y)
    # ONE grand q(v) update (accumulating across epochs, PSD-exact f64)
    w64 = (carry.w_shape / carry.w_rate).astype(acc_dt)
    xi, prec, cov64, mu64 = qv_grand_update(
        Kall64, qf.mean.astype(acc_dt), carry.xi_v, carry.prec_v, w64,
        carry.cov_v, refresh_ns_iters, reduce=reduce, lambda_min=lambda_min,
    )
    mu_v = mu64.astype(dt)
    Rv = (cov64 + jnp.outer(mu64, mu64)).astype(dt)
    # ONE grand q(w) update (trace forms, UniSGPnode.jl:219-238)
    I1 = jnp.maximum(
        kxx - jnp.sum(Kall * jnp.matmul(carry.kuu_inv, Kall, precision=hi),
                      axis=0), 0.0,
    )
    I2 = (
        qf.mean**2 + qf.var
        - 2.0 * qf.mean * jnp.matmul(Kall.T, mu_v, precision=hi)
        + jnp.sum(Kall * jnp.matmul(Rv, Kall, precision=hi), axis=0)
    )
    w_shape = (carry.w_shape + 0.5 * N_global).astype(acc_dt)
    w_rate = (carry.w_rate + 0.5 * reduce(jnp.sum(I1 + I2))).astype(acc_dt)
    return qf, xi, prec, cov64, mu_v, Rv, w_shape, w_rate


def default_optimizer(learning_rate=1e-3):
    """The trainers' shared AdaMax chain. zero_nans + clipping guard the
    max-accumulator: a single inf/nan gradient (possible in cold-start
    batches) would otherwise freeze u at inf and zero every later update.
    init_* state builders MUST use this same chain or a host-built
    resume_state's opt_state pytree silently mismatches."""
    return optax.chain(
        optax.zero_nans(), optax.clip_by_global_norm(1e8),
        optax.adamax(learning_rate),
    )


def fast_optimizer(learning_rate=1e-3, lr_decay_rate=1.0, epochs=1, n_batches=1):
    """The exact optimizer chain :func:`fit_kin40k_fast` builds for a given
    schedule. Exposed so :func:`init_kin40k_fast_state` (and chunked drivers)
    can construct an opt_state whose pytree matches the trainer's — a decayed
    schedule carries different optax state than a constant lr, and a
    mismatch surfaces as an opaque scan/tree error at trace time."""
    if lr_decay_rate != 1.0:
        lr = optax.exponential_decay(
            learning_rate, transition_steps=epochs * n_batches,
            decay_rate=lr_decay_rate,
        )
    else:
        lr = learning_rate
    return default_optimizer(lr)


class MinibatchCarry(NamedTuple):
    xi_v: jax.Array
    prec_v: jax.Array
    cov_v: jax.Array  # warm Newton–Schulz estimate of prec_v⁻¹
    kuu_inv: jax.Array  # warm estimate of Kuu(θ)⁻¹
    theta: jax.Array
    opt_state: optax.OptState
    w_shape: jax.Array  # classification only
    w_rate: jax.Array


@partial(jax.jit, static_argnames=("kernel", "epochs", "ns_budget"))
def fit_kin40k(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, Din)
    y_batched,  # (B, batch)
    prior_v: MvGaussianNat,
    w_val: float,
    epochs: int,
    learning_rate: float = 0.001,
    resume_state: MinibatchCarry | None = None,
    ns_budget: int = 34,
):
    """kin40k trainer (reference: regression_kin40k.ipynb cells 9-10):
    w is a PointMass (1e4); per epoch scan over minibatches. Returns
    (θ, q(v) natural params, carry) — pass the carry back as
    ``resume_state`` to continue (single device executions beyond ~2-3 min
    hit this environment's tunnel RPC deadline, so long runs chunk).
    ``ns_budget``: per-batch scaled-NS refresh iterations — the default 34
    is the production budget; 60 exists for the budget-saving measurement
    (benchmarks/kin40k_refxu_r5.json)."""
    # zero_nans + clipping guard the AdaMax max-accumulator: a single inf/nan
    # gradient (possible in the first cold-start batches) would otherwise
    # freeze u at inf and zero every later update
    optimizer = default_optimizer(learning_rate)
    M = Xu.shape[0]
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    hi = jax.lax.Precision.HIGHEST

    kuu_jit = effective_jitter(theta0.dtype)
    # rigorous λmin bound for the per-batch q(v) refresh: Λ = Λ_prior +
    # Σ w·KKᵀ ⪰ Λ_prior for every batch of every epoch, so the prior's
    # Gershgorin bound enables the spectrum-scaled iteration (f64 only —
    # spd_inverse_ns gates it; f32 keeps the classic map bit-for-bit)
    lam_v = gershgorin_lambda_min(sym(prior_v.prec)).astype(acc_dt)

    def make_epoch(ns_iters):  # ns budget is uniform; kept as a closure arg
        def objective(th, Xb, yb, mu_v, Rv, kuu_warm):
            return neg_log_backwardmess_gram(
                th, kernel=kernel, Xu=Xu, X=Xb, y=yb, mu_v=mu_v, Rv=Rv, w=w_val,
                kuu_inv_warm=kuu_warm, ns_iters=ns_iters, kuu_jitter=kuu_jit,
            )

        grad_fn = jax.grad(objective, has_aux=True)

        def step(carry: MinibatchCarry, batch):
            Xb, yb = batch
            theta = carry.theta
            Kux = kernel(theta, Xu, Xb)
            # one VMP sweep: q(v) ← warm q(v) × batch messages
            # (UniSGPnode.jl:144-158). Mixed precision: (ξ, Λ) accumulate in
            # float64 (κ(Λ) ≫ 1/ε₃₂); Grams/NS stay in the working dtype, and
            # μ_v is recovered to f64 accuracy by iterative refinement with
            # one f64 mat-vec per round.
            Kux64 = Kux.astype(acc_dt)
            # full-precision products: a no-op in f64, but in the f32 fast
            # mode (GPNODE_X64=0) the default bf16 passes (ε≈8e-3) break the
            # PSD-ness Λ needs for the Newton–Schulz inverse
            xi = carry.xi_v + w_val * jnp.matmul(Kux64, yb.astype(acc_dt), precision=hi)
            prec = carry.prec_v + w_val * jnp.matmul(Kux64, Kux64.T, precision=hi)
            # q(v) inverse in the ACCUMULATOR dtype: κ(Λ) ~ 1e9 exceeds
            # 1/ε₃₂, an f32 estimate poisons Rv and the θ-gradient
            cov64 = spd_inverse(sym(prec), warm=carry.cov_v, iters=ns_iters,
                                lambda_min=lam_v)
            mu64 = ir_solve(sym(prec), xi, cov64, rounds=3)
            mu_v = mu64.astype(dt)
            Rv = (cov64 + jnp.outer(mu64, mu64)).astype(dt)
            cov = cov64
            # AdaMax step on the batched objective (derivative_helper.jl:23-39)
            g, kuu_inv = grad_fn(theta, Xb, yb, mu_v, Rv, carry.kuu_inv)
            updates, opt_state = optimizer.update(g, carry.opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return MinibatchCarry(
                xi, prec, cov, kuu_inv, theta, opt_state, carry.w_shape, carry.w_rate
            ), None

        def epoch(carry, _):
            # reference resets q(v) to its prior at every epoch start
            # (regression_kin40k.ipynb cell 9: μ_v = zeros; Σ_v = 50I)
            carry = carry._replace(
                xi_v=prior_v.xi.astype(acc_dt), prec_v=prior_v.prec.astype(acc_dt)
            )
            carry, _ = jax.lax.scan(step, carry, (X_batched, y_batched))
            return carry, None

        return epoch

    carry0 = MinibatchCarry(
        prior_v.xi.astype(acc_dt), prior_v.prec.astype(acc_dt),
        jnp.zeros((M, M), acc_dt), jnp.zeros((M, M), dt),
        theta0, optimizer.init(theta0),
        jnp.asarray(0.0, dt), jnp.asarray(0.0, dt),
    )
    if resume_state is not None:
        carry0 = resume_state
    # one scan program for the whole run (a separate warmup-budget scan was
    # dead weight). Budget 34: the SCALED iteration reaches the unscaled
    # 60-budget's f64 floor in ~28 cold iterations (DEVIATIONS #22) and the
    # per-batch refresh usually runs warm-started besides; 34 keeps ~20%
    # headroom over the cold bound. Verified: the reference-Xu trajectory
    # parity run reproduces params_optimal_kin40k to the same max|θ−θ*| as
    # the 60-iteration unscaled budget (benchmarks/kin40k_refxu_r4.json).
    carry, _ = jax.lax.scan(make_epoch(ns_budget), carry0, None, length=epochs)
    return carry.theta, MvGaussianNat(carry.xi_v, carry.prec_v), carry


@partial(jax.jit, static_argnames=("kernel", "epochs", "ns_iters", "ns_tol"))
def fit_banana(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, 2)
    y_batched,  # (B, batch) in {0,1}
    prior_v: MvGaussianNat,
    prior_w: GammaShapeRate,
    epochs: int,
    learning_rate: float = 0.001,
    resume_state: MinibatchCarry | None = None,
    ns_iters: int = 30,
    ns_tol: float | None = None,
):
    """Banana classification trainer (classification_banana.ipynb cell 9):
    per batch, 1 VMP sweep (forward f → probit tilted q(f) → q(v) warm-started
    → q(w) carried across batches), then AdaMax on pseudo-targets f̄ with the
    batch q(w) mean. Unlike kin40k, q(v)/q(w) accumulate ACROSS epochs (the
    reference's per-epoch resets are commented out). Mixed precision as in
    fit_kin40k: f64 (ξ, Λ) + Newton–Schulz/IR solves, f32 Grams.
    Returns (θ, q(v) nat, q(w)).

    ``ns_iters=30`` vs the fast path's measured 45: the 45-iteration finding
    applies to COLD grand refreshes (prior + a full-epoch rank-N update, once
    per epoch). This per-batch path warm-starts from the previous batch's
    inverse and q(v) accumulates WITHOUT epoch resets, so each increment is
    O(1/(B·epoch)) relative and NS converges in a few iterations — 30 is
    headroom, not the binding budget; the matched-budget fast≡faithful test
    (tests/test_minibatch.py) passes at these defaults."""
    optimizer = default_optimizer(learning_rate)
    M = Xu.shape[0]
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    hi = jax.lax.Precision.HIGHEST
    a0, b0 = prior_w.shape, prior_w.rate
    batch = X_batched.shape[1]

    kuu_jit = effective_jitter(dt)

    def objective(th, Xb, f, mu_v, Rv, w, kuu_warm):
        return neg_log_backwardmess_gram(
            th, kernel=kernel, Xu=Xu, X=Xb, y=f, mu_v=mu_v, Rv=Rv, w=w,
            kuu_inv_warm=kuu_warm, ns_iters=NS_ITERS_STEADY, kuu_jitter=kuu_jit,
        )

    grad_fn = jax.grad(objective, has_aux=True)

    def step(carry: MinibatchCarry, batch_xy):
        Xb, yb = batch_xy
        theta = carry.theta
        Kux = kernel(theta, Xu, Xb)
        Kux64 = Kux.astype(acc_dt)
        kxx = kernel.diag(theta, Xb)
        w_mean = carry.w_shape / carry.w_rate
        mu_v_prev = ir_solve(carry.prec_v, carry.xi_v, carry.cov_v, rounds=2).astype(dt)
        # forward f messages → probit tilted marginals (UniSGPnode.jl:96-104
        # + the EP product); full-precision products throughout (bf16 default
        # passes destabilize the w-rate feedback loop)
        f_fwd = jnp.matmul(Kux.T, mu_v_prev, precision=hi)
        f_var = jnp.full_like(f_fwd, 1.0 / w_mean.astype(dt))
        qf = probit_node.tilted_marginal_batch(f_fwd, f_var, yb)
        # q(v) update with pseudo-targets E[f]; PSD-exact f64 products
        xi = carry.xi_v + w_mean * jnp.matmul(Kux64, qf.mean.astype(acc_dt), precision=hi)
        prec = sym(carry.prec_v + w_mean * jnp.matmul(Kux64, Kux64.T, precision=hi))
        # q(v) accumulates ACROSS batches here (no epoch reset), so in steady
        # state the per-batch precision increment is O(1/(B·epoch)) relative
        # and the previous batch's inverse is an excellent warm start — the
        # residual tol exits the f64 Newton–Schulz after ~2 iterations
        cov = spd_inverse(prec, warm=carry.cov_v, iters=ns_iters, tol=ns_tol)
        mu64 = ir_solve(prec, xi, cov, rounds=2)
        mu_v = mu64.astype(dt)
        Rv = (cov + jnp.outer(mu64, mu64)).astype(dt)
        # q(w) update carried across batches (rate in trace form,
        # UniSGPnode.jl:219-238: I1 = kxx − kᵀKuu⁻¹k, I2 = resid² + v_f + kᵀRv k)
        kuu_inv = carry.kuu_inv
        I1 = jnp.maximum(
            kxx - jnp.sum(Kux * jnp.matmul(kuu_inv, Kux, precision=hi), axis=0), 0.0
        )
        I2 = (
            qf.mean**2 + qf.var
            - 2.0 * qf.mean * jnp.matmul(Kux.T, mu_v, precision=hi)
            + jnp.sum(Kux * jnp.matmul(Rv, Kux, precision=hi), axis=0)
        )
        # the carried q(w) is the next batch-model's PRIOR in the reference
        # (classification_banana.ipynb cell 9: shape/rate are fed back), so
        # shape and rate ACCUMULATE — this damping is what keeps the
        # w ↔ forward-variance feedback loop stable
        w_shape = (carry.w_shape + 0.5 * batch).astype(acc_dt)
        w_rate = (carry.w_rate + 0.5 * jnp.sum(I1 + I2)).astype(acc_dt)
        # AdaMax step
        g, kuu_inv = grad_fn(
            theta, Xb, qf.mean, mu_v, Rv, (w_shape / w_rate).astype(dt), carry.kuu_inv
        )
        updates, opt_state = optimizer.update(g, carry.opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return MinibatchCarry(xi, prec, cov, kuu_inv, theta, opt_state, w_shape, w_rate), None

    def epoch(carry, _):
        carry, _ = jax.lax.scan(step, carry, (X_batched, y_batched))
        return carry, None

    if resume_state is None:
        # init_banana_state honors prior_w (this used to hardcode 1e-2,
        # silently ignoring any non-default Gamma prior)
        carry0 = init_banana_state(kernel, theta0, Xu, prior_v, prior_w,
                                   optimizer=optimizer)
    else:
        carry0 = resume_state
    carry, _ = jax.lax.scan(epoch, carry0, None, length=epochs)
    return (
        carry.theta,
        MvGaussianNat(carry.xi_v, carry.prec_v),
        GammaShapeRate(carry.w_shape, carry.w_rate),
        carry,
    )


@partial(jax.jit, static_argnames=("kernel",))
def _init_banana_arrays(kernel, theta0, Xu, prior_v: MvGaussianNat):
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    kuu_jit = effective_jitter(dt)
    kuu_inv0 = spd_inverse(kernel.kuu(theta0, Xu, jitter=kuu_jit),
                           iters=NS_ITERS_WARMUP)
    cov0 = spd_inverse(sym(prior_v.prec).astype(acc_dt), iters=NS_ITERS_WARMUP)
    return kuu_inv0, cov0


def init_banana_state(kernel, theta0, Xu, prior_v: MvGaussianNat,
                      prior_w: GammaShapeRate, optimizer=None):
    """Initial carry for :func:`fit_banana_fast` (and drop-in for
    :func:`fit_banana`'s fresh start with the same priors). Exposed so
    chunked drivers can build it once host-side and always pass a concrete
    ``resume_state`` — one trace/executable for every chunk instead of a
    separate compile for the ``resume_state=None`` signature.

    ``optimizer`` must match the trainer's chain; the default reproduces it
    for the trainers' constant-lr AdaMax."""
    if optimizer is None:
        optimizer = default_optimizer()
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    kuu_inv0, cov0 = _init_banana_arrays(kernel, theta0, Xu, prior_v)
    return MinibatchCarry(
        prior_v.xi.astype(acc_dt), prior_v.prec.astype(acc_dt),
        cov0, kuu_inv0,
        theta0, optimizer.init(theta0),
        jnp.asarray(prior_w.shape, acc_dt),
        jnp.asarray(prior_w.rate, acc_dt),
    )


@partial(jax.jit, static_argnames=(
    "kernel", "epochs", "learning_rate", "refresh_ns_iters", "obj_ns_iters",
))
def fit_banana_fast(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, 2)
    y_batched,  # (B, batch) in {0,1}
    prior_v: MvGaussianNat,
    prior_w: GammaShapeRate,
    epochs: int,
    learning_rate: float = 0.001,
    resume_state=None,
    refresh_ns_iters: int = REFRESH_NS_ITERS_SCALED,
    obj_ns_iters: int = NS_ITERS_STEADY,
):
    """Epoch-granular banana trainer (the :func:`fit_banana` fixed point at
    kin40k-fast cost — VERDICT round-1 item 8).

    Per epoch, ONE grand statistics pass replaces the reference's 20
    per-batch passes (classification_banana.ipynb cell 9):

    - forward f-messages and probit tilted marginals for ALL N points at the
      epoch's (μ_v, w̄) — one 500×4000 MXU Gram;
    - ONE grand natural-parameter update of the ACCUMULATING q(v) (the
      reference carries q(v) across batches without reset; the 20 per-batch
      increments at frozen stats sum to this one update, order-free) and ONE
      full-budget f64 Newton–Schulz refresh — the hot op, now 1/20th as
      frequent;
    - ONE grand q(w) update (shape += N/2, rate += Σ(I1+I2)/2 — the same
      per-epoch sum the reference accumulates batch by batch);
    - 20 AdaMax θ-steps against the frozen epoch statistics with
      pseudo-targets E[f] (the reference's schedule, stats one epoch stale).

    Within-epoch staleness of (μ_v, w̄) is the only deviation; both paths
    converge to the same mean-field fixed point (equivalence tested at
    matched budgets in tests/test_minibatch.py).
    """
    optimizer = default_optimizer(learning_rate)
    M = Xu.shape[0]
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    # grand arrays derived FROM the batches: a separately-passed (X, y)
    # invited silent (x, f) mispairing whenever the caller shuffled when
    # pre-batching — structurally impossible this way
    X = X_batched.reshape(-1, X_batched.shape[-1])
    y = y_batched.reshape(-1)
    N = X.shape[0]
    kuu_jit = effective_jitter(dt)
    # Λ accumulates PSD increments from the prior up → its λmin bound
    lam_v = gershgorin_lambda_min(sym(prior_v.prec)).astype(acc_dt)

    def objective(th, Xb, f, mu_v, Rv, w, kuu_warm):
        return neg_log_backwardmess_gram(
            th, kernel=kernel, Xu=Xu, X=Xb, y=f, mu_v=mu_v, Rv=Rv, w=w,
            kuu_inv_warm=kuu_warm, ns_iters=obj_ns_iters, kuu_jitter=kuu_jit,
        )

    grad_fn = jax.grad(objective, has_aux=True)

    def epoch(carry: MinibatchCarry, _):
        qf, xi, prec, cov, mu_v, Rv, w_shape, w_rate = banana_epoch_stats(
            kernel, Xu, X, y, carry, N, refresh_ns_iters, dt, acc_dt,
            lambda_min=lam_v,
        )
        # 20 AdaMax θ-steps against the frozen epoch statistics
        qf_b = qf.mean.reshape(X_batched.shape[0], X_batched.shape[1])

        def grad_one(th, kw, batch):
            Xb, fb = batch
            return grad_fn(th, Xb, fb, mu_v, Rv, (w_shape / w_rate).astype(dt), kw)

        (theta, opt_state, kuu_inv), _ = jax.lax.scan(
            make_theta_step(grad_one, optimizer),
            (carry.theta, carry.opt_state, carry.kuu_inv), (X_batched, qf_b)
        )
        return MinibatchCarry(
            xi, prec, cov, kuu_inv, theta, opt_state, w_shape, w_rate
        ), None

    if resume_state is None:
        carry0 = init_banana_state(kernel, theta0, Xu, prior_v, prior_w,
                                   optimizer=optimizer)
    else:
        carry0 = resume_state
    carry, _ = jax.lax.scan(epoch, carry0, None, length=epochs)
    return (
        carry.theta,
        MvGaussianNat(carry.xi_v, carry.prec_v),
        GammaShapeRate(carry.w_shape, carry.w_rate),
        carry,
    )


@partial(jax.jit, static_argnames=(
    "kernel", "epochs", "learning_rate", "lr_decay_rate", "stats_refreshes",
    "refresh_ns_iters", "refresh_ns_tol", "obj_ns_iters", "obj_ns_tol",
))
def fit_kin40k_fast(
    kernel,
    theta0,
    Xu,
    X_batched,  # (B, batch, Din)
    y_batched,  # (B, batch)
    prior_v: MvGaussianNat,
    w_val: float,
    epochs: int,
    learning_rate: float = 0.001,
    lr_decay_rate: float = 1.0,
    stats_refreshes: int = 1,
    resume_state=None,
    refresh_ns_iters: int = REFRESH_NS_ITERS_SCALED,
    refresh_ns_tol: float | None = None,
    obj_ns_iters: int = 12,
    obj_ns_tol: float | None = None,
):
    """Epoch-granular kin40k trainer (the benchmark fast path).
    ``stats_refreshes``: q(v) statistics refreshes per epoch (1 = one grand
    update; B = the reference's per-batch freshness).
    ``lr_decay_rate``: exponential decay factor applied over the whole run
    (1.0 = constant; 0.1 = decay to a tenth) — stabilizes long horizons.

    Identical fixed point to :func:`fit_kin40k`: the reference's 20 per-batch
    natural-parameter updates within an epoch sum to ONE grand update
    (order-free), so q(v) after every epoch matches the per-batch schedule up
    to the slow within-epoch drift of θ. Differences to the faithful path:

    - q(v) statistics are refreshed once per epoch: one grand f32 Gram
      (600×10000, a single MXU matmul) and ONE float64 Newton–Schulz inverse
      (κ(Λ)~1e9 exceeds 1/ε₃₂; f64 *matmuls* are fast on this backend — it is
      f64 *elementwise* emulation that explodes op counts, so we spend f64
      only here);
    - the 20 AdaMax θ-steps per epoch run fully in f32 against the fixed
      epoch statistics (κ(Kuu)≈σ²/jitter ~ 3e4 is f32-safe).
    """
    B = X_batched.shape[0]
    optimizer = fast_optimizer(learning_rate, lr_decay_rate, epochs, B)
    M = Xu.shape[0]
    dt = theta0.dtype
    acc_dt = jnp.float64 if jax.config.jax_enable_x64 else dt
    kuu_jit = effective_jitter(dt)
    # rigorous λmin bound for every epoch's Λ (⪰ the prior precision) —
    # enables the scaled NS refresh (REFRESH_NS_ITERS_SCALED budget)
    lam_v = gershgorin_lambda_min(sym(prior_v.prec)).astype(acc_dt)

    # the θ-objective keeps the working dtype: with HIGHEST-precision
    # contractions (see objectives / kernels.sqdist) the f32 gradient matches
    # the f64 one — the convergence drag was TPU's bf16 default matmul passes
    obj_dt = dt

    def objective(th, Xb, yb, mu_v, Rv, kuu_warm):
        return neg_log_backwardmess_gram(
            th, kernel=kernel, Xu=Xu, X=Xb, y=yb, mu_v=mu_v, Rv=Rv, w=w_val,
            kuu_inv_warm=kuu_warm, ns_iters=obj_ns_iters, ns_tol=obj_ns_tol,
            kuu_jitter=kuu_jit,
        )

    grad_fn = jax.grad(objective, has_aux=True)

    B = X_batched.shape[0]
    groups = max(1, min(stats_refreshes, B))
    if B % groups != 0:
        raise ValueError(
            f"stats_refreshes={stats_refreshes} does not divide the batch "
            f"count B={B}: the trailing {B % groups} batches would be "
            "silently dropped from the statistics and θ-steps"
        )
    gsz = B // groups
    Xg = X_batched[: groups * gsz].reshape(groups, gsz * X_batched.shape[1], -1)
    yg = y_batched[: groups * gsz].reshape(groups, gsz * X_batched.shape[1])
    Xbg = X_batched[: groups * gsz].reshape(groups, gsz, *X_batched.shape[1:])
    ybg = y_batched[: groups * gsz].reshape(groups, gsz, *y_batched.shape[1:])

    def epoch(carry, _):
        # q(v) resets to the PRIOR each epoch (regression_kin40k.ipynb cell 9)
        # and accumulates group by group; θ-steps within a group use the
        # freshest statistics (groups=1 → one grand update per epoch;
        # groups=B → the reference's per-batch schedule)
        xi0, prec0, covs64, theta, opt_state, kuu_inv = carry

        def group_step(c, grp):
            xi, prec, covs64, theta, opt_state, kuu_inv = c
            Xg_, yg_, Xb_, yb_, g_idx = grp
            # Gram in f32 on the MXU, PRODUCT in f64 (f32 product rounding
            # ~ε₃₂·λmax ≈ 1e2 makes Λ indefinite and blows up NS).
            # Warm start from the SAME group's inverse in the PREVIOUS epoch:
            # the precision at group g is prior + g/G of a grand update, so
            # the previous *group's* estimate is off by an O(1) rank-B term
            # (useless as a warm start), while across epochs it differs only
            # by the θ drift. NOTE the drift w·Δ(KKᵀ) can still land in the
            # prior-dominated subspace (residual > 1), so the full cold-start
            # budget stays the default — the measured fast config is instead
            # stats_refreshes=1 (ONE 45-iteration f64 NS per epoch, ~26 s per
            # 500 kin40k epochs); a tol turns this into a while_loop early
            # exit, which this backend's per-iteration dispatch makes a NET
            # LOSS on TPU (kept for other backends).
            Kall = kernel(theta.astype(dt), Xu, Xg_).astype(acc_dt)  # one MXU Gram
            xi, prec, cov64, mu64 = qv_grand_update(
                Kall, yg_.astype(acc_dt), xi, prec, w_val, covs64[g_idx],
                refresh_ns_iters, ns_tol=refresh_ns_tol, lambda_min=lam_v,
            )
            covs64 = jax.lax.dynamic_update_index_in_dim(covs64, cov64, g_idx, 0)
            mu_v = mu64.astype(obj_dt)
            Rv = (cov64 + jnp.outer(mu64, mu64)).astype(obj_dt)

            def grad_one(th, kw, batch):
                Xb, yb = batch
                return grad_fn(th, Xb, yb, mu_v, Rv, kw)

            (theta, opt_state, kuu_inv), _ = jax.lax.scan(
                make_theta_step(grad_one, optimizer),
                (theta, opt_state, kuu_inv), (Xb_, yb_)
            )
            return (xi, prec, covs64, theta, opt_state, kuu_inv), None

        c0 = (prior_v.xi.astype(acc_dt), prior_v.prec.astype(acc_dt),
              covs64, theta, opt_state, kuu_inv)
        (xi, prec, covs64, theta, opt_state, kuu_inv), _ = jax.lax.scan(
            group_step, c0, (Xg, yg, Xbg, ybg, jnp.arange(groups))
        )
        return (xi, prec, covs64, theta, opt_state, kuu_inv), None

    theta0 = theta0.astype(obj_dt)
    if resume_state is None:
        carry0 = init_kin40k_fast_state(
            theta0, prior_v, M, groups, optimizer=optimizer,
            acc_dt=acc_dt, obj_dt=obj_dt,
        )
    else:
        carry0 = resume_state
    carry, _ = jax.lax.scan(epoch, carry0, None, length=epochs)
    xi, prec, covs64, theta, _, _ = carry
    # the last group's inverse is the full-posterior estimate callers expect
    return theta, MvGaussianNat(xi, prec), covs64[-1], carry


def init_kin40k_fast_state(theta0, prior_v, M, groups, optimizer=None,
                           acc_dt=None, obj_dt=None, learning_rate=1e-3,
                           lr_decay_rate=1.0, epochs=1, n_batches=1):
    """Initial carry for :func:`fit_kin40k_fast`. Exposed so chunked drivers
    can build it host-side and always call the trainer with a concrete
    ``resume_state`` — one trace/executable for every chunk instead of a
    separate compile for the ``resume_state=None`` signature.

    Pass the trainer's schedule parameters (``learning_rate``,
    ``lr_decay_rate``, ``epochs``, ``n_batches``) so the opt_state pytree is
    built by the SAME :func:`fast_optimizer` chain the trainer uses — a
    decayed schedule has a different optax state structure than a constant
    lr. ``optimizer`` overrides everything (must match the trainer's chain)."""
    if optimizer is None:
        optimizer = fast_optimizer(learning_rate, lr_decay_rate, epochs, n_batches)
    obj_dt = theta0.dtype if obj_dt is None else obj_dt
    if acc_dt is None:
        acc_dt = jnp.float64 if jax.config.jax_enable_x64 else obj_dt
    theta0 = theta0.astype(obj_dt)
    return (
        prior_v.xi.astype(acc_dt),
        prior_v.prec.astype(acc_dt),
        jnp.zeros((groups, M, M), acc_dt),
        theta0,
        optimizer.init(theta0),
        jnp.zeros((M, M), obj_dt),
    )
