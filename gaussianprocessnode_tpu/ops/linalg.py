"""Dense linear-algebra primitives (L0 layer).

TPU-native equivalents of the reference's LinearAlgebra usage
(``fastcholesky``, ``cholinv``, triangular solves, ``jdotavx`` SIMD dot —
reference: helper_functions/gp_helperfunction.jl:125-131 and the
``KuuL \\ x`` / ``Uv * x`` patterns in GPnode/UniSGPnode.jl).

Everything here is a pure jittable function; XLA lowers the matmuls and
triangular solves onto the MXU, so no manual cache pools (the reference's
``GPCache``) are needed.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..config import JITTER_KUU


def jittered(A: jax.Array, jitter: float = JITTER_KUU) -> jax.Array:
    """A + jitter*I (reference: `Kuu + 1e-8*I` pattern)."""
    return A + jitter * jnp.eye(A.shape[-1], dtype=A.dtype)


def effective_jitter(dtype, base: float = JITTER_KUU) -> float:
    """Dtype-aware jitter: the reference's 1e-8 is meaningless below float32
    resolution (ε ≈ 1.2e-7), so the f32 fast path scales it up to keep
    near-duplicate inducing inputs from making Kuu exactly singular."""
    eps = float(jnp.finfo(dtype).eps)
    return max(base, 300.0 * eps)


def chol_lower(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower Cholesky factor, optionally with added jitter.

    Equivalent of the reference's ``fastcholesky(Kuu).L``.
    """
    if jitter:
        A = jittered(A, jitter)
    return jnp.linalg.cholesky(A)


def chol_upper(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Upper Cholesky factor (reference's ``cholesky(Rv).U``)."""
    return chol_lower(A, jitter).mT


def tri_solve_lower(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L X = B with L lower triangular (reference: ``KuuL \\ B``)."""
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def tri_solve_upper(U: jax.Array, B: jax.Array) -> jax.Array:
    """Solve U X = B with U upper triangular."""
    return jax.scipy.linalg.solve_triangular(U, B, lower=False)


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve A X = B given the lower Cholesky factor L of A.

    Equivalent of ``KuuL' \\ (KuuL \\ B)`` (reference: UniSGPnode.jl:189).
    """
    return tri_solve_upper(L.mT, tri_solve_lower(L, B))


def cholinv(A: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Inverse via Cholesky (reference: ReactiveMP ``cholinv``)."""
    L = chol_lower(A, jitter)
    return chol_solve(L, jnp.eye(A.shape[-1], dtype=A.dtype))


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """log det(A) from the lower Cholesky factor of A."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def jdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Flat dot product (reference: ``jdotavx``, gp_helperfunction.jl:125-131).

    On TPU the VPU/MXU handle the reduction; no SIMD macro needed.
    """
    return jnp.vdot(a, b)


def sym(A: jax.Array) -> jax.Array:
    """Symmetrize (guards accumulation error before Cholesky)."""
    return 0.5 * (A + A.mT)


@partial(jax.jit, static_argnames=())
def rv_chol_upper(mu_v: jax.Array, Sigma_v: jax.Array) -> jax.Array:
    """Uv = chol(Σ_v + μ_v μ_vᵀ).U — the reference's amortized statistic
    (GPnode/UniSGPnode.jl:62-73)."""
    Rv = Sigma_v + jnp.outer(mu_v, mu_v)
    return chol_upper(sym(Rv))


def solve_psd(A: jax.Array, B: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Solve A X = B for symmetric PSD A via Cholesky."""
    L = chol_lower(A, jitter)
    return chol_solve(L, B)


def spd_clamp(S: jax.Array, floor) -> jax.Array:
    """Eigenvalue-clamp a (batched) symmetric matrix to λ ≥ floor — a GUARD,
    not a floor: unlike a diagonal lift (S + εI), this repairs an
    arbitrarily indefinite S (advisor r4 #3 — the PIT smoother's
    fP − G·Pp·Gᵀ cancellation left deficits beyond a 1e-9 lift on the TPU
    backend's emulated f64). ``floor`` broadcasts over batch dims.

    D = 2 uses the closed-form symmetric eigensystem (S = m·I + r·U with
    U² = I): clamp the two eigenvalues, reconstruct — branchless, batched,
    no eigh lowering on backends with high per-op dispatch cost (the same
    motivation as quadrature._cholsqrt). Other D falls back to eigh."""
    D = S.shape[-1]
    floor = jnp.asarray(floor, S.dtype)
    if D == 2:
        a = S[..., 0, 0]
        b = 0.5 * (S[..., 0, 1] + S[..., 1, 0])
        c = S[..., 1, 1]
        m = 0.5 * (a + c)
        d = 0.5 * (a - c)
        r = jnp.sqrt(d * d + b * b)
        lo = jnp.maximum(m - r, floor)
        hi = jnp.maximum(m + r, floor)
        m_c, r_c = 0.5 * (hi + lo), 0.5 * (hi - lo)
        # U = [[d, b], [b, -d]]/r; at r → 0 the correction r_c·U → 0 too,
        # so guard the division and let the isotropic part carry the clamp
        safe_r = jnp.where(r > 0, r, 1.0)
        scale = jnp.where(r > 0, r_c / safe_r, 0.0)
        out = jnp.stack([
            jnp.stack([m_c + scale * d, scale * b], -1),
            jnp.stack([scale * b, m_c - scale * d], -1),
        ], -2)
        return out
    w, V = jnp.linalg.eigh(sym(S))
    w = jnp.maximum(w, floor[..., None] if jnp.ndim(floor) else floor)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w, V)


def block_trace_products(Rv: jax.Array, S: jax.Array, D: int, M: int) -> jax.Array:
    """Ψ4[i,j] = <Rv_block[i,j], Sᵀ> for a (DM,DM) matrix viewed as D×D grid
    of M×M blocks (reference: create_blockmatrix + `sum(Rv_i .* Ψ2')`,
    MultiSGPnode.jl:397)."""
    blocks = Rv.reshape(D, M, D, M)
    return jnp.einsum("imjn,mn->ij", blocks, S)


def sum_blocks_weighted(Rv: jax.Array, W: jax.Array, D: int, M: int) -> jax.Array:
    """Σ_{ij} W[i,j] * Rv_block[i,j] — an (M,M) matrix
    (reference: `sum(create_blockmatrix(Σ_v,D,M) .* W)`, MultiSGPnode.jl:180)."""
    blocks = Rv.reshape(D, M, D, M)
    return jnp.einsum("imjn,ij->mn", blocks, W)


def gershgorin_lambda_min(A: jax.Array) -> jax.Array:
    """A rigorous (possibly vacuous ≤ 0) lower bound on λ_min of symmetric
    ``A``: min_i (A_ii − Σ_{j≠i}|A_ij|). Exact for diagonal matrices — e.g.
    the trainers' I/50 prior precision → 0.02."""
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    off = jnp.sum(jnp.abs(A), axis=-1) - jnp.abs(d)
    return jnp.min(d - off, axis=-1)


def spd_inverse_ns(
    A: jax.Array,
    warm: jax.Array | None = None,
    iters: int = 30,
    tol: float | None = None,
    lambda_min: jax.Array | float | None = None,
) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix by (optionally
    spectrum-scaled) Newton–Schulz iteration — matmul-only, no factorization.

    Motivation (TPU-native): on this backend XLA lowers cholesky /
    triangular_solve to while-loops with thousands of tiny ops (~4 µs per-op
    dispatch ⇒ ~100 ms per factorization inside hot loops), while 600³
    matmuls run at ~20 TFLOP/s. X_{k+1} = X_k(2I − A X_k) converges
    quadratically with the safe SPD init X₀ = I/‖A‖∞ and is pure MXU work.

    ``lambda_min``: optional rigorous lower bound on λ_min(A) (e.g. the
    trainers' prior precision floor: Λ = Λ_prior + Σ PSD ⪰ Λ_prior, so
    :func:`gershgorin_lambda_min` of the prior is valid for every epoch's
    Λ). Enables the OPTIMALLY SCALED iteration: carrying a spectrum
    enclosure [a, b] ⊇ spec(A X_k), each step uses γ = 2/(a+b) and updates
    X ← γX(2I − γAX), mapping the enclosure to [4ab/(a+b)², 1] — the
    pre-asymptotic contraction becomes κ → κ/4 per iteration instead of
    plain Newton–Schulz's κ/2, halving the cold-start budget (~22 vs ~45
    iterations at the kin40k refresh's κ ~ 1e10; the dominant f64 cost of
    the headline trainer). An over-claimed bound only slows convergence
    below the tracked enclosure; it cannot diverge (γ·λ ≤ 2/(a+b)·b < 2).
    With ``lambda_min=None`` the enclosure starts at [1, 1], γ ≡ 1, and the
    update is arithmetically the classic iteration.

    ``warm``: previous estimate of A⁻¹ (e.g. from the last minibatch step).
    Used only when r = ‖I − A·warm‖_F < 0.5, else falls back to the cold
    init — a branchless jnp.where guard. (When scaling is enabled, an
    accepted warm start initializes the enclosure to [1−r, 1+r].)

    ``tol``: optional early exit — stop once ‖I − A X‖_F < tol (checked on
    the residual the iteration computes anyway). With a good warm start the
    loop then costs ~2 iterations instead of the full cold-start budget;
    ``iters`` remains the hard cap. Uses ``lax.while_loop`` (sequential
    anyway, TPU-legal) instead of the fixed-length scan.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    # full-precision matmuls: TPU f32 dots default to bfloat16 passes
    # (ε≈8e-3), which stalls/diverges the iteration on ill-conditioned input
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    norm_inf = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    one = jnp.asarray(1.0, A.dtype)
    # The scaled iteration rides the edge of the stability region: the top of
    # the enclosure maps through γ·b = 2b/(a+b), i.e. a safety margin of only
    # 2 − γb ≈ 2a below the divergence threshold λ = 2. That is fine in f64
    # (margin ≥ 2·κ⁻¹ ~ 1e-10 ≫ ε₆₄) but NOT in f32, where rounding ~ε₃₂·λ
    # can push an eigenvalue past 2 and the iteration then diverges to a
    # FINITE indefinite X the isfinite guard cannot see (observed: the banana
    # trainer's f32 Kuu inverse, κ ~ 1/jitter, silently corrupting θ
    # gradients). Scaling therefore requires f64.
    f64_ok = float(jnp.finfo(A.dtype).eps) < 1e-9
    if lambda_min is None or not f64_ok:
        scale_on = jnp.asarray(False)
        a_cold = b_cold = one  # γ ≡ 1: the classic unscaled iteration
        lambda_min = None
    else:
        lm = jnp.asarray(lambda_min, A.dtype)
        # vacuous bound (≤ 0) → enclosure (1, 1) → unscaled (bit-compatible
        # with lambda_min=None, so a sentinel −1.0 disables scaling cleanly)
        scale_on = lm > 0
        a_cold = jnp.where(scale_on, lm / norm_inf, one)
        b_cold = one  # spec(A/‖A‖∞) ≤ 1
    X0, a0, b0 = eye / norm_inf, a_cold, b_cold
    if warm is not None:
        R = eye - mm(A, warm)
        r = jnp.sqrt(jnp.sum(R * R))
        ok = r < 0.5
        X0 = jnp.where(ok, warm, X0)
        if lambda_min is not None:
            # ‖I − A·warm‖_F ≥ spectral radius → spec(A·warm) ⊆ [1−r, 1+r]
            ok_s = jnp.logical_and(ok, scale_on)
            a0 = jnp.where(ok_s, one - r, a0)
            b0 = jnp.where(ok_s, one + r, b0)

    X0_cold = eye / norm_inf

    def step(X, a, b):
        gamma = 2.0 / (a + b)
        R = eye - mm(A, X)
        rnorm = jnp.sqrt(jnp.sum(R * R))
        # γX(2I − γAX) = γ((2−γ)X + γ·XR); γ = 1 → the classic X + XR
        Xn = gamma * ((2.0 - gamma) * X + gamma * mm(X, R))
        an = 4.0 * a * b / (a + b) ** 2
        bn = one
        # branchless divergence guard: rounding can kick an eigenvalue of AX
        # past 2, after which the iteration explodes — restart cold
        ok = jnp.isfinite(jnp.sum(Xn))
        return (jnp.where(ok, Xn, X0_cold), rnorm,
                jnp.where(ok, an, a_cold), jnp.where(ok, bn, b_cold))

    if tol is None:
        def body(c, _):
            X, a, b = c
            Xn, _, an, bn = step(X, a, b)
            return (Xn, an, bn), None

        (X, _, _), _ = jax.lax.scan(body, (X0, a0, b0), None, length=iters)
    else:
        def cond(carry):
            X, k, rnorm, a, b = carry
            # NOT(rnorm < tol) so a NaN residual (divergence → cold restart)
            # keeps iterating instead of exiting early
            return jnp.logical_and(k < iters, jnp.logical_not(rnorm < tol))

        def body(carry):
            X, k, _, a, b = carry
            Xn, rnorm, an, bn = step(X, a, b)
            return Xn, k + 1, rnorm, an, bn

        X, _, _, _, _ = jax.lax.while_loop(
            cond, body,
            (X0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, A.dtype),
             a0, b0),
        )
    return sym(X)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _spd_inverse_d(A: jax.Array, warm: jax.Array, lam: jax.Array,
                   iters: int, tol) -> jax.Array:
    return spd_inverse_ns(A, warm, iters, tol=tol, lambda_min=lam)


def _spd_inverse_fwd(A, warm, lam, iters, tol):
    X = spd_inverse_ns(A, warm, iters, tol=tol, lambda_min=lam)
    return X, X


def _spd_inverse_bwd(iters, tol, X, g):
    # inverse-function identity on the primal output: Ā = −A⁻¹ Ḡ A⁻¹ —
    # two matmuls, no differentiation through the iteration (full precision:
    # bf16 default passes add visible gradient noise)
    mm = _partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return (-mm(mm(X, g), X), jnp.zeros_like(X), jnp.zeros((), X.dtype))


_spd_inverse_d.defvjp(_spd_inverse_fwd, _spd_inverse_bwd)


def spd_inverse(
    A: jax.Array,
    warm: jax.Array | None = None,
    iters: int = 30,
    tol: float | None = None,
    lambda_min: jax.Array | float | None = None,
) -> jax.Array:
    """Differentiable SPD inverse (Newton–Schulz forward — optimally scaled
    when a rigorous ``lambda_min`` bound is given — analytic VJP)."""
    if warm is None:
        warm = jnp.zeros_like(A)  # guard rejects it (‖I‖_F ≥ 0.5) → cold init
    if lambda_min is None:
        lam = jnp.asarray(-1.0, A.dtype)  # ≤ 0 sentinel: scaling off
    else:
        lam = jnp.asarray(lambda_min, A.dtype)
    return _spd_inverse_d(A, warm, lam, iters, tol)


def ir_solve(A64: jax.Array, b64: jax.Array, M32: jax.Array, rounds: int = 3) -> jax.Array:
    """Mixed-precision iterative refinement for A x = b.

    ``M32`` is an approximate inverse of A in float32 (e.g. a Newton–Schulz
    estimate whose residual ‖I − A·M‖ may be large for κ ≫ 1/ε₃₂). Residuals
    are computed with ONE float64 mat-vec per round — cheap even where f64 is
    software-emulated — so x converges at rate ‖I − A·M‖ to f64 accuracy:

        x ← x + M·(b − A x)₆₄
    """
    hi = jax.lax.Precision.HIGHEST
    x = jnp.matmul(M32, b64.astype(M32.dtype), precision=hi).astype(b64.dtype)

    def resid(x):
        return b64 - jnp.matmul(A64, x, precision=hi)

    def body(carry, _):
        # the residual of the CURRENT iterate rides in the carry, so each
        # round costs exactly one f64 mat-vec (resid of the candidate)
        x, r, rnorm = carry
        dx = jnp.matmul(M32, r.astype(M32.dtype), precision=hi)
        x_new = x + dx.astype(b64.dtype)
        r_new = resid(x_new)
        rn_new = jnp.sum(r_new * r_new)
        # safeguard: when M is a poor preconditioner (early cold batches) the
        # refinement diverges — keep the previous iterate in that case
        ok = rn_new < rnorm
        x = jnp.where(ok, x_new, x)
        r = jnp.where(ok, r_new, r)
        return (x, r, jnp.minimum(rn_new, rnorm)), None

    r0 = resid(x)
    (x, _, _), _ = jax.lax.scan(
        body, (x, r0, jnp.sum(r0 * r0)), None, length=rounds
    )
    return x


def sum_diagonal_blocks(V: jax.Array, M: int) -> jax.Array:
    """Σ_i V[block i of rows, column i] — an (M,) vector
    (reference: sum_diagonal_M, derivative_helper.jl:119-122)."""
    D = V.shape[1]
    return jnp.einsum("imi->m", V.reshape(D, M, D))


def trace_blocks(Rv: jax.Array, D: int, M: int) -> jax.Array:
    """(D,D) matrix of block traces: out[i,j] = tr(Rv_block[i,j])
    (reference: trace_blkmatrix, derivative_helper.jl:125-127)."""
    return jnp.einsum("imjm->ij", Rv.reshape(D, M, D, M))
