"""Tensor-parallel (inducing-dimension) sparse-GP inference over a mesh.

The third parallel axis, completing data parallelism (``sharding.py``, the
N axis) and sequence parallelism (``seq_parallel.py``, the GPSSM time
axis): here the MODEL dimension M — the inducing set — is sharded. The
reference is single-process Julia with no distributed backend
(SURVEY.md §2.9), and at its scale (M ≤ 600) one chip is the right answer;
this module is the scaling slot BEYOND reference scale, where the q(v)
refresh is O(M³) f64 compute and Σ_v is O(M²) memory per chip.

Layout: every M-dimensional object lives row-sharded over the mesh axis —
``Xu`` as (M/P, D) blocks, ξ as (M/P,), Λ / Σ / Kuu as (M/P, M) row blocks.
All distributed linear algebra reduces to three collective primitives:

    all_gather  — materialize the RIGHT operand of a row-block matmul
                  (A_loc @ gather(X): rows of A·X stay local)
    psum        — partial reductions over the M axis (predictive means,
                  residual norms, finite checks)
    pmax        — the ‖A‖∞ bound seeding the Newton–Schulz iteration

Per Newton–Schulz iteration the communication is two all_gathers of an
M×M f64 matrix (16·M² bytes) against 4·M³/P local matmul FLOPs — the
compute:comms ratio grows linearly in M/P, so the iteration is
ICI-friendly exactly in the regime TP is for (large M). The θ-objective
deliberately STAYS data-parallel (``sharding.py``): it is a pure data sum
with N ≫ M, so the natural decomposition there is the batch axis; TP
targets the refresh and the memory footprint.

Reference semantics carried over unchanged: the natural-parameter update
ξ += w·K y, Λ += w·K Kᵀ is the UniSGP :v rule's batch accumulation
(UniSGPnode.jl:144-158 summed, DEVIATIONS #3), the inverse is the same
(optionally spectrum-scaled) Newton–Schulz as ``ops.linalg.spd_inverse_ns``
with its branchless divergence guard, and prediction is the :out rule
(UniSGPnode.jl:96-104) with the M-contraction psum'd.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_inducing", "tp_regression_sweep", "dp_tp_regression_sweep",
           "tp_predict"]


def shard_inducing(mesh: Mesh, *arrays, axis: str = "tp"):
    """Place arrays with their leading (inducing, M) dimension sharded.

    Requires M to divide evenly over the mesh axis (the row-block identity
    construction below assumes equal shards).
    """
    n = mesh.shape[axis]
    out = []
    for a in arrays:
        if a.shape[0] % n:
            raise ValueError(
                f"leading dim {a.shape[0]} does not shard evenly over "
                f"{n} devices on axis {axis!r}"
            )
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out[0] if len(out) == 1 else tuple(out)


def _eye_rows(M: int, m: int, axis: str, dtype) -> jax.Array:
    """This shard's m rows of I_M (global row offset from the mesh position)."""
    i0 = jax.lax.axis_index(axis) * m
    rows = i0 + jnp.arange(m)
    return (rows[:, None] == jnp.arange(M)[None, :]).astype(dtype)


def _ns_inverse_rows(A_loc: jax.Array, axis: str, iters: int,
                     lambda_min=None) -> jax.Array:
    """Distributed Newton–Schulz SPD inverse on a row-sharded matrix.

    ``A_loc``: this shard's (m, M) row block of a symmetric positive-definite
    A. Returns the matching row block of A⁻¹. The arithmetic is
    ``ops.linalg.spd_inverse_ns`` (optionally spectrum-scaled when a rigorous
    ``lambda_min`` bound is supplied and the dtype is f64 — same gating, see
    DEVIATIONS #22) with each matmul row-blocked: the left operand stays
    local, the right operand is all_gathered.
    """
    m, M = A_loc.shape
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    eye_loc = _eye_rows(M, m, axis, A_loc.dtype)
    one = jnp.asarray(1.0, A_loc.dtype)

    norm_inf = jax.lax.pmax(jnp.max(jnp.sum(jnp.abs(A_loc), axis=-1)), axis)
    f64_ok = float(jnp.finfo(A_loc.dtype).eps) < 1e-9
    if lambda_min is None or not f64_ok:
        scale_on = jnp.asarray(False)
        a_cold = b_cold = one
    else:
        lm = jnp.asarray(lambda_min, A_loc.dtype)
        scale_on = lm > 0
        a_cold = jnp.where(scale_on, lm / norm_inf, one)
        b_cold = one
    del scale_on
    X0_loc = eye_loc / norm_inf

    def step(carry, _):
        X_loc, a, b = carry
        gamma = 2.0 / (a + b)
        X_full = jax.lax.all_gather(X_loc, axis, tiled=True)  # (M, M)
        R_loc = eye_loc - mm(A_loc, X_full)
        R_full = jax.lax.all_gather(R_loc, axis, tiled=True)
        Xn_loc = gamma * ((2.0 - gamma) * X_loc + gamma * mm(X_loc, R_full))
        an = 4.0 * a * b / (a + b) ** 2
        # branchless divergence guard (global): restart cold, as in
        # spd_inverse_ns
        ok = jnp.isfinite(jax.lax.psum(jnp.sum(Xn_loc), axis))
        return (jnp.where(ok, Xn_loc, X0_loc), jnp.where(ok, an, a_cold),
                jnp.where(ok, one, b_cold)), None

    (X_loc, _, _), _ = jax.lax.scan(step, (X0_loc, a_cold, b_cold), None,
                                    length=iters)
    # symmetrize across the sharding: ½(X + Xᵀ) needs this shard's COLUMNS,
    # i.e. the gathered matrix's [:, i0:i0+m] block transposed
    X_full = jax.lax.all_gather(X_loc, axis, tiled=True)
    i0 = jax.lax.axis_index(axis) * m
    cols = jax.lax.dynamic_slice_in_dim(X_full, i0, m, axis=1)
    return 0.5 * (X_loc + cols.T)


def tp_regression_sweep(kernel, theta, Xu, X, y, prior_var: float, w_val,
                        mesh: Mesh, axis: str = "tp", ns_iters: int = 40,
                        lambda_min=None, ir_rounds: int = 2):
    """One tensor-parallel VMP sweep for the conjugate regression model.

    ``Xu`` must be row-sharded over ``axis`` (see :func:`shard_inducing`);
    ``X`` (N, D), ``y`` (N,) and ``theta`` are replicated. The prior is the
    reference's isotropic v-prior MvN(0, prior_var·I) (GPT_regression.ipynb
    cell 6). Returns row-sharded global arrays ``(mu, cov, xi, prec)`` —
    μ_v (M,), Σ_v (M, M), and the natural parameters; ``np.asarray`` on any
    of them materializes the full object for host use.

    Inside the single shard_map:
      1. Gram rows K_loc = K(Xu_loc, X): shard-local, zero comms.
      2. ξ_loc = w·K_loc y (local); Λ_loc = w·K_loc·gather(K)ᵀ + prior rows
         (one all_gather of the Gram).
      3. Σ row block by the distributed Newton–Schulz above.
      4. μ by mixed iterative refinement: μ ← μ + Σ(ξ − Λμ), each product
         row-blocked (vector all_gathers only).
    """
    M = Xu.shape[0]
    n = mesh.shape[axis]
    if M % n:
        raise ValueError(f"M={M} does not shard evenly over {n} devices")
    dt = jnp.result_type(X.dtype, jnp.asarray(w_val).dtype)
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def body(Xu_loc):
        m = Xu_loc.shape[0]
        K_loc = kernel(theta, Xu_loc, X).astype(dt)        # (m, N)
        xi_loc = w_val * mm(K_loc, y.astype(dt))           # (m,)
        K_full = jax.lax.all_gather(K_loc, axis, tiled=True)   # (M, N)
        prec_loc = (w_val * mm(K_loc, K_full.T)
                    + _eye_rows(M, m, axis, dt) / prior_var)   # (m, M)
        # symmetrize the accumulated precision (as sym() on the dense path)
        prec_full = jax.lax.all_gather(prec_loc, axis, tiled=True)
        i0 = jax.lax.axis_index(axis) * m
        prec_loc = 0.5 * (prec_loc
                          + jax.lax.dynamic_slice_in_dim(prec_full, i0, m, 1).T)
        cov_loc = _ns_inverse_rows(prec_loc, axis, ns_iters, lambda_min)
        xi_full = jax.lax.all_gather(xi_loc, axis, tiled=True)
        mu_loc = mm(cov_loc, xi_full)
        for _ in range(ir_rounds):
            mu_full = jax.lax.all_gather(mu_loc, axis, tiled=True)
            r_loc = xi_loc - mm(prec_loc, mu_full)
            r_full = jax.lax.all_gather(r_loc, axis, tiled=True)
            mu_loc = mu_loc + mm(cov_loc, r_full)
        return mu_loc, cov_loc, xi_loc, prec_loc

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis), P(axis, None), P(axis), P(axis, None)),
    )(Xu)


def dp_tp_regression_sweep(kernel, theta, Xu, X, y, prior_var: float, w_val,
                           mesh: Mesh, dp_axis: str = "dp",
                           tp_axis: str = "tp", ns_iters: int = 40,
                           lambda_min=None, ir_rounds: int = 2):
    """The 2-D composition: data AND inducing dimensions sharded at once.

    ``mesh`` is 2-D (``dp_axis``, ``tp_axis``); ``Xu`` is row-sharded over
    ``tp_axis`` (replicated over dp), ``X``/``y`` are sharded over
    ``dp_axis`` (replicated over tp). Each device computes the Gram tile
    K(Xu_loc, X_loc) — (M/Pt, N/Pd), never materializing a full Gram row
    OR column anywhere — and the natural-parameter increments become

        ξ_row  = psum_dp( w · K_tile y_loc )
        Λ_row  = psum_dp( w · K_tile · gather_tp(K_tile)ᵀ )

    after which the solve is the tp-only distributed Newton–Schulz /
    iterative refinement of :func:`tp_regression_sweep` (dp replicas do
    identical work on the dp-invariant reduced state, exactly like the
    replicated q(v) solve in ``sharding.dp_regression_sweep``). Outputs are
    row-sharded over tp and replicated over dp.
    """
    M = Xu.shape[0]
    nt = mesh.shape[tp_axis]
    nd = mesh.shape[dp_axis]
    if M % nt:
        raise ValueError(f"M={M} does not shard evenly over {nt} devices")
    if X.shape[0] % nd:
        raise ValueError(
            f"N={X.shape[0]} does not shard evenly over {nd} devices")
    dt = jnp.result_type(X.dtype, jnp.asarray(w_val).dtype)
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def body(Xu_loc, X_loc, y_loc):
        m = Xu_loc.shape[0]
        K_tile = kernel(theta, Xu_loc, X_loc).astype(dt)   # (m, N/Pd)
        xi_loc = jax.lax.psum(w_val * mm(K_tile, y_loc.astype(dt)), dp_axis)
        K_col = jax.lax.all_gather(K_tile, tp_axis, tiled=True)  # (M, N/Pd)
        prec_loc = (jax.lax.psum(w_val * mm(K_tile, K_col.T), dp_axis)
                    + _eye_rows(M, m, tp_axis, dt) / prior_var)  # (m, M)
        prec_full = jax.lax.all_gather(prec_loc, tp_axis, tiled=True)
        i0 = jax.lax.axis_index(tp_axis) * m
        prec_loc = 0.5 * (prec_loc
                          + jax.lax.dynamic_slice_in_dim(prec_full, i0, m, 1).T)
        cov_loc = _ns_inverse_rows(prec_loc, tp_axis, ns_iters, lambda_min)
        xi_full = jax.lax.all_gather(xi_loc, tp_axis, tiled=True)
        mu_loc = mm(cov_loc, xi_full)
        for _ in range(ir_rounds):
            mu_full = jax.lax.all_gather(mu_loc, tp_axis, tiled=True)
            r_loc = xi_loc - mm(prec_loc, mu_full)
            r_full = jax.lax.all_gather(r_loc, tp_axis, tiled=True)
            mu_loc = mu_loc + mm(cov_loc, r_full)
        return mu_loc, cov_loc, xi_loc, prec_loc

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(tp_axis, None), P(dp_axis, None), P(dp_axis)),
        out_specs=(P(tp_axis), P(tp_axis, None), P(tp_axis),
                   P(tp_axis, None)),
    )(Xu, X, y)


def tp_predict(kernel, theta, Xu, mu_v, w_mean, X_test, mesh: Mesh,
               axis: str = "tp"):
    """UniSGP :out prediction with the M-contraction psum'd over the mesh.

    ``Xu`` (M, D) and ``mu_v`` (M,) row-sharded; returns replicated
    (mean (N*,), var scalar) — the :out rule N(K(Xu,x*)ᵀμ_v, w̄⁻¹)
    (UniSGPnode.jl:96-104) where each shard contributes its m-row partial
    inner product.
    """
    def body(Xu_loc, mu_loc):
        Kst = kernel(theta, Xu_loc, X_test)                # (m, N*)
        part = jnp.matmul(Kst.T, mu_loc,
                          precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(part, axis)

    mean = jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis, None), P(axis)), out_specs=P(),
    )(Xu, mu_v)
    return mean, 1.0 / w_mean
