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
The distributed linear algebra never materializes an un-sharded matrix:
matrix×matrix products run as a **ppermute ring** over the right operand's
row blocks (each step: one local (m, ·) tile matmul + one neighbor
exchange riding ICI — the classic SUMMA discipline), so per-chip peak
memory stays O(M²/P) for the solve and O(M·N/P) for the Gram stage, and
the only full-width transients are (m, M) row blocks. Collectives used:

    ppermute    — ring-circulate the right operand's row blocks
    all_gather  — vectors only ((M,) gathers in the IR refinement), plus
                  ONE (m, M)→(M, M)-sliced gather for the final
                  cross-shard symmetrization
    psum / pmax — scalar reductions (residual norms, ‖A‖∞, finite guards)
                  and the predictive contraction

Per Newton–Schulz iteration the communication is two ring passes of the
(M/P, M) blocks (16·M²·(P−1)/P bytes) against 4·M³/P local matmul FLOPs —
the compute:comms ratio grows linearly in M, so the iteration is
ICI-friendly exactly in the regime TP is for (large M). The θ-objective
deliberately STAYS data-parallel (``sharding.py``): it is a pure data sum
with N ≫ M, so the natural decomposition there is the batch axis; TP
targets the refresh and the memory footprint.

Accumulation dtype: when x64 is enabled the natural-parameter/solve chain
is anchored to f64 regardless of the input dtype — the same ``acc_dt``
policy as the fast trainers (infer/minibatch.py) — because the unscaled
f32 Newton–Schulz stalls at κ·ε₃₂ and the scaled variant is f64-gated
outright (ops/linalg.py's f32 divergence pathology, DEVIATIONS #22).

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


def _acc_dtype(*args):
    """The trainers' accumulation-dtype policy: promote to f64 whenever x64
    is enabled (an f32 Newton–Schulz chain at sparse-GP conditioning is the
    silent-corruption hazard documented in ops/linalg.py)."""
    dt = jnp.result_type(*args)
    if jax.config.jax_enable_x64:
        dt = jnp.promote_types(dt, jnp.float64)
    return dt


def _eye_rows(M: int, m: int, axis: str, dtype) -> jax.Array:
    """This shard's m rows of I_M (global row offset from the mesh position)."""
    i0 = jax.lax.axis_index(axis) * m
    rows = i0 + jnp.arange(m)
    return (rows[:, None] == jnp.arange(M)[None, :]).astype(dtype)


def _ring_matmul(A_loc, B_loc, axis: str, n_shards: int):
    """Row block of A @ B with BOTH operands row-sharded, via a ppermute ring.

    ``A_loc``: this shard's (m, M) rows of A; ``B_loc``: its (M/P, K) rows
    of B. Circulates B's row blocks ring-wise; each step contracts the
    matching (m, M/P) column slice of A_loc — B is never materialized.
    Each output element is still ONE dot product per ring step, summed over
    P partials (vs the dense single contraction — a κ-amplifiable ulp-level
    reassociation, bounded in tests/test_tensor_parallel.py).
    """
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    m = A_loc.shape[0]
    mb = B_loc.shape[0]
    rank = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    B_cur = B_loc
    out = jnp.zeros((m, B_loc.shape[1]), jnp.result_type(A_loc, B_loc))
    for s in range(n_shards):
        j = (rank - s) % n_shards  # which row block of B we hold this step
        j32 = (j * mb).astype(jnp.int32)
        A_slice = jax.lax.dynamic_slice(A_loc, (jnp.int32(0), j32), (m, mb))
        out = out + mm(A_slice, B_cur)
        if s < n_shards - 1:
            B_cur = jax.lax.ppermute(B_cur, axis, perm)
    return out


def _ring_gram_cols(K_loc, axis: str, n_shards: int, w_val):
    """Row block of w·K Kᵀ from row-sharded K, via the same ring.

    ``K_loc``: (m, N) rows of the Gram factor. Step s computes the (m, m)
    tile against the circulating block j and writes it into columns
    [j·m, (j+1)·m) — each Λ element is a single dot product, identical to
    the dense arithmetic. K is never gathered (the full (M, N) Gram would
    be the dominant memory/comms term in the N ≫ M regime TP targets).
    """
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    m = K_loc.shape[0]
    rank = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    K_cur = K_loc
    prec = jnp.zeros((m, m * n_shards), K_loc.dtype)
    for s in range(n_shards):
        j = (rank - s) % n_shards
        tile = w_val * mm(K_loc, K_cur.T)
        prec = jax.lax.dynamic_update_slice(
            prec, tile, (jnp.int32(0), (j * m).astype(jnp.int32)))
        if s < n_shards - 1:
            K_cur = jax.lax.ppermute(K_cur, axis, perm)
    return prec


def _sym_rows(X_loc, axis: str):
    """½(X + Xᵀ) on a row-sharded square matrix.

    The one place a full (M, M) transient appears: a single all_gather to
    read this shard's COLUMN block. Once per solve (not per iteration).
    """
    m = X_loc.shape[0]
    X_full = jax.lax.all_gather(X_loc, axis, tiled=True)
    i0 = jax.lax.axis_index(axis) * m
    cols = jax.lax.dynamic_slice_in_dim(X_full, i0, m, axis=1)
    return 0.5 * (X_loc + cols.T)


def _ns_inverse_rows(A_loc: jax.Array, axis: str, n_shards: int, iters: int,
                     lambda_min=None) -> jax.Array:
    """Distributed Newton–Schulz SPD inverse on a row-sharded matrix.

    ``A_loc``: this shard's (m, M) row block of a symmetric positive-definite
    A. Returns the matching row block of A⁻¹. The arithmetic is
    ``ops.linalg.spd_inverse_ns`` (optionally spectrum-scaled when a rigorous
    ``lambda_min`` bound is supplied and the dtype is f64 — same gating, see
    DEVIATIONS #22) with each matmul ring-distributed (:func:`_ring_matmul`);
    the iterate X stays row-sharded throughout.
    """
    m, M = A_loc.shape
    eye_loc = _eye_rows(M, m, axis, A_loc.dtype)
    one = jnp.asarray(1.0, A_loc.dtype)

    norm_inf = jax.lax.pmax(jnp.max(jnp.sum(jnp.abs(A_loc), axis=-1)), axis)
    f64_ok = float(jnp.finfo(A_loc.dtype).eps) < 1e-9
    if lambda_min is None or not f64_ok:
        a_cold = b_cold = one
    else:
        lm = jnp.asarray(lambda_min, A_loc.dtype)
        a_cold = jnp.where(lm > 0, lm / norm_inf, one)
        b_cold = one
    X0_loc = eye_loc / norm_inf

    def step(carry, _):
        X_loc, a, b = carry
        gamma = 2.0 / (a + b)
        R_loc = eye_loc - _ring_matmul(A_loc, X_loc, axis, n_shards)
        XR_loc = _ring_matmul(X_loc, R_loc, axis, n_shards)
        Xn_loc = gamma * ((2.0 - gamma) * X_loc + gamma * XR_loc)
        an = 4.0 * a * b / (a + b) ** 2
        # branchless divergence guard (global): restart cold, as in
        # spd_inverse_ns
        ok = jnp.isfinite(jax.lax.psum(jnp.sum(Xn_loc), axis))
        return (jnp.where(ok, Xn_loc, X0_loc), jnp.where(ok, an, a_cold),
                jnp.where(ok, one, b_cold)), None

    (X_loc, _, _), _ = jax.lax.scan(step, (X0_loc, a_cold, b_cold), None,
                                    length=iters)
    return _sym_rows(X_loc, axis)


def _tp_solve(prec_loc, xi_loc, axis: str, n_shards: int, ns_iters: int,
              lambda_min, ir_rounds: int):
    """The shared row-sharded solve: symmetrize Λ across shards, invert by
    the distributed Newton–Schulz, recover μ by mixed iterative refinement
    (vector all_gathers only). Used by both sweeps so the numerics cannot
    fork."""
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    prec_loc = _sym_rows(prec_loc, axis)
    cov_loc = _ns_inverse_rows(prec_loc, axis, n_shards, ns_iters, lambda_min)
    xi_full = jax.lax.all_gather(xi_loc, axis, tiled=True)
    mu_loc = mm(cov_loc, xi_full)
    for _ in range(ir_rounds):
        mu_full = jax.lax.all_gather(mu_loc, axis, tiled=True)
        r_loc = xi_loc - mm(prec_loc, mu_full)
        r_full = jax.lax.all_gather(r_loc, axis, tiled=True)
        mu_loc = mu_loc + mm(cov_loc, r_full)
    return mu_loc, cov_loc, prec_loc


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
      2. ξ_loc = w·K_loc y (local); Λ rows = w·(ring over K blocks) + prior
         rows (:func:`_ring_gram_cols` — the full Gram is never gathered).
      3–4. the shared row-sharded solve (:func:`_tp_solve`).
    """
    M = Xu.shape[0]
    n = mesh.shape[axis]
    if M % n:
        raise ValueError(f"M={M} does not shard evenly over {n} devices")
    dt = _acc_dtype(X.dtype, jnp.asarray(w_val).dtype)
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def body(Xu_loc):
        m = Xu_loc.shape[0]
        K_loc = kernel(theta, Xu_loc, X).astype(dt)        # (m, N)
        xi_loc = w_val * mm(K_loc, y.astype(dt))           # (m,)
        prec_loc = (_ring_gram_cols(K_loc, axis, n, w_val)
                    + _eye_rows(M, m, axis, dt) / prior_var)   # (m, M)
        mu_loc, cov_loc, prec_loc = _tp_solve(
            prec_loc, xi_loc, axis, n, ns_iters, lambda_min, ir_rounds)
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
    or column anywhere — and the natural-parameter increments become

        ξ_row  = psum_dp( w · K_tile y_loc )
        Λ_row  = psum_dp( w · ring_tp(K_tile tiles) )

    after which the tp-only shared solve runs on the reduced row blocks
    (dp replicas do identical work on the dp-invariant state, exactly like
    the replicated q(v) solve in ``sharding.dp_regression_sweep``). Outputs
    are row-sharded over tp and replicated over dp.
    """
    M = Xu.shape[0]
    nt = mesh.shape[tp_axis]
    nd = mesh.shape[dp_axis]
    if M % nt:
        raise ValueError(f"M={M} does not shard evenly over {nt} devices")
    if X.shape[0] % nd:
        raise ValueError(
            f"N={X.shape[0]} does not shard evenly over {nd} devices")
    dt = _acc_dtype(X.dtype, jnp.asarray(w_val).dtype)
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def body(Xu_loc, X_loc, y_loc):
        m = Xu_loc.shape[0]
        K_tile = kernel(theta, Xu_loc, X_loc).astype(dt)   # (m, N/Pd)
        xi_loc = jax.lax.psum(w_val * mm(K_tile, y_loc.astype(dt)), dp_axis)
        prec_loc = (jax.lax.psum(
                        _ring_gram_cols(K_tile, tp_axis, nt, w_val), dp_axis)
                    + _eye_rows(M, m, tp_axis, dt) / prior_var)  # (m, M)
        mu_loc, cov_loc, prec_loc = _tp_solve(
            prec_loc, xi_loc, tp_axis, nt, ns_iters, lambda_min, ir_rounds)
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
    (mean (N*,), var (N*,)) — the :out rule N(K(Xu,x*)ᵀμ_v, w̄⁻¹)
    (UniSGPnode.jl:96-104) where each shard contributes its m-row partial
    inner product. The variance is per-point, matching the dense
    ``batch_vmp.predict_out`` signature so the two paths are drop-in
    interchangeable.
    """
    def body(Xu_loc, mu_loc):
        Kst = kernel(theta, Xu_loc, X_test)                # (m, N*)
        part = jnp.matmul(Kst.T, mu_loc,
                          precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(part, axis)

    mean = jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis, None), P(axis)), out_specs=P(),
    )(Xu, mu_v)
    return mean, jnp.full_like(mean, 1.0 / w_mean)
