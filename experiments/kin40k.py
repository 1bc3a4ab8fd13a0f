"""kin40k large-scale regression — the reference's regression_kin40k.ipynb.

Config (reference cells 3-10): N=10,000 train / 30,000 test, 8-D inputs,
M=600 random inducing points, minibatch 500 (20 batches), w fixed at 1e4
(PointMass), ARD-SE kernel (9 θ params, softplus), 500 epochs of
[1 VMP sweep warm-started q(v), reset to the prior each epoch + AdaMax step
on θ]. Julia wall-clock ≈ 3 h 30 m; SMSE 0.083431 (BASELINE.md); the
VSGP/ApproximateGPs baseline reaches 0.087478 in ≈ 5 h.

Two trainers (gaussianprocessnode_tpu/infer/minibatch.py); on one TPU chip:
- ``--faithful``: per-batch schedule exactly as the reference —
  SMSE 0.08182 @ 500 epochs (= the exact-arithmetic oracle's 0.08181) in
  ~470 s;
- default fast path (ONE grand SPECTRUM-SCALED q(v) statistics refresh per
  epoch — the identical order-free fixed point): SMSE 0.0798 @ 500 epochs
  in ~20.2 s warm (622× the reference; +6.8 s cold compile from the
  committed AOT executables, BENCH r3). (Per-epoch refresh also converges
  slightly BETTER than 4 refreshes/epoch, 0.0798 vs 0.0816: the mid-epoch
  quarter-statistics inject feedback noise into the w-weighted θ steps.)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the kin40k training program is large
# (~10-20 s of XLA compile per executable through the device tunnel);
# caching it on disk makes every later invocation start in ~1 s.
# seed_cache pre-populates it from the COMMITTED AOT executables
# (benchmarks/aot_cache/) so even a fresh clone skips the ~200 s
# first-ever compile of the benchmarked configuration.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussianprocessnode_tpu.utils.aot_cache import seed_cache as _seed_cache

_seed_cache("/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.infer.batch_vmp import predict_out
from gaussianprocessnode_tpu.infer.minibatch import (
    fit_kin40k,
    fit_kin40k_fast,
    init_kin40k_fast_state,
)
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus, softplus
from gaussianprocessnode_tpu.ops.linalg import ir_solve, spd_inverse_ns, sym
from gaussianprocessnode_tpu.utils.datasets import kin40k
from gaussianprocessnode_tpu.utils.driver import chunked_run
from gaussianprocessnode_tpu.utils.metrics import smse
from gaussianprocessnode_tpu.utils.profiling import block_via_host


def run(epochs: int = 1000, m_inducing: int = 600, batch_size: int = 500,
        n_train: int = 10_000, dtype=None, seed: int = 1, faithful: bool = False,
        learning_rate: float = 0.001, stats_refreshes: int = 1,
        warm_timing: bool = False, verbose: bool = True, xu=None,
        ns_budget: int = 34):
    """``xu``: optional explicit inducing inputs (M, 8) — pass the
    reference's own saved draw (savefiles/Xu_kin40k.jld, the exact Xu behind
    its golden posterior qv_kin40k.jld) for trajectory-level parity runs;
    default draws M random training points like regression_kin40k.ipynb
    cell 5."""
    data = kin40k()
    if dtype is None:
        dtype = jnp.float64 if (faithful or "--f64" in sys.argv) else jnp.float32
    Xtr = jnp.asarray(data.x_train[:n_train], dtype)
    ytr = jnp.asarray(data.y_train[:n_train], dtype)
    Xte = jnp.asarray(data.x_test, dtype)
    yte = data.y_test

    if xu is not None:
        Xu = jnp.asarray(xu, dtype)
        m_inducing = Xu.shape[0]
    else:
        rng = np.random.default_rng(seed)
        pos = rng.permutation(n_train)[:m_inducing]
        Xu = jnp.asarray(data.x_train[pos], dtype)
    M = m_inducing

    B = n_train // batch_size
    Xb = Xtr[: B * batch_size].reshape(B, batch_size, -1)
    yb = ytr[: B * batch_size].reshape(B, batch_size)

    # use_pallas: SE Grams through the fused Mosaic kernel on TPU/f32 (jnp
    # fallback elsewhere). With full-f32 MXU passes it is f32-exact vs XLA
    # (bench.py asserts this on-device) and performance-par at the headline
    # shapes (0.68 vs 0.70 ms per 600×10000 Gram) — XLA's automatic fusion
    # already saturates this op; the kernel is kept live here so the claim
    # stays continuously verified.
    kernel = Kernel("se", transform="softplus", use_pallas=True)
    theta0 = invsoftplus(jnp.ones((1 + Xtr.shape[1],), dtype))
    prior_v = MvGaussianNat(jnp.zeros(M, dtype), jnp.eye(M, dtype=dtype) / 50.0)
    w_val = 1e4

    # chunked + retried through the shared driver (utils/driver.chunked_run):
    # long single executions hit the tunnel RPC deadline and the link faults
    # transiently; the carry state lives host-side so a chunk re-runs, and a
    # concrete initial carry makes every chunk share ONE compiled executable
    def _chunked(step_fn, chunk, state):
        return chunked_run(step_fn, epochs, chunk, state)

    def train():
        if faithful:
            theta, qv_nat, state = _chunked(
                lambda e, st: fit_kin40k(
                    kernel, theta0, Xu, Xb, yb, prior_v, w_val, e,
                    learning_rate=learning_rate, resume_state=st,
                    ns_budget=ns_budget,
                ),
                # budget-scaled chunk: the matmul-dense faithful program
                # sits in the ~54-63 s single-dispatch class (DEVIATIONS
                # #33); 50-epoch chunks ran ~50 s at budget 34 and CRASHED
                # the worker at budget 60 (~65+ s)
                max(10, int(50 * 34 / ns_budget)),
                None,
            )
            cov64 = None
        else:
            groups = max(1, min(stats_refreshes, B))
            state0 = init_kin40k_fast_state(theta0, prior_v, M, groups)
            theta, qv_nat, cov64, state = _chunked(
                lambda e, st: fit_kin40k_fast(
                    kernel, theta0, Xu, Xb, yb, prior_v, w_val, e,
                    learning_rate=learning_rate, stats_refreshes=stats_refreshes,
                    resume_state=st,
                ),
                100,
                state0,
            )
        block_via_host(theta)
        return theta, qv_nat, cov64

    t0 = time.time()
    theta, qv_nat, cov64 = train()
    train_s = time.time() - t0
    first_s = train_s
    if warm_timing:  # re-run against the cached executable: pure device time
        t0 = time.time()
        theta, qv_nat, cov64 = train()
        train_s = time.time() - t0

    # posterior recovery + prediction as ONE jitted program: run eagerly
    # these ~300 small ops each pay the device-tunnel dispatch latency
    # (~20 s); fused they are a few milliseconds
    import functools

    @functools.partial(jax.jit, static_argnames=("recompute_cov",))
    def recover_and_predict(qv_nat, cov64, theta, recompute_cov: bool):
        prec = sym(qv_nat.prec)
        if recompute_cov:
            cov64 = spd_inverse_ns(prec, iters=60)
        mu_v = ir_solve(prec, qv_nat.xi, cov64, rounds=4).astype(dtype)
        mean, _ = predict_out(kernel, theta, Xu, Xte, mu_v, w_val)
        return mean

    recompute = cov64 is None
    if recompute:
        cov64 = jnp.zeros_like(qv_nat.prec)
    mean = recover_and_predict(qv_nat, cov64, theta, recompute)
    score = float(smse(yte, np.asarray(mean)))
    if verbose:
        print(f"SMSE = {score:.6f}  (reference SGP: 0.083431, VSGP: 0.087478)")
        print(f"train wall: {train_s:.2f}s for {epochs} epochs "
              f"(reference: ~12600 s for 500)")
        print(f"θ (softplus) = {np.asarray(softplus(theta))}")
    return {"smse": score, "seconds": train_s, "first_seconds": first_s,
            "theta": np.asarray(theta), "epochs": epochs}


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    xu = None
    if "--refxu" in sys.argv:
        from gaussianprocessnode_tpu.utils.jld import load_jld

        xu = np.asarray(load_jld("/root/reference/savefiles/Xu_kin40k.jld"))
    run(epochs=int(args[0]) if args else 1000, faithful="--faithful" in sys.argv,
        xu=xu)
