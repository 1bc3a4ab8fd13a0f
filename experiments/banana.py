"""Banana 2-D binary classification — classification_banana.ipynb.

Config (reference cells 3-10): 4000 train / 1300 test, M=500 random
inducing, minibatch 200 (20 batches), ARD-SE kernel (3 θ params, softplus),
probit likelihood, q(w) Gamma carried across batches, 500 epochs of
[1 VMP sweep + AdaMax on pseudo-targets].

Reference results: 125 errors / 9.615%; 2965.76 s Julia wall (BASELINE.md).
This framework on one TPU chip: default epoch-granular fast path
(fit_banana_fast: one grand f64 stats refresh per epoch, 20 f32 θ-steps on
frozen stats) — **124 errors / 9.54 % in 10.1 s warm** (295× the
reference; ``--warm`` re-times against the cached executables — the first
pass pays compile/cache-load, the source of earlier 30–41 s reports;
benchmarks/banana_warm_r3.json); ``--faithful`` runs the per-batch
schedule (~269 s, same error count).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat CLI invocations skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.dists import GammaShapeRate, MvGaussianNat, gamma_mean
from gaussianprocessnode_tpu.infer.batch_vmp import predict_probit
from gaussianprocessnode_tpu.infer.minibatch import (
    fit_banana,
    fit_banana_fast,
    init_banana_state,
)
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus, softplus
from gaussianprocessnode_tpu.utils.datasets import banana
from gaussianprocessnode_tpu.utils.driver import chunked_run
from gaussianprocessnode_tpu.utils.metrics import error_rate, num_error


def run(epochs: int = 500, m_inducing: int = 500, batch_size: int = 200,
        seed: int = 1, fast: bool | None = None, verbose: bool = True,
        xu=None, warm_timing: bool = False):
    """``xu``: optional explicit inducing inputs (M, 2) — pass the
    reference's saved draw (savefiles/Xu_banana.jld, the Xu behind its
    golden posterior qv_banana.jld) for trajectory-level parity runs."""
    data = banana()
    dtype = jnp.float64 if "--f64" in sys.argv else jnp.float32
    Xtr = jnp.asarray(data.x_train, dtype)
    ytr = jnp.asarray(data.y_train, dtype)
    Xte = jnp.asarray(data.x_test, dtype)
    yte = data.y_test

    n_train = Xtr.shape[0]
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

    kernel = Kernel("se", transform="softplus")
    theta0 = invsoftplus(jnp.ones((3,), dtype))
    prior_v = MvGaussianNat(jnp.zeros(M, dtype), jnp.eye(M, dtype=dtype) / 50.0)
    prior_w = GammaShapeRate(jnp.asarray(1e-2, dtype), jnp.asarray(1e-2, dtype))

    # chunked + retried: single on-device executions beyond ~1-2 minutes hit
    # the device-tunnel RPC deadline, and the link occasionally faults
    # transiently; carry state is host-side so chunks are re-runnable
    if fast is None:
        fast = "--faithful" not in sys.argv
    chunk = 100

    trainer = fit_banana_fast if fast else fit_banana

    def train():
        # concrete initial carry → every chunk (incl. the first) shares ONE
        # compiled executable (no separate resume_state=None signature).
        # The fast trainer is the epoch-granular statistics refresh
        # (VERDICT item 8): one grand f64 NS per epoch, 20 f32 θ-steps on
        # frozen stats — same fixed point as the per-batch schedule.
        state = (init_banana_state(kernel, theta0, Xu, prior_v, prior_w)
                 if fast else None)
        theta, qv_nat, qw, _ = chunked_run(
            lambda e, st: trainer(kernel, theta0, Xu, Xb, yb, prior_v,
                                  prior_w, e, resume_state=st),
            epochs, chunk, state,
        )
        return theta, qv_nat, qw

    t0 = time.time()
    theta, qv_nat, qw = train()
    train_s = time.time() - t0
    first_s = train_s
    if warm_timing or "--warm" in sys.argv:
        # re-run against the cached executables: pure device time. The
        # first pass pays compile/cache-load (the historically reported
        # 30-41 s); the warm trainer itself runs ~20 ms/epoch on one chip
        # (measured ablation: f64 NS refresh ≈ 11 ms, θ-steps ≈ 7 ms).
        t0 = time.time()
        theta, qv_nat, qw = train()
        train_s = time.time() - t0

    from gaussianprocessnode_tpu.ops.linalg import ir_solve, spd_inverse_ns, sym

    # posterior recovery + prediction as ONE jitted program (eager, the ~300
    # small ops each pay the device-tunnel dispatch latency)
    @jax.jit
    def recover_and_predict(qv_nat, qw, theta):
        prec = sym(qv_nat.prec)
        cov = spd_inverse_ns(prec, iters=60)
        mu_v = ir_solve(prec, qv_nat.xi, cov, rounds=4).astype(dtype)
        return predict_probit(kernel, theta, Xu, Xte, mu_v, gamma_mean(qw))

    probs = recover_and_predict(qv_nat, qw, theta)
    pred = (np.asarray(probs) >= 0.5).astype(float)
    errs = float(num_error(yte, pred))
    rate = float(error_rate(yte, pred))
    if verbose:
        print(f"errors = {errs:.0f} / rate = {rate:.4f}  (reference: 125 / 9.615%)")
        print(f"train wall: {train_s:.2f}s for {epochs} epochs (reference: 2965.76 s)")
        print(f"θ (softplus) = {np.asarray(softplus(theta))}  w̄ = {float(gamma_mean(qw)):.4f}")
    return {"errors": errs, "error_rate": rate, "seconds": train_s,
            "first_seconds": first_s, "theta": np.asarray(theta)}


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    xu = None
    if "--refxu" in sys.argv:
        from gaussianprocessnode_tpu.utils.jld import load_jld

        xu = np.asarray(load_jld("/root/reference/savefiles/Xu_banana.jld"))
    res = run(epochs=int(args[0]) if args else 500, xu=xu,
              warm_timing="--warm" in sys.argv)
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            # machine-readable record for the bench harness (bench.py banana)
            import json as _json

            payload = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                       for k, v in res.items()}
            payload["backend"] = jax.default_backend()
            payload["device"] = str(jax.devices()[0])
            with open(a.split("=", 1)[1], "w") as f:
                _json.dump(payload, f, indent=1)
