"""VSGP (ELBO-trained SVGP) baselines — the reference's comparison notebooks
Regression_VSGP.ipynb / Classification_VSGP.ipynb (ApproximateGPs.jl).

Workloads and reference results (BASELINE.md):
- toy 1-D regression, M=20, 5000 AdaMax steps:      SMSE 0.004615
- kin40k, M=512, batch 500, 2200 epochs (~5 h):     SMSE 0.087478
- toy classification (LBFGS in the reference):      34 err / 8.5 %
- banana, M=500, 1000 epochs AdaMax:                121 err / 9.31 %
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

from gaussianprocessnode_tpu.infer.svgp import fit_svgp, init_svgp, svgp_predict
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.utils.datasets import (
    banana,
    kin40k,
    toy_classification_reference,
    toy_sinc_reference,
)
from gaussianprocessnode_tpu.utils.metrics import error_rate, num_error, smse
from gaussianprocessnode_tpu.utils.profiling import block_via_host

KERNEL = Kernel("se", transform="softplus")


def _saved_xu(name):
    """Inducing inputs the reference loads from savefiles (e.g.
    Regression_VSGP.ipynb cell 5 / cell 15: Xu_toyregression / Xu_kin40k).
    The toy files store a Julia StepRangeLen (TwicePrecision ref/step):
    element i (1-based) = (ref.hi+ref.lo) + (i − offset)·(step.hi+step.lo)."""
    import os

    from gaussianprocessnode_tpu.utils.datasets import REFERENCE_ROOT
    from gaussianprocessnode_tpu.utils.jld import load_jld

    raw = load_jld(os.path.join(REFERENCE_ROOT, "savefiles", name))
    if isinstance(raw, dict) and "ref_1" in raw:
        r = raw
        ref = r["ref_1"]["hi_"] + r["ref_1"]["lo_"]
        step = r["step_1"]["hi_"] + r["step_1"]["lo_"]
        i = np.arange(1, int(r["len_"]) + 1)
        xu = ref + (i - int(r["offset_"])) * step
    else:
        xu = np.asarray(raw)
    return jnp.asarray(xu if xu.ndim == 2 else xu[:, None])


def run_toy_regression(epochs: int = 5000, verbose: bool = True):
    """The reference's EXACT config: its saved data draw and inducing
    inputs, FIXED lik_noise = 0.01, jitter 1e-5, 5000 AdaMax(0.002) steps
    (Regression_VSGP.ipynb cells 5-10).

    At this budget the run is NOT ELBO-converged: the SMSE-vs-steps
    trajectory dips to ~0.005 around step 5000 and then rises to the true
    ELBO optimum 0.00883 (verified against the analytic collapsed Titsias
    bound, infer/svgp.collapsed_neg_elbo — parameterization-independent).
    The reference's recorded 0.004615 is the same mid-trajectory dip on its
    optimizer path; this run reproduces the regime (≈0.0054), and any
    longer run converges to the 0.00883 optimum of the reference's own
    model."""
    data = toy_sinc_reference()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    Xu = _saved_xu("Xu_toyregression.jld")
    M = Xu.shape[0]
    params = init_svgp(invsoftplus(jnp.asarray([1.0, 1.0])), M, noise=0.01)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, X[None], y[None], len(y),
                      likelihood="gaussian", epochs=epochs, learning_rate=0.002,
                      learn_noise=False, jitter=1e-5)
    block_via_host(params)
    mean, _ = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test), jitter=1e-5)
    score = float(smse(data.y_test, np.asarray(mean)))
    if verbose:
        print(f"[VSGP toy regression] SMSE = {score:.6f} (ref 0.004615 "
              f"mid-trajectory; true ELBO optimum 0.00883) wall {time.time()-t0:.1f}s")
    return score


def run_toy_classification(epochs: int = 3000, verbose: bool = True):
    # reference draw + saved inducing inputs (Classification_VSGP.ipynb cell 3)
    data = toy_classification_reference()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    Xu = _saved_xu("Xu_toyclassification.jld")
    M = Xu.shape[0]
    params = init_svgp(invsoftplus(jnp.asarray([1.0, 1.0])), M)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, X[None], y[None], len(y),
                      likelihood="bernoulli", epochs=epochs)
    block_via_host(params)
    mean, var = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test))
    probs = jax.scipy.stats.norm.cdf(mean / jnp.sqrt(1.0 + var))
    pred = (np.asarray(probs) >= 0.5).astype(float)
    errs = float(num_error(data.y_test, pred))
    rate = float(error_rate(data.y_test, pred))
    if verbose:
        print(f"[VSGP toy classification] {errs:.0f} err / {rate:.4f} "
              f"(ref 34 / 8.5%) wall {time.time()-t0:.1f}s")
    return errs, rate


def run_kin40k(epochs: int = 2200, m_inducing: int = 512, batch: int = 500,
               verbose: bool = True):
    data = kin40k()
    dtype = jnp.float64
    Xtr = jnp.asarray(data.x_train, dtype)
    ytr = jnp.asarray(data.y_train, dtype)
    # the reference's saved M=512 inducing set + fixed lik_noise = 0.01
    # (Regression_VSGP.ipynb cells 15-19)
    Xu = _saved_xu("Xu_kin40k.jld").astype(dtype)
    m_inducing = Xu.shape[0]
    B = len(ytr) // batch
    Xb = Xtr[: B * batch].reshape(B, batch, -1)
    yb = ytr[: B * batch].reshape(B, batch)
    params = init_svgp(invsoftplus(jnp.ones(9, dtype)), m_inducing, dtype, noise=0.01)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, Xb, yb, len(ytr),
                      likelihood="gaussian", epochs=epochs, learn_noise=False)
    block_via_host(params)
    train_s = time.time() - t0
    mean, _ = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test, dtype))
    score = float(smse(data.y_test, np.asarray(mean)))
    if verbose:
        print(f"[VSGP kin40k] SMSE = {score:.6f} (ref 0.087478) "
              f"wall {train_s:.1f}s for {epochs} epochs (ref ~18000 s for 2200)")
    return score, train_s


def _collapsed_predict_f64_host(theta, Xu, data, noise, jitter):
    """f64 collapsed-optimal predictive mean pinned to the CPU. The
    prediction solve S = Kuu + KuxKuxᵀ/σ² has κ amplified by σ²=0.01, and
    an f32 on-device solve costs ~1.5e-2 of SMSE (measured 0.0973 f32 vs
    0.0827 f64 at the same θ); f64 factorizations on this TPU backend are
    slow-to-unsupported, so the ONE final solve runs the library's
    :func:`~gaussianprocessnode_tpu.infer.svgp.collapsed_predict` on the
    host CPU backend in f64."""
    from gaussianprocessnode_tpu.infer.svgp import collapsed_predict

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pred = collapsed_predict(
            KERNEL,
            jnp.asarray(np.asarray(theta), jnp.float64),
            jnp.asarray(np.asarray(Xu), jnp.float64),
            jnp.asarray(data.x_test, jnp.float64),
            jnp.asarray(data.x_train, jnp.float64),
            jnp.asarray(data.y_train, jnp.float64),
            noise, jitter=jitter,
        )
    return np.asarray(pred)


def run_kin40k_collapsed(steps: int = 400, eval_every: int = 25,
                         learning_rate: float = 0.05, verbose: bool = True):
    """The BASELINE.json north-star run: kin40k VSGP (the reference's saved
    inducing set — Xu_kin40k.jld, M=600; BASELINE.md's "M=512" is a
    transcription error, Regression_VSGP.ipynb cell 15 loads the same
    600-point file — fixed lik_noise 0.01, jitter 1e-5) trained to the
    reference's recorded SMSE 0.087478 on one TPU chip, reporting
    time-to-target.

    TPU-first formulation: instead of the reference's 2200 epochs × 20
    minibatches of uncollapsed ELBO steps (~5 h of Julia), q(u) is profiled
    out analytically (Titsias collapsed bound — the optimum over the SAME
    variational family for each θ) and θ takes full-batch AdaMax steps:
    a handful of f32 MXU GEMMs + one 600-Cholesky per step (~10 ms/step on
    this chip). θ is snapshotted every ``eval_every`` steps (9 floats —
    free); the crossing step is found post-hoc with f64 host predictions,
    so the reported wall-clock is pure training time, like the reference's.
    The uncollapsed minibatch path (:func:`run_kin40k`) remains the
    faithful trajectory-parity baseline.

    Measured (TPU v5e, warm cache): -elbo 30,992 after 400 steps (< the
    reference's 31,482 @ 2200 epochs — the collapsed bound dominates),
    SMSE 0.0827 ≤ target 0.087478 crossed after ~3 s of training.
    """
    from gaussianprocessnode_tpu.infer.svgp import (
        collapsed_opt_init,
        fit_svgp_collapsed_resumable,
    )

    data = kin40k()
    dtype = jnp.float32
    Xtr = jnp.asarray(data.x_train, dtype)
    ytr = jnp.asarray(data.y_train, dtype)
    Xu = _saved_xu("Xu_kin40k.jld").astype(dtype)
    noise, jitter = 0.01, 1e-5
    theta = invsoftplus(jnp.ones(9, dtype))
    opt_state = collapsed_opt_init(theta, learning_rate)
    target = 0.087478

    # warm-up compile outside the timed window (one chunk's executable is
    # reused for every chunk; the persistent cache usually makes this ~1 s)
    th_c, os_c, tr_c = fit_svgp_collapsed_resumable(
        KERNEL, theta, opt_state, Xu, Xtr, ytr, noise,
        steps=eval_every, learning_rate=learning_rate, jitter=jitter)
    block_via_host((th_c, os_c, tr_c))

    snapshots = []
    t0 = time.time()
    done = 0
    while done < steps:
        theta, opt_state, trace = fit_svgp_collapsed_resumable(
            KERNEL, theta, opt_state, Xu, Xtr, ytr, noise,
            steps=eval_every, learning_rate=learning_rate, jitter=jitter)
        # host materialization: the backend's completion signal can fire
        # early on a degraded tunnel; a device→host copy cannot
        _ = float(jnp.asarray(trace).ravel()[-1])
        done += eval_every
        snapshots.append((done, time.time() - t0, np.asarray(theta),
                          float(trace[-1])))
    train_s = time.time() - t0

    crossed = None
    history = []
    for step_n, wall, th, neg_elbo in snapshots:
        pred = _collapsed_predict_f64_host(th, Xu, data, noise, jitter)
        score = float(smse(data.y_test, pred))
        history.append({"step": step_n, "smse": round(score, 6),
                        "neg_elbo": round(neg_elbo, 2),
                        "train_wall_s": round(wall, 2)})
        if verbose:
            print(f"  step {step_n:4d}  -elbo {neg_elbo:12.1f}  "
                  f"SMSE {score:.6f}  train wall {wall:.1f}s", flush=True)
        if crossed is None and score <= target:
            crossed = history[-1]
    if verbose:
        if crossed:
            print(f"[VSGP kin40k collapsed] reference SMSE {target} reached "
                  f"at step {crossed['step']} after "
                  f"{crossed['train_wall_s']}s of training "
                  f"(reference: ~18,000 s; full run {train_s:.1f}s)",
                  flush=True)
        else:
            print(f"[VSGP kin40k collapsed] target {target} NOT reached "
                  f"in {steps} steps ({train_s:.1f}s)", flush=True)
    return {"crossed": crossed, "history": history,
            "final_smse": history[-1]["smse"], "train_wall_s": train_s}


def run_banana(epochs: int = 1000, m_inducing: int = 500, batch: int = 200,
               verbose: bool = True):
    data = banana()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    # the reference's saved M=500 inducing set (Classification_VSGP cell 12)
    Xu = _saved_xu("Xu_banana.jld")
    m_inducing = Xu.shape[0]
    B = len(y) // batch
    Xb = X[: B * batch].reshape(B, batch, -1)
    yb = y[: B * batch].reshape(B, batch)
    params = init_svgp(invsoftplus(jnp.ones(3)), m_inducing)
    t0 = time.time()
    params = fit_svgp(KERNEL, params, Xu, Xb, yb, len(y),
                      likelihood="bernoulli", epochs=epochs)
    block_via_host(params)
    train_s = time.time() - t0
    mean, var = svgp_predict(KERNEL, params, Xu, jnp.asarray(data.x_test))
    probs = jax.scipy.stats.norm.cdf(mean / jnp.sqrt(1.0 + var))
    pred = (np.asarray(probs) >= 0.5).astype(float)
    errs = float(num_error(data.y_test, pred))
    rate = float(error_rate(data.y_test, pred))
    if verbose:
        print(f"[VSGP banana] {errs:.0f} err / {rate:.4f} (ref 121 / 9.31%) "
              f"wall {train_s:.1f}s (ref ~5900 s for 1000)")
    return errs, rate, train_s


def run_fitc_sor_toy(steps: int = 800, verbose: bool = True):
    """The legacy FITC/SoR notebook's toy run on the SAME saved draw + Xu
    (.ipynb_checkpoints/Regression_FITC_SoR-checkpoint.ipynb cells 5-7:
    recorded SMSE — SoR 0.008066, FITC 0.008064)."""
    from gaussianprocessnode_tpu.infer.fitc import (
        fit_sparse_gp, init_sparse_gp, sparse_predict)

    data = toy_sinc_reference()
    X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
    Xu = _saved_xu("Xu_toyregression.jld")
    out = {}
    for method, ref in (("sor", 0.008066), ("fitc", 0.008064)):
        t0 = time.time()
        params, trace = fit_sparse_gp(
            KERNEL, init_sparse_gp(invsoftplus(jnp.asarray([1.0, 1.0]))),
            Xu, X, y, method=method, steps=steps, jitter=1e-8)
        block_via_host(params)
        mean, _ = sparse_predict(KERNEL, params, Xu,
                                 jnp.asarray(data.x_test), X, y,
                                 method=method, jitter=1e-8)
        score = float(smse(data.y_test, np.asarray(mean)))
        out[method] = score
        if verbose:
            print(f"[{method.upper()} toy regression] SMSE = {score:.6f} "
                  f"(ref {ref}) nlml {float(trace[-1]):.2f} "
                  f"wall {time.time()-t0:.1f}s")
    return out


def run_fitc_sor_kin40k(steps: int = 300, verbose: bool = True):
    """The legacy notebook's kin40k run (cells 9-13): SEArd + learned noise
    from the saved Xu_kin40k.jld. Its recorded SoR mll is −2414.13 after a
    100 s LBFGS budget (the in-notebook trace shows −2323.67 converged);
    mll = −nlml here, directly comparable."""
    from gaussianprocessnode_tpu.infer.fitc import (
        fit_sparse_gp, init_sparse_gp, sparse_nlml, sparse_predict)

    data = kin40k()
    dtype = jnp.float64
    X = jnp.asarray(data.x_train, dtype)
    y = jnp.asarray(data.y_train, dtype)
    Xu = _saved_xu("Xu_kin40k.jld").astype(dtype)
    Xt = jnp.asarray(data.x_test, dtype)
    out = {}
    for method in ("sor", "fitc"):
        t0 = time.time()
        params, trace = fit_sparse_gp(
            KERNEL, init_sparse_gp(invsoftplus(jnp.ones(9, dtype))),
            Xu, X, y, method=method, steps=steps, jitter=1e-6)
        block_via_host(params)
        train_s = time.time() - t0
        mean, _ = sparse_predict(KERNEL, params, Xu, Xt, X, y,
                                 method=method, jitter=1e-6)
        score = float(smse(data.y_test, np.asarray(mean)))
        mll = -float(trace[-1])
        out[method] = {"smse": score, "mll": mll, "train_s": train_s}
        if verbose:
            ref = " (ref SoR mll -2414.13 @100s LBFGS, -2323.67 converged)" \
                if method == "sor" else ""
            print(f"[{method.upper()} kin40k] SMSE = {score:.6f} "
                  f"mll {mll:.2f}{ref} wall {train_s:.1f}s")
    return out


if __name__ == "__main__":
    which = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = which or ["toy_regression", "toy_classification"]
    for w in which:
        {"toy_regression": run_toy_regression,
         "toy_classification": run_toy_classification,
         "kin40k": run_kin40k,
         "kin40k_collapsed": run_kin40k_collapsed,
         "fitc_sor_toy": run_fitc_sor_toy,
         "fitc_sor_kin40k": run_fitc_sor_kin40k,
         "banana": run_banana}[w]()
