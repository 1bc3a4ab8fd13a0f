"""GPLVM on the 3PhData oil-flow dataset — the reference's GPLVM.ipynb.

Config (reference cells 4-17): N=200, D_out=12, D_in=2, M=30 inducing from
the PCA projection (seed 86), W = 1e2·I PointMass, srcubature, 6 VMP
iterations per free-energy evaluation, 25 Nelder–Mead iterations over
θ = [σ², ℓ₁, ℓ₂] (softplus), then a final 30-iteration inference for q(x).

Reference outcome: 2-D latents separate the 3 flow regimes (plot);
hyperopt ≈ 15 min Julia. Here we report FE and a 1-NN latent-space
classification accuracy as the quantitative proxy.
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

from gaussianprocessnode_tpu.infer.gplvm import (fit_gplvm_grad,
                                                 gplvm_init_state, gplvm_vmp)
from gaussianprocessnode_tpu.ops.kernels import Kernel, softplus
from gaussianprocessnode_tpu.utils.datasets import oil_flow
from gaussianprocessnode_tpu.utils.optim import nelder_mead


def pca_2d(Y):
    Yc = Y - Y.mean(axis=0)
    _, _, Vt = np.linalg.svd(Yc, full_matrices=False)
    return Yc @ Vt[:2].T


def knn_accuracy(Z, labels, k=1):
    d = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(axis=1)
    return float((labels[nn] == labels).mean())


def run(nm_iters: int = 25, n_iters: int = 6, grad: bool = True,
        grad_epochs: int = 25, verbose: bool = True,
        chunk: int | None = None, checkpoint_path: str | None = None):
    """``grad=True`` (default): gradient hyperopt — a jitted EM alternation
    (warm-started VMP E-step + L-BFGS on the θ-differentiable FE, SURVEY
    §7.1 optimizer row). ``grad=False`` (``--nm``): the reference's
    derivative-free schedule — scipy NelderMead over cold 6-sweep FE
    evaluations (GPLVM.ipynb cells 16-17).

    No ``--f32`` mode here, by MEASUREMENT (round 5): the whitened prior
    makes this family f64-bound — B = Kuu + w·ΣΨ2 has κ ≈ 2e8 even at the
    dtype-scaled jitter, so f32 Ψ-statistics noise (≈1e-3 abs at B's
    ~6.5e3 scale) swamps the small-eigenvalue subspace the Laplace
    in-message needs: latent 1-NN accuracy degrades 0.875 → 0.67-0.77 and
    the FE loses meaning regardless of where precision is pinned
    (naturals-in-f64 and full-f64 Laplace variants were built and
    measured; they ship because they harden the f64 device path, but they
    cannot rescue f32 statistics). The pendulum's --f32 mode
    (experiments/pendulum.py) is where the recipe applies."""
    Y_np, labels = oil_flow()
    Y = jnp.asarray(Y_np)
    mean_X = pca_2d(Y_np)
    Xm = jnp.asarray(mean_X)

    rng = np.random.default_rng(86)
    M = 30
    pos = rng.permutation(len(Y_np))[:M]
    Xu = jnp.asarray(mean_X[pos])

    kernel = Kernel("se", transform="softplus")
    theta0 = jnp.asarray([1.0, 0.6, 0.5])  # reference cell 17 (raw, pre-softplus)

    t0 = time.time()
    device_s = 0.0
    if grad:
        if chunk is None:
            chunk = grad_epochs
        # chunk-granular host checkpoint, exactly as experiments/pendulum.py:
        # long on-device hyperopts stay under the tunnel RPC deadline per
        # execution and a crashed process resumes from the last chunk
        from gaussianprocessnode_tpu.utils.profiling import block_via_host

        # explicit cold-start state: keeps every chunk (including the first)
        # on the SAME jit trace — init_state=None is a separate multi-minute
        # TPU compile for identical math
        theta, state = theta0, gplvm_init_state(kernel, theta0, Xu, Y, Xm)
        fe_all = np.zeros(grad_epochs)
        done = 0
        if checkpoint_path and _os.path.exists(checkpoint_path):
            from gaussianprocessnode_tpu.infer.gplvm import GPLVMState
            from gaussianprocessnode_tpu.utils.checkpoint import load_pytree

            N, D = Y.shape
            Din, Mi = Xm.shape[1], Xu.shape[0]
            like_state = GPLVMState(
                Xm, jnp.zeros((N, Din, Din), Y.dtype),
                # q(v) naturals are ALWAYS f64 (infer/gplvm.gplvm_init_state)
                jnp.zeros(Mi * D, jnp.float64),
                jnp.zeros((Mi * D, Mi * D), jnp.float64),
            )
            ck = load_pytree(checkpoint_path, {
                "theta": theta0, "state": like_state,
                "done": np.zeros((), np.int64), "fe": fe_all,
                "device_seconds": np.zeros(()),
            })
            theta, state = ck["theta"], ck["state"]
            done = int(ck["done"])
            fe_all = np.asarray(ck["fe"]).copy()
            device_s = float(ck["device_seconds"])
            if verbose and done:
                print(f"[resume] {done}/{grad_epochs} epochs", flush=True)
        while done < grad_epochs:
            n = min(chunk, grad_epochs - done)
            tc = time.time()
            theta, state, fe_c = fit_gplvm_grad(
                kernel, theta, Xu, Y, Xm, epochs=n, n_iters=n_iters,
                init_state=state,
            )
            block_via_host(fe_c)
            device_s += time.time() - tc
            fe_all[done:done + n] = np.asarray(fe_c)
            done += n
            if checkpoint_path:
                from gaussianprocessnode_tpu.utils.checkpoint import save_pytree

                save_pytree(checkpoint_path, {
                    "theta": theta, "state": state,
                    "done": np.asarray(done, np.int64), "fe": fe_all,
                    "device_seconds": np.asarray(device_s),
                })
        history = [float(f) for f in fe_all]
        fe_val = history[-1]
    else:
        def fe_obj(theta):
            _, fe = gplvm_vmp(kernel, theta, Xu, Y, Xm, n_iters=n_iters)
            return fe

        theta, fe_val, history = nelder_mead(fe_obj, theta0, maxiter=nm_iters)
    hyperopt_s = time.time() - t0

    # final 30-iteration inference for q(x) (GPLVM.ipynb cell 22). When the
    # run is chunk-granular (device mode), split it into 5 warm-started
    # 6-sweep blocks — chained scans are identical to one 30-sweep scan, and
    # a single ~30-sweep dispatch is exactly the >300 s-class execution that
    # crashed the TPU worker in the chunk=5 hyperopt attempts
    # (benchmarks/gplvm_tpu_r4.json; same mitigation as the pendulum
    # record's chunked smoothing, DEVIATIONS #28)
    t_fi = time.time()
    if chunk is not None and chunk < 30:
        from gaussianprocessnode_tpu.utils.profiling import block_via_host

        state, fe = gplvm_init_state(kernel, theta, Xu, Y, Xm), None
        for _ in range(5):
            state, fe = gplvm_vmp(kernel, theta, Xu, Y, Xm, n_iters=6,
                                  init_state=state)
            block_via_host(fe)
    else:
        state, fe = gplvm_vmp(kernel, theta, Xu, Y, Xm, n_iters=30)
    final_infer_s = time.time() - t_fi
    Z = np.asarray(state.x_means)
    acc = knn_accuracy(Z, labels)
    acc_pca = knn_accuracy(mean_X, labels)
    if verbose:
        which = "gradient (EM, L-BFGS M-step)" if grad else "NelderMead"
        print(f"final FE = {float(fe):.3f} ({which} best {fe_val:.3f}, "
              f"{len(history)} evals/epochs)")
        print(f"latent 1-NN accuracy = {acc:.4f} (PCA init baseline: {acc_pca:.4f})")
        print(f"hyperopt wall: {hyperopt_s:.1f}s (reference: ~900 s)")
        print(f"optimal θ (softplus) = {np.asarray(softplus(jnp.asarray(theta)))} "
              f"(reference: [1.4136, 0.7675, 1.0215])")
    return {"fe": float(fe), "fe_hyperopt": fe_val, "knn_acc": acc,
            "knn_acc_pca": acc_pca, "theta": np.asarray(theta),
            "seconds": hyperopt_s, "device_hyperopt_seconds": device_s,
            "final_infer_seconds": final_infer_s,
            "fe_trace": history, "latents": Z, "labels": labels}


if __name__ == "__main__":
    # the positional count drives whichever optimizer is active: gradient
    # epochs by default, NelderMead iterations under --nm
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    grad = "--nm" not in sys.argv
    n = int(args[0]) if args else None
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--ckpt="):
            kw["checkpoint_path"] = a.split("=", 1)[1]
        elif a.startswith("--chunk="):
            kw["chunk"] = int(a.split("=", 1)[1])
    if grad:
        res = run(grad_epochs=n if n is not None else 25, grad=True, **kw)
    else:
        res = run(nm_iters=n if n is not None else 25, grad=False, **kw)
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            # machine-readable record for experiments/tpu_record.py
            import json as _json

            payload = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                       for k, v in res.items() if k not in ("latents", "labels")}
            payload["backend"] = jax.default_backend()
            payload["device"] = str(jax.devices()[0])
            with open(a.split("=", 1)[1], "w") as f:
                _json.dump(payload, f, indent=1)
