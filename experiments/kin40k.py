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
- default fast path (4 stats refreshes/epoch, identical fixed point):
  SMSE 0.08158 @ 500 epochs in ~70 s — beats the reference's accuracy at
  175× its wall-clock.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.infer.batch_vmp import predict_out
from gaussianprocessnode_tpu.infer.minibatch import fit_kin40k, fit_kin40k_fast
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus, softplus
from gaussianprocessnode_tpu.ops.linalg import ir_solve, spd_inverse_ns, sym
from gaussianprocessnode_tpu.utils.datasets import kin40k
from gaussianprocessnode_tpu.utils.metrics import smse


def run(epochs: int = 1000, m_inducing: int = 600, batch_size: int = 500,
        n_train: int = 10_000, dtype=None, seed: int = 1, faithful: bool = False,
        learning_rate: float = 0.001, stats_refreshes: int = 4,
        warm_timing: bool = False, verbose: bool = True):
    data = kin40k()
    if dtype is None:
        dtype = jnp.float64 if (faithful or "--f64" in sys.argv) else jnp.float32
    Xtr = jnp.asarray(data.x_train[:n_train], dtype)
    ytr = jnp.asarray(data.y_train[:n_train], dtype)
    Xte = jnp.asarray(data.x_test, dtype)
    yte = data.y_test

    rng = np.random.default_rng(seed)
    pos = rng.permutation(n_train)[:m_inducing]
    Xu = jnp.asarray(data.x_train[pos], dtype)
    M = m_inducing

    B = n_train // batch_size
    Xb = Xtr[: B * batch_size].reshape(B, batch_size, -1)
    yb = ytr[: B * batch_size].reshape(B, batch_size)

    kernel = Kernel("se", transform="softplus")
    theta0 = invsoftplus(jnp.ones((1 + Xtr.shape[1],), dtype))
    prior_v = MvGaussianNat(jnp.zeros(M, dtype), jnp.eye(M, dtype=dtype) / 50.0)
    w_val = 1e4

    def _chunked(step_fn, chunk):
        # chunked + retried: long single executions hit the tunnel RPC
        # deadline, and the device link occasionally faults transiently;
        # the carry state lives host-side so a chunk can simply be re-run
        state = None
        done = 0
        out = None
        while done < epochs:
            e = min(chunk, epochs - done)
            for attempt in range(3):
                try:
                    out = step_fn(e, state)
                    jax.block_until_ready(out[0])
                    break
                except Exception:
                    if attempt == 2:
                        raise
                    time.sleep(5)
            state = out[-1]
            done += e
        return out

    def train():
        if faithful:
            theta, qv_nat, state = _chunked(
                lambda e, st: fit_kin40k(
                    kernel, theta0, Xu, Xb, yb, prior_v, w_val, e,
                    learning_rate=learning_rate, resume_state=st,
                ),
                50,
            )
            cov64 = None
        else:
            theta, qv_nat, cov64, state = _chunked(
                lambda e, st: fit_kin40k_fast(
                    kernel, theta0, Xu, Xtr, ytr, Xb, yb, prior_v, w_val, e,
                    learning_rate=learning_rate, stats_refreshes=stats_refreshes,
                    resume_state=st,
                ),
                100,
            )
        jax.block_until_ready(theta)
        return theta, qv_nat, cov64

    t0 = time.time()
    theta, qv_nat, cov64 = train()
    train_s = time.time() - t0
    if warm_timing:  # re-run against the cached executable: pure device time
        t0 = time.time()
        theta, qv_nat, cov64 = train()
        train_s = time.time() - t0

    prec = sym(qv_nat.prec)
    if cov64 is None:
        cov64 = spd_inverse_ns(prec, iters=60)
    mu_v = ir_solve(prec, qv_nat.xi, cov64, rounds=4).astype(dtype)
    mean, _ = predict_out(kernel, theta, Xu, Xte, mu_v, w_val)
    score = float(smse(yte, np.asarray(mean)))
    if verbose:
        print(f"SMSE = {score:.6f}  (reference SGP: 0.083431, VSGP: 0.087478)")
        print(f"train wall: {train_s:.2f}s for {epochs} epochs "
              f"(reference: ~12600 s for 500)")
        print(f"θ (softplus) = {np.asarray(softplus(theta))}")
    return {"smse": score, "seconds": train_s, "theta": np.asarray(theta),
            "epochs": epochs}


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run(epochs=int(args[0]) if args else 1000, faithful="--faithful" in sys.argv)
