"""Headline benchmark: kin40k sparse-GP training, time-to-SMSE vs reference.

Reference numbers (BASELINE.md):
- SGP node (Julia, CPU): SMSE 0.083431 in ~12,600 s (500 epochs).
- VSGP baseline (ApproximateGPs.jl): SMSE 0.087478 in ~18,000 s.

This bench trains the full kin40k workload (N=10k, M=600, minibatch 500,
w=1e4) on one TPU chip with the epoch-granular fast trainer
(f32 MXU Grams — through the Pallas SE kernel — + one f64 Newton–Schulz/
iterative-refinement statistics refresh per epoch) and reports the
on-device training wall-clock (cached executable; compile time excluded
and reported separately — a persistent compilation cache in
/root/repo/.jax_cache makes it ~seconds after the first-ever run).
``vs_baseline`` is the speedup over the reference SGP run at matched epoch
count scaling (reference: 25.2 s/epoch). Round-2 record: 25.7 s / 500
epochs at SMSE 0.0799 (reference: 12,600 s, SMSE 0.0834) = 489×.
Also emits an on-device Pallas-vs-XLA Gram check (f32-exactness + timing).

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}
"""

import json
import sys
import time

EPOCHS = 500
REF_SECONDS_PER_EPOCH = 12600.0 / 500.0  # Julia reference wall-clock rate
REF_SMSE_SGP = 0.083431
REF_SMSE_VSGP = 0.087478


def main():
    t_setup = time.time()
    from experiments.kin40k import run

    first = time.time()
    result = run(epochs=EPOCHS, warm_timing=True, verbose=False)
    if result["seconds"] < 1.0:
        # timing anomaly: 500 epochs cannot complete in under a second —
        # on a degraded tunnel the backend has been seen satisfying blocks
        # early, leaking the device time into the prediction stage.
        # Re-measure once with a fresh run.
        result = run(epochs=EPOCHS, warm_timing=True, verbose=False)
    # compile/trace/cache-load cost = first run minus the warm re-run (both
    # execute the identical 500 epochs; the persistent compilation cache in
    # experiments.kin40k makes this ~seconds after the first-ever bench)
    compile_s = result["first_seconds"] - result["seconds"]
    setup_s = time.time() - first - result["first_seconds"] - result["seconds"]

    speedup = REF_SECONDS_PER_EPOCH * EPOCHS / result["seconds"]
    out = {
        "metric": "kin40k_train_wallclock_500epochs",
        "value": round(result["seconds"], 3),
        "unit": "s",
        "vs_baseline": round(speedup, 1),
        "smse": round(result["smse"], 6),
        "ref_smse_sgp": REF_SMSE_SGP,
        "ref_smse_vsgp": REF_SMSE_VSGP,
        "smse_vs_vsgp_baseline": round(result["smse"] / REF_SMSE_VSGP, 4),
        "compile_seconds": round(compile_s, 1),
        "setup_seconds": round(setup_s, 1),  # data load + posterior recovery + SMSE eval
        "epochs": EPOCHS,
        "device": _device_name(),
    }
    out.update(_pallas_check())
    print(json.dumps(out))


def _pallas_check(n_timing: int = 30):
    """On-device Pallas-vs-XLA Gram check at the headline shape (600×10000
    ARD-8): f32-exactness (max |diff|, expected ≤ ~3e-6 = f32 round-off of
    the tile-reduction order) and per-call timings. Runs on whatever backend
    bench runs on — on TPU this exercises the real Mosaic kernel."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianprocessnode_tpu.ops.kernels import se_gram
    from gaussianprocessnode_tpu.ops.pallas_gram import se_gram_pallas

    rng = np.random.default_rng(0)
    with jax.enable_x64(False):
        Z = jnp.asarray(rng.standard_normal((600, 8)), jnp.float32)
        X = jnp.asarray(rng.standard_normal((10000, 8)), jnp.float32)
        ls = jnp.asarray(np.abs(rng.standard_normal(8)) + 0.5, jnp.float32)
        var = jnp.asarray(1.3, jnp.float32)
        on_tpu = jax.default_backend() == "tpu"
        pal = jax.jit(lambda: se_gram_pallas(Z, X, var, ls)) if on_tpu else None
        xla = jax.jit(lambda: se_gram(Z, X, var, ls))
        k_ref = xla()
        jax.block_until_ready(k_ref)
        if not on_tpu:
            return {"pallas_checked": False}
        k_pal = pal()
        jax.block_until_ready(k_pal)
        diff = float(jnp.max(jnp.abs(k_pal - k_ref)))

        def clock(fn):
            fn()
            jax.block_until_ready(fn())
            t0 = time.time()
            for _ in range(n_timing):
                out = fn()
            jax.block_until_ready(out)
            return (time.time() - t0) / n_timing * 1000.0

        return {
            "pallas_checked": True,
            "pallas_max_abs_diff": diff,
            "pallas_gram_ms": round(clock(pal), 3),
            "xla_gram_ms": round(clock(xla), 3),
        }


def _device_name():
    import jax

    try:
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.argv.append("--tpu")  # run on the real device, not forced CPU
    main()
