"""Headline benchmark: kin40k sparse-GP training, time-to-SMSE vs reference.

Reference numbers (BASELINE.md):
- SGP node (Julia, CPU): SMSE 0.083431 in ~12,600 s (500 epochs).
- VSGP baseline (ApproximateGPs.jl): SMSE 0.087478 in ~18,000 s.

This bench trains the full kin40k workload (N=10k, M=600, minibatch 500,
w=1e4) on one TPU chip with the epoch-granular fast trainer
(f32 MXU Grams + f64 Newton–Schulz/iterative-refinement solves) and reports
the on-device training wall-clock (cached executable; compile time excluded
and reported separately). ``vs_baseline`` is the speedup over the reference
SGP run at matched epoch count scaling (reference: 25.2 s/epoch).

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
    compile_s = time.time() - first - result["seconds"]

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
        "epochs": EPOCHS,
        "device": _device_name(),
    }
    print(json.dumps(out))


def _device_name():
    import jax

    try:
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.argv.append("--tpu")  # run on the real device, not forced CPU
    main()
