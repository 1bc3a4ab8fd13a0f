"""Clean re-timing of the faithful kin40k trainer from the reference's Xu.

VERDICT r4 item 5: benchmarks/kin40k_refxu_r4.json's 596.3 s is contaminated
(a concurrent probe crashed the shared TPU worker mid-run) and its own
timing_note promises a ``faithful_seconds_clean`` field that was never
recorded. This driver re-runs the SPECTRUM-SCALED (budget-34) faithful f64
schedule from savefiles/Xu_kin40k.jld under an exclusive chip hold, re-checks
trajectory parity against the reference's params_optimal/SMSE goldens
(regression_kin40k.ipynb cells 9-10, 15), and writes
benchmarks/kin40k_refxu_r5.json with BOTH the first (compile-inclusive) and
warm (pure device) wall-clocks.

  python experiments/refxu_record.py --tpu
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

OUT = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                    "benchmarks", "kin40k_refxu_r5.json")  # --budget=N: _budgetN suffix
SAVE = "/root/reference/savefiles"


def main():
    from experiments.kin40k import run
    from gaussianprocessnode_tpu.utils.jld import load_jld

    epochs = 500 if "--tpu" in sys.argv else 3  # CPU = harness smoke only
    budget = next((int(a.split("=", 1)[1]) for a in sys.argv
                   if a.startswith("--budget=")), 34)
    xu = np.asarray(load_jld(_os.path.join(SAVE, "Xu_kin40k.jld")))
    theta_star = np.asarray(load_jld(_os.path.join(SAVE, "params_optimal_kin40k.jld")))
    smse_ref = float(load_jld(_os.path.join(SAVE, "SMSE_kin40k.jld")))

    t0 = time.time()
    res = run(epochs=epochs, faithful=True, xu=xu, verbose=True,
              warm_timing="--tpu" in sys.argv, ns_budget=budget)
    total = time.time() - t0

    artifact = {
        "description": (
            "Round-5 CLEAN faithful re-timing (VERDICT r4 item 5): the "
            "spectrum-scaled (budget-34) faithful f64 per-batch trainer "
            "from the reference's own Xu_kin40k.jld, exclusive chip hold, "
            "no concurrent processes. faithful_seconds_clean is the warm "
            "(cached-executable) wall; first_seconds includes "
            "compile/cache-load. Parity re-checked against "
            "params_optimal_kin40k.jld / SMSE_kin40k.jld "
            "(regression_kin40k.ipynb cells 9-10, 15)."),
        "ns_budget": f"scaled {budget}",
        "epochs": epochs,
        "faithful_seconds_clean": round(res["seconds"], 2),
        "first_seconds": round(res["first_seconds"], 2),
        "total_wall_seconds": round(total, 1),
        "smse": res["smse"],
        "smse_ref": smse_ref,
        "abs_smse_diff": abs(res["smse"] - smse_ref),
        "theta": [float(t) for t in np.asarray(res["theta"])],
        "theta_star_ref": [float(t) for t in theta_star],
        "max_abs_theta_diff": float(
            np.abs(np.asarray(res["theta"]) - theta_star).max()),
        "r3_unscaled60_seconds": 470.0,
        "r4_contaminated_seconds": 596.32,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    out = OUT if "--tpu" in sys.argv else "/tmp/refxu_smoke.json"
    if budget != 34:
        out = out.replace(".json", f"_budget{budget}.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out}: clean={artifact['faithful_seconds_clean']}s "
          f"first={artifact['first_seconds']}s "
          f"maxdθ={artifact['max_abs_theta_diff']:.2e}", flush=True)


if __name__ == "__main__":
    main()
