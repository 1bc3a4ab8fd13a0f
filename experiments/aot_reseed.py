"""Re-seed the committed AOT executable set from a fresh bench run.

VERDICT r4 item 3: the committed `benchmarks/aot_cache/` went stale when r4
edits moved the program keys, silently costing every run 600-1300 s of
compile. This driver makes re-seeding one command:

  python experiments/aot_reseed.py          # on the TPU, exclusive hold

1. moves `.jax_cache` aside (cold start),
2. runs `python bench.py` (compiles + persists every executable the bench
   needs, and prints its JSON line — whose `aot_cache.hit` will be False),
3. replaces `benchmarks/aot_cache/` with the fresh entries (size-capped),
4. re-runs `python bench.py` against a cache seeded ONLY from the new
   artifact dir and asserts `aot_cache.hit` is now true.

Commit the refreshed `benchmarks/aot_cache/` afterwards.
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")
ART = os.path.join(REPO, "benchmarks", "aot_cache")
MAX_BYTES = 120_000_000


def run_bench(tag):
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, cwd=REPO, timeout=5400)
    wall = time.time() - t0
    line = next((ln for ln in p.stdout.strip().splitlines()
                 if ln.startswith("{")), None)
    print(f"[{tag}] bench rc={p.returncode} wall={wall:.1f}s", flush=True)
    if line:
        print(f"[{tag}] {line}", flush=True)
    else:
        print(p.stderr.strip().splitlines()[-5:], flush=True)
    return (json.loads(line) if line else None), p.returncode


def main():
    if os.path.isdir(CACHE):
        stale = CACHE + ".pre_reseed"
        if os.path.isdir(stale):
            shutil.rmtree(stale)
        os.rename(CACHE, stale)
        print(f"moved {CACHE} -> {stale}", flush=True)
    # IMPORTANT: the old artifact dir must not re-seed the cold cache, or
    # the "fresh" run would load stale entries and harvest nothing. Park it.
    art_old = ART + ".old"
    if os.path.isdir(art_old):
        shutil.rmtree(art_old)
    if os.path.isdir(ART):
        os.rename(ART, art_old)

    out1, rc1 = run_bench("cold")
    if rc1 != 0:
        raise SystemExit("cold bench failed; aborting reseed")

    os.makedirs(ART, exist_ok=True)
    total, n = 0, 0
    # SMALLEST-first: the handful of giant (10-70 MB) jit__lambda entries
    # are the bench's roofline/peak probe loops — measurement scaffolding
    # that is cheap to recompile — while the executables that actually
    # gate a fresh clone (jit_fit_kin40k_fast 5.5 MB, recover_and_predict
    # 3.3 MB, the small glue jits) are small. A largest-first fill shipped
    # 115 MB of probes and skipped the training path (first reseed run).
    entries = sorted(os.listdir(CACHE),
                     key=lambda f: os.path.getsize(os.path.join(CACHE, f)))
    for name in entries:
        size = os.path.getsize(os.path.join(CACHE, name))
        if total + size > MAX_BYTES:
            print(f"skip {name} ({size} B): over cap", flush=True)
            continue
        shutil.copyfile(os.path.join(CACHE, name), os.path.join(ART, name))
        total += size
        n += 1
    print(f"harvested {n} entries ({total/1e6:.1f} MB) into {ART}", flush=True)
    if os.path.isdir(art_old):
        shutil.rmtree(art_old)

    # validation: cold cache again, seeded ONLY from the new artifact set
    shutil.rmtree(CACHE)
    out2, rc2 = run_bench("validate")
    hit = bool(out2 and out2.get("aot_cache", {}).get("hit"))
    comp = out2.get("compile_seconds") if out2 else None
    print(f"[validate] aot_cache.hit={hit} compile_seconds={comp}", flush=True)
    if not hit:
        raise SystemExit("validation run still compiled training-path "
                         "entries — reseed did not take")


if __name__ == "__main__":
    main()
