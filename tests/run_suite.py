"""Per-module process-isolated suite runner — THE canonical green gate
(VERDICT r3 item 10; promoted from "iteration helper" in r5, VERDICT r4
weak #8: same tests, ~5 min warm vs ~22 min for the single-process run).

The plain single-process suite (`python -m pytest tests/ -x -q`) remains
for single-module debugging, but it must keep the compilation cache OFF
(DEVIATIONS #25: with hundreds of executables accumulated in one process,
XLA segfaults — on the cache (de)serialization paths first, and even with
the cache off late in the run before `jax.clear_caches()` was added), so
every run recompiles everything: ~22 minutes on this 1-CPU host.

This runner restores iteration speed the way the deviation analysis
prescribes: each test MODULE runs in its OWN process (no accumulated
compilation state), which makes the persistent cache safe to enable
(GPN_TEST_CACHE=1 → tests/conftest.py points it at .jax_cache_tests). The
first run still pays the compiles; after that the suite is mostly cache
reads.

  python tests/run_suite.py            # all modules, summary + exit code
  python tests/run_suite.py core e2e   # substring-filtered module subset
  python tests/run_suite.py --no-cache # isolation without the cache

Module-level failures, segfaults (negative return codes) and timeouts are
reported per module; exit status is non-zero if any module fails.
"""

import glob
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# Modules whose executables must not go through the persistent cache even
# under process isolation (empty unless a cache-path segfault is observed
# in isolation too; DEVIATIONS #25 only established the single-process
# accumulated-state crash).
NO_CACHE_MODULES: set[str] = set()

PER_MODULE_TIMEOUT = 1200


def main(argv):
    filters = [a for a in argv if not a.startswith("--")]
    use_cache = "--no-cache" not in argv
    modules = sorted(glob.glob(os.path.join(HERE, "test_*.py")))
    if filters:
        modules = [m for m in modules
                   if any(f in os.path.basename(m) for f in filters)]
    if not modules:
        print("no test modules matched", file=sys.stderr)
        return 2

    failures = []
    t_start = time.time()
    for mod in modules:
        name = os.path.basename(mod)
        env = dict(os.environ)
        if use_cache and name[:-3] not in NO_CACHE_MODULES:
            env["GPN_TEST_CACHE"] = "1"
        else:
            env.pop("GPN_TEST_CACHE", None)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-m", "pytest", mod, "-q", "--no-header"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=PER_MODULE_TIMEOUT,
            )
            rc = p.returncode
            tail = (p.stdout.strip().splitlines() or [""])[-1]
            if rc < 0:  # killed by a signal (e.g. segfault) — show stderr
                tail = (p.stderr.strip().splitlines() or ["?"])[-1]
        except subprocess.TimeoutExpired:
            rc, tail = None, f"timeout {PER_MODULE_TIMEOUT}s"
        dt = time.time() - t0
        status = "ok" if rc == 0 else f"FAIL rc={rc}"
        print(f"{name:32s} {status:12s} {dt:6.1f}s  {tail}", flush=True)
        if rc != 0:
            failures.append((name, rc, tail))

    total = time.time() - t_start
    print(f"\n{len(modules) - len(failures)}/{len(modules)} modules green "
          f"in {total:.0f}s" + ("" if use_cache else " (cache off)"))
    if failures:
        print("failed:", ", ".join(n for n, _, _ in failures))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
