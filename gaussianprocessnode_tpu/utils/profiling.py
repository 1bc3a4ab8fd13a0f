"""Profiling helpers (SURVEY.md §5 tracing slot).

The reference relies on `@time` in notebooks; here: a device-trace context
manager (jax.profiler, viewable in TensorBoard/Perfetto) and a
block-until-ready timer for honest wall-clocks under async dispatch."""

import contextlib
import time

import jax

__all__ = ["device_trace", "timed"]


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace: `with device_trace('/tmp/trace'): run()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", results: dict | None = None):
    """Wall-clock a block, blocking on async results if given a pytree in
    results['block_on']."""
    t0 = time.time()
    out = {}
    try:
        yield out
    finally:
        if "block_on" in out:
            jax.block_until_ready(out["block_on"])
        dt = time.time() - t0
        if results is not None:
            results[label or "elapsed"] = dt
