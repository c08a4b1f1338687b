"""Profiling and tracing hooks.

The reference has no instrumentation beyond tqdm/print (SURVEY.md §5).
Here: lightweight per-phase wall timers with structured reporting, and a
context manager around jax.profiler for device traces viewable in
TensorBoard/XProf.
"""

import contextlib
import json
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating wall-clock phase timers.

    Usage:
        timer = PhaseTimer()
        with timer("training/fci"):
            ...
        timer.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[phase] += dt
            self.counts[phase] += 1

    def report(self, file=None):
        lines = [
            f"{phase:40s} {self.totals[phase]:10.3f} s "
            f"({self.counts[phase]} calls)"
            for phase in sorted(self.totals)
        ]
        out = "\n".join(lines)
        if file:
            print(out, file=file)
        return out

    def as_dict(self):
        return {p: {"seconds": self.totals[p], "calls": self.counts[p]}
                for p in self.totals}

    def dump_json(self, path):
        with open(path, "w") as f:
            json.dump(self.as_dict(), f, indent=2)


@contextlib.contextmanager
def device_trace(logdir):
    """Capture a device trace around a code block:
        with device_trace("/tmp/trace"):
            model.potential_and_forces_batch(batch)
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, reps=3, **kwargs):
    """Time a function with result materialization (block_until_ready can
    be unreliable on experimental backends; fetching forces a sync)."""
    import numpy as np
    import jax

    out = fn(*args, **kwargs)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    return (time.perf_counter() - t0) / reps, out
