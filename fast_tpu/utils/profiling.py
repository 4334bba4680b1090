"""Profiling and tracing utilities.

The reference's only observability was a tqdm progress bar
(``fast/fast.py:130``) and a wall-clock script (``test/benchmark.py``).
Here every engine stage records wall time into ``sim.timings``, and
:func:`trace` exposes the JAX profiler (xplane traces viewable in
TensorBoard / Perfetto) around any region.
"""

import contextlib
import time

import jax


class StageTimer:
    """Accumulates named wall-clock stage timings."""

    def __init__(self):
        self.timings = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.perf_counter() - t0)

    def __repr__(self):
        lines = [f"  {k}: {v * 1e3:.1f} ms" for k, v in self.timings.items()]
        return "StageTimer(\n" + "\n".join(lines) + "\n)"


@contextlib.contextmanager
def trace(logdir):
    """JAX profiler trace context (xplane; open in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named region visible in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
