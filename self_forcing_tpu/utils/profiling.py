"""Profiling / tracing (reference CUDA-event phase timers,
pipeline/causal_inference.py:98-110,237-271; demo.py per-block logs).

TPU equivalents: wall-clock phase timers around block_until_ready (used by
the pipelines' profile=True flag) and a jax.profiler trace context for
deep dives (the role nsys would play)."""
from __future__ import annotations

import contextlib
import time

import jax


class PhaseTimer:
    """Accumulates named phase durations; prints the reference's breakdown
    format."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self.block_times: list[float] = []

    @contextlib.contextmanager
    def phase(self, name: str, *sync_targets):
        """``with timer.phase('decode') as ph: out = f(); ph.sync(out)`` —
        arrays produced INSIDE the body must be registered via ph.sync()
        (entry-time sync_targets can only reference pre-existing arrays;
        JAX dispatch is async, so without a sync the phase measures
        dispatch, not device time)."""
        class _Phase:
            def __init__(self):
                self.targets = list(sync_targets)

            def sync(self, *arrays):
                self.targets.extend(arrays)

        ph = _Phase()
        t0 = time.perf_counter()
        yield ph
        for t in ph.targets:
            jax.block_until_ready(t)
        self.phases[name] = self.phases.get(name, 0.0) + (
            time.perf_counter() - t0)

    def add_block_time(self, seconds: float):
        self.block_times.append(seconds)

    def report(self) -> str:
        lines = ["Profiling results:"]
        for name, sec in self.phases.items():
            lines.append(f"  - {name}: {sec * 1e3:.2f} ms")
        if self.block_times:
            for i, b in enumerate(self.block_times):
                lines.append(f"  - Block {i} generation: {b * 1e3:.2f} ms")
            avg = sum(self.block_times) / len(self.block_times)
            lines.append(f"  - Average block time: {avg * 1e3:.2f} ms")
        total = sum(self.phases.values())
        lines.append(f"  - Total time: {total * 1e3:.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
