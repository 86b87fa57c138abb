"""Tracing and profiling helpers (the aux observability subsystem).

The reference's only tracing is a wall-time benchmark helper (SURVEY.md §5);
the TPU rebuild adds jax.profiler integration so hot paths can be inspected
in Perfetto/TensorBoard, plus annotated trace regions.
"""
from __future__ import annotations

import contextlib
import time
import types

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pycamset_trace", create_perfetto_link=False):
    """Capture a jax profiler trace of the enclosed block.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in profiler timelines)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock timer that blocks on device results; keeps a history."""

    def __init__(self):
        self.history: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def time(self, name: str):
        """Time a block; assign the device output to ``box.result`` inside
        the block so the timer can synchronise on it:

            with timer.time("solve") as box:
                box.result = solve(...)
        """
        box = types.SimpleNamespace(result=None)
        t0 = time.perf_counter()
        yield box
        if box.result is not None:
            jax.block_until_ready(box.result)
        self.history.append((name, time.perf_counter() - t0))

    def timed(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.history.append((name, time.perf_counter() - t0))
        return out

    def report(self) -> str:
        lines = [f"{name}: {dt * 1000:.2f} ms" for name, dt in self.history]
        return "\n".join(lines)
