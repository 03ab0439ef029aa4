"""Tracing / profiling subsystem.

TPU-native replacement for the reference's YAKL timer machinery
(``yakl::timer_start/stop`` around main, the simulation loop, MPI exchanges
and output, enabled by -DYAKL_PROFILE -- SURVEY.md section 5;
e.g. experiments/community_benchmark/driver.cpp:66,82,
dynamics_euler_stratified_wenofv.h:634,677,2022):

  * ``timer(name)`` -- accumulating wall-clock section timers with a global
    registry and a report, like the YAKL timer report at finalize.  Timing a
    jitted region forces a device sync on exit (value fetch: on the axon TPU
    platform block_until_ready returns early).
  * ``annotate(name)`` -- names a region in the XLA/Xprof trace
    (jax.profiler.TraceAnnotation), the analog of YAKL's named
    parallel_for labels.
  * ``trace(logdir)`` -- captures a full profiler trace viewable in
    XProf/TensorBoard, the deep-dive the reference lacks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["timer", "timer_report", "reset_timers", "annotate", "trace",
           "sync"]

_REGISTRY: dict[str, list] = {}  # name -> [total_seconds, calls]


def sync(x=None) -> None:
    """Force completion of all pending device work reachable from ``x``
    (or a trivial probe).  Value fetch, not block_until_ready: the axon TPU
    platform returns from block_until_ready before execution finishes."""
    if x is None:
        jax.numpy.zeros(()).item()
    else:
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "dtype")]
        if leaves:
            jax.numpy.max(jax.numpy.ravel(leaves[-1])[-1:]).item()


@contextlib.contextmanager
def timer(name: str, sync_result=None) -> Iterator[None]:
    """Accumulating section timer (yakl::timer_start/stop analog).

    Pass the computation's output pytree as ``sync_result`` (or rely on the
    default probe) so asynchronous dispatch doesn't fake the timing.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sync(sync_result)
        entry = _REGISTRY.setdefault(name, [0.0, 0])
        entry[0] += time.perf_counter() - t0
        entry[1] += 1


def timer_report() -> str:
    """The YAKL-finalize-style timer table."""
    lines = [f"{'timer':<32s} {'total_s':>10s} {'calls':>8s} {'per_call':>10s}"]
    for name, (total, calls) in sorted(_REGISTRY.items()):
        lines.append(f"{name:<32s} {total:10.4f} {calls:8d} "
                     f"{total / max(calls, 1):10.6f}")
    return "\n".join(lines)


def reset_timers() -> None:
    _REGISTRY.clear()


def annotate(name: str):
    """Name a region in the device trace (Xprof), like YAKL kernel labels."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture an XProf/TensorBoard trace of everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
