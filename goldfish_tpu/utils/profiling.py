"""Tracing / profiling subsystem.

The reference's instrumentation is two `perf_counter` prints around
`run_driver` (SURVEY.md section 5). Here: named stage timers with
device synchronization, per-stage statistics, and optional JAX device
profiler traces (TensorBoard format) around any stage.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["Profiler", "profiler", "force_readback"]


def force_readback(tree):
    """Synchronize by READING BACK one scalar from every array leaf.

    `jax.block_until_ready` does NOT actually block on the axon TPU
    backend (CLAUDE.md) — an actual host transfer is the only reliable
    fence there, and it is what stops a stage timer honestly."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = jax.numpy.asarray(leaf).ravel()
        if arr.size:
            total += float(arr[0])
    return total


class Profiler:
    def __init__(self, trace_dir: str | None = None):
        self.records = defaultdict(list)
        self.trace_dir = trace_dir
        self.enabled = True

    @contextlib.contextmanager
    def stage(self, name: str, sync=None, trace: bool = False):
        """Time a stage; `sync` is an optional array/pytree to
        block_until_ready before stopping the clock (without it you time
        dispatch, not execution)."""
        if not self.enabled:
            yield
            return
        ctx = (jax.profiler.trace(self.trace_dir)
               if trace and self.trace_dir else contextlib.nullcontext())
        t0 = time.perf_counter()
        with ctx:
            box = [None]
            yield box
            if box[0] is not None:
                force_readback(box[0])
            elif sync is not None:
                force_readback(sync)
        self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> str:
        lines = [f"{'stage':30s} {'calls':>6s} {'total s':>10s} "
                 f"{'mean ms':>10s} {'last ms':>10s}"]
        for name, ts in sorted(self.records.items()):
            tot = sum(ts)
            lines.append(f"{name:30s} {len(ts):6d} {tot:10.3f} "
                         f"{1e3 * tot / len(ts):10.2f} {1e3 * ts[-1]:10.2f}")
        return "\n".join(lines)

    def reset(self):
        self.records.clear()


profiler = Profiler()
