"""Phase wall-clock timing (cf. the reference Constants.do_timing dict,
seqm_functions/constants.py:133-140).

JAX semantics make in-graph phase timing meaningless (everything fuses
under jit), so phases are host-level regions bracketed by
``block_until_ready``; for kernel-level breakdowns use
``jax.profiler.trace`` (hook provided).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


class Timing:
    """Accumulates per-phase wall-clock samples.

    >>> t = Timing()
    >>> with t.phase("SCF"):
    ...     out = step(x)          # implicitly synchronized on exit
    >>> t.summary()
    """

    def __init__(self):
        self.phases: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            else:
                # synchronize all devices
                for d in jax.devices():
                    try:
                        d.synchronize_all_activity()
                    except AttributeError:
                        break
            self.phases[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.phases.items():
            out[name] = {"count": len(xs), "total": sum(xs),
                         "mean": sum(xs) / len(xs), "min": min(xs)}
        return out

    def report(self):
        for name, s in self.summary().items():
            print(f"{name:>24}: n={s['count']:4d} total={s['total']:.3f}s "
                  f"mean={s['mean'] * 1e3:.1f}ms min={s['min'] * 1e3:.1f}ms")


@contextlib.contextmanager
def profiler_trace(logdir: str = "/tmp/pyseqm_tpu_trace"):
    """Capture an XLA profiler trace for kernel-level analysis."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
